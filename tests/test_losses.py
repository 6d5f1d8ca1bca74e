"""Loss-function unit tests with analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.train import losses


def test_wgan_losses():
    real = jnp.array([1.0, 3.0])
    neg = jnp.array([0.5, 1.5, 2.0, 4.0])
    assert float(losses.wgan_critic_loss(real, neg)) == pytest.approx(2.0 - 2.0)
    assert float(losses.wgan_generator_loss(neg)) == pytest.approx(-2.0)


def test_kl_term_modes():
    mu = jnp.array([[0.5, -0.5]])
    sigma = jnp.array([[1.0, 2.0]])
    s = float(
        jnp.sum(1 + jnp.log(sigma**2) - mu**2 - sigma**2)
    )
    assert float(losses.kl_term(mu, sigma, "faithful")) == pytest.approx(s, rel=1e-6)
    assert float(losses.kl_term(mu, sigma, "correct")) == pytest.approx(-s, rel=1e-6)
    # standard normal: KL = 0 in both modes
    z = losses.kl_term(jnp.zeros((3, 4)), jnp.ones((3, 4)), "correct")
    assert float(z) == pytest.approx(0.0, abs=1e-6)
    with pytest.raises(ValueError):
        losses.kl_term(mu, sigma, "bogus")


def test_gradient_penalty_linear_critic():
    """For critic(x) = sum(w * x), d(score)/dx = w everywhere, so
    gp = (||w||_2 - 1)^2 exactly, independent of real/fake/eps."""
    w = jax.random.normal(jax.random.key(0), (8, 8, 3))

    def critic(images):
        return jnp.sum(images * w, axis=(1, 2, 3))

    real = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    fake = jax.random.normal(jax.random.key(2), (4, 8, 8, 3))
    gp = losses.gradient_penalty(critic, real, fake, jax.random.key(3))
    want = (float(jnp.linalg.norm(w.ravel())) - 1.0) ** 2
    assert float(gp) == pytest.approx(want, rel=1e-5)


def test_gradient_penalty_aux_matches_plain():
    w = jax.random.normal(jax.random.key(0), (4, 4, 3))

    def critic(images):
        return jnp.sum(images * w, axis=(1, 2, 3))

    def critic_aux(images):
        return critic(images), {"stats": jnp.sum(images)}

    real = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    fake = jax.random.normal(jax.random.key(2), (2, 4, 4, 3))
    gp_plain = losses.gradient_penalty(critic, real, fake, jax.random.key(3))
    gp_aux, aux = losses.gradient_penalty_aux(critic_aux, real, fake, jax.random.key(3))
    assert float(gp_plain) == pytest.approx(float(gp_aux), rel=1e-6)
    assert np.isfinite(float(aux["stats"]))


def test_gradient_penalty_second_order_differentiable():
    """d(gp)/d(w) must exist and be finite (the double-backward the
    reference relies on via create_graph=True)."""

    def gp_of_w(w):
        def critic(images):
            return jnp.sum(images * w, axis=(1, 2, 3))

        real = jnp.ones((2, 4, 4, 3))
        fake = -jnp.ones((2, 4, 4, 3))
        return losses.gradient_penalty(critic, real, fake, jax.random.key(0))

    g = jax.grad(gp_of_w)(jnp.full((4, 4, 3), 0.3))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
