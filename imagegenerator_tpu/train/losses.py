"""WGAN-GP and conditioning-KL losses.

Reference semantics (``/root/reference/stage_1_train_fn.py:134-159``,
``utils.py:8-26``):

* critic loss   = mean(concat(mismatched, fake)) - mean(real) + 10 * GP
* generator loss = -mean(critic(fake, tem)) + KL-term
* GP: uniform-eps interpolation between real and fake, gradient of the
  critic score w.r.t. the interpolated images, mean((||g||_2 - 1)^2).

KL sign: the reference *adds* ``sum(1 + log s^2 - mu^2 - s^2)`` to the
generator loss — that quantity is −2·KL(N(mu, s) ‖ N(0, I)), i.e. the sign
is inverted vs. StackGAN's +KL regularizer (SURVEY.md §2 "reference bugs").
``kl_mode='correct'`` (default) adds the proper +2·KL penalty;
``kl_mode='faithful'`` reproduces the reference's inverted sign.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wgan_critic_loss(real_scores: jax.Array, negative_scores: jax.Array) -> jax.Array:
    return jnp.mean(negative_scores) - jnp.mean(real_scores)


def wgan_generator_loss(fake_scores: jax.Array) -> jax.Array:
    return -jnp.mean(fake_scores)


def kl_term(mu: jax.Array, sigma: jax.Array, mode: str = "correct") -> jax.Array:
    """The conditioning-augmentation Gaussian regularizer.

    ``s = sum(1 + log(sigma^2) - mu^2 - sigma^2)`` equals ``-2 * KL``.
    """
    s = jnp.sum(1.0 + jnp.log(jnp.square(sigma)) - jnp.square(mu) - jnp.square(sigma))
    if mode == "faithful":
        return s  # reference adds -2*KL (inverted sign)
    if mode == "correct":
        return -s  # +2*KL penalty
    raise ValueError(f"unknown kl_mode: {mode}")


def gradient_penalty(critic_score_fn, real: jax.Array, fake: jax.Array, key) -> jax.Array:
    """WGAN-GP on NHWC images.

    ``critic_score_fn(images) -> (B,) or (B,1) scores`` must close over the
    critic params / text embedding. Differentiating the result w.r.t. the
    critic params yields the second-order term, exactly like torch's
    ``create_graph=True`` double-backward (reference utils.py:15-22).
    """
    b = real.shape[0]
    eps = jax.random.uniform(key, (b, 1, 1, 1), dtype=real.dtype)
    interp = real * eps + fake * (1.0 - eps)

    def score_sum(images):
        return jnp.sum(critic_score_fn(images))

    grads = jax.grad(score_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def gradient_penalty_aux(critic_fn, real: jax.Array, fake: jax.Array, key):
    """Like ``gradient_penalty`` but ``critic_fn(images) -> (scores,
    aux)``; returns (gp, aux). The aux (e.g. the BatchNorm stats update
    from the interpolated-batch forward, which torch's train-mode GP
    forward performs — utils.py:14) comes from the SAME forward that the
    input-gradient is taken through, so no extra critic pass is needed.
    """
    b = real.shape[0]
    eps = jax.random.uniform(key, (b, 1, 1, 1), dtype=real.dtype)
    interp = real * eps + fake * (1.0 - eps)

    def score_sum(images):
        scores, aux = critic_fn(images)
        return jnp.sum(scores), aux

    grads, aux = jax.grad(score_sum, has_aux=True)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0)), aux
