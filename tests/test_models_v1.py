"""Shape/dtype + determinism tests for the v1 StackGAN model zoo."""

import jax
import jax.numpy as jnp
import numpy as np

from imagegenerator_tpu.models import (
    ConditioningAugmentation,
    StageIDiscriminator,
    StageIGenerator,
    StageIIDiscriminator,
    StageIIGenerator,
    TextEmbeddingLSTM,
)

B = 4


def test_conditioning_augmentation_shapes():
    m = ConditioningAugmentation(h_dim=256, c_dim=128)
    tem = jnp.ones((B, 512))
    variables = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, tem)
    c_hat, mu, sigma = m.apply(variables, tem, rngs={"noise": jax.random.key(2)})
    assert c_hat.shape == (B, 128) and mu.shape == (B, 128) and sigma.shape == (B, 128)

    # determinism: same noise key -> identical sample
    c2, *_ = m.apply(variables, tem, rngs={"noise": jax.random.key(2)})
    np.testing.assert_array_equal(np.asarray(c_hat), np.asarray(c2))


def test_stage1_generator_shape():
    g = StageIGenerator(c_dim=128, z_dim=100)
    x = jnp.ones((B, 228))
    variables = g.init(jax.random.key(0), x, train=False)
    out, mutated = g.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (B, 64, 64, 3)
    assert "batch_stats" in mutated
    assert np.asarray(out).min() >= -1.0 and np.asarray(out).max() <= 1.0


def test_stage1_discriminator_shape():
    d = StageIDiscriminator(tem_size=512, nd=128)
    img = jnp.ones((B, 64, 64, 3))
    tem = jnp.ones((B, 512))
    variables = d.init(jax.random.key(0), img, tem, train=False)
    score, _ = d.apply(variables, img, tem, train=True, mutable=["batch_stats"])
    assert score.shape == (B, 1)


def test_stage2_generator_shape():
    g = StageIIGenerator()
    img64 = jnp.ones((B, 64, 64, 3))
    c_hat = jnp.ones((B, 128))
    variables = g.init(jax.random.key(0), img64, c_hat, train=False)
    out, _ = g.apply(variables, img64, c_hat, train=True, mutable=["batch_stats"])
    assert out.shape == (B, 256, 256, 3)


def test_stage2_discriminator_shape():
    d = StageIIDiscriminator(tem_size=512, nd=128)
    img = jnp.ones((B, 256, 256, 3))
    tem = jnp.ones((B, 512))
    variables = d.init(jax.random.key(0), img, tem, train=False)
    score, _ = d.apply(variables, img, tem, train=True, mutable=["batch_stats"])
    assert score.shape == (B, 1)


def test_text_lstm_shape():
    m = TextEmbeddingLSTM(vocab_size=100, embed_size=16, hidden_size=8, tem_size=32)
    tokens = jnp.ones((B, 12), dtype=jnp.int32)
    variables = m.init(jax.random.key(0), tokens)
    out = m.apply(variables, tokens)
    assert out.shape == (B, 32)

    # frozen embedding: gradient w.r.t. embedding table must be zero
    def loss(params):
        return jnp.sum(m.apply({"params": params}, tokens) ** 2)

    g = jax.grad(loss)(variables["params"])
    emb_grads = g["Embed_0"]["embedding"]
    np.testing.assert_allclose(np.asarray(emb_grads), 0.0)
