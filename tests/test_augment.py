"""Augmentation color math vs colorsys oracle + pipeline properties."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np

from imagegenerator_tpu.v2.augment import (
    color_jitter,
    hsv_to_rgb,
    random_augment,
    rgb_to_hsv,
    sharpness,
)


def test_hsv_roundtrip_matches_colorsys():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    for i in range(len(rgb)):
        want = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(hsv[i], want, atol=1e-5)
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_color_jitter_identity():
    img = jax.random.uniform(jax.random.key(0), (8, 8, 3))
    out = color_jitter(img, jnp.asarray(0.0), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_sharpness_identity_at_factor_one():
    img = jax.random.uniform(jax.random.key(1), (8, 8, 3))
    out = sharpness(img, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_random_augment_shape_determinism_grads():
    batch = jax.random.uniform(jax.random.key(2), (4, 16, 16, 3))
    out1 = jax.jit(random_augment)(jax.random.key(3), batch)
    out2 = jax.jit(random_augment)(jax.random.key(3), batch)
    assert out1.shape == batch.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    g = jax.grad(lambda b: jnp.sum(random_augment(jax.random.key(3), b) ** 2))(batch)
    arr = np.asarray(g)
    assert np.isfinite(arr).all() and np.abs(arr).sum() > 0
