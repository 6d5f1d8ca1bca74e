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


def test_perspective_homography_closed_form_matches_solve():
    """The Heckbert closed form replaced an 8x8 linalg.solve (serial LU
    on TPU); pin the parity against the solve it replaced."""
    import jax.numpy as jnp
    import numpy as np

    from imagegenerator_tpu.v2.augment import perspective_homography

    def solve_version(H, W, src_corners):
        dst = jnp.array(
            [[0.0, 0.0], [0.0, W - 1.0], [H - 1.0, W - 1.0], [H - 1.0, 0.0]]
        )
        rows, rhs = [], []
        for i in range(4):
            dy, dx = dst[i, 0], dst[i, 1]
            sy, sx = src_corners[i, 0], src_corners[i, 1]
            zero = 0.0 * dy
            rows.append(jnp.stack(
                [dy, dx, 1.0 + zero, zero, zero, zero, -sy * dy, -sy * dx]))
            rhs.append(sy)
            rows.append(jnp.stack(
                [zero, zero, zero, dy, dx, 1.0 + zero, -sx * dy, -sx * dx]))
            rhs.append(sx)
        h = jnp.linalg.solve(jnp.stack(rows), jnp.stack(rhs))
        return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)

    rng = np.random.default_rng(3)
    H = W = 96
    for _ in range(8):
        base = np.array(
            [[0, 0], [0, W - 1], [H - 1, W - 1], [H - 1, 0]], np.float64
        )
        jit = rng.uniform(-0.2, 0.2, (4, 2)) * np.array([H / 2, W / 2])
        corners = jnp.asarray(base + jit, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(perspective_homography(H, W, corners)),
            np.asarray(solve_version(H, W, corners)),
            atol=5e-6,
        )
    eye = perspective_homography(
        H, W,
        jnp.asarray([[0, 0], [0, W - 1], [H - 1, W - 1], [H - 1, 0]],
                    jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(eye), np.eye(3), atol=1e-6)
