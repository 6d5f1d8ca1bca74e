"""Pallas banded scanline-lerp kernel vs the dense tent-matmul oracle.

The kernel (ops/pallas/scanline_lerp.py) must reproduce the dense
two-pass warp (v2/warp2pass.py einsum path) in both values and
gradients — it is the same math with the zero weights skipped. Tests run
the kernel in interpret mode on the CPU backend (IMAGEGEN_WARP_KERNEL=1
forces the kernel path; the real-TPU compile is exercised by bench/CLI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.ops.pallas.scanline_lerp import scanline_lerp
from imagegenerator_tpu.v2.augment import affine_homography
from imagegenerator_tpu.v2.warp2pass import warp_homography_2pass


def _dense_lerp_oracle(src, coords):
    """(S, C, K), (S, O) -> (S, C, O) via the explicit tent matrix
    (warp2pass._line_weights semantics, f32)."""
    S, C, K = src.shape
    s = np.clip(np.asarray(coords, np.float64), 0.0, K - 1.0)
    k = np.arange(K)
    w = np.maximum(0.0, 1.0 - np.abs(s[..., None] - k))  # (S, O, K)
    return np.einsum("sok,sck->sco", w, np.asarray(src, np.float64)).astype(
        np.float32
    )


def _monotone_coords(key, S, O, K, decreasing=False):
    steps = jax.random.uniform(key, (S, O), minval=0.35, maxval=0.9)
    coords = jnp.cumsum(steps, axis=1) - 2.0  # start below 0: border clamp
    if decreasing:
        coords = coords[:, ::-1]
    return coords


@pytest.mark.parametrize("decreasing", [False, True])
def test_kernel_forward_matches_dense(decreasing):
    S, C, K, O = 6, 3, 32, 48
    src = jax.random.uniform(jax.random.key(0), (S, C, K))
    coords = _monotone_coords(jax.random.key(1), S, O, K, decreasing)
    out = scanline_lerp(src, coords, interpret=True)
    want = _dense_lerp_oracle(src, coords)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_kernel_backward_is_exact_transpose():
    """d_src from the custom VJP must match jax.grad through the dense
    oracle formulation (same tent weights, transposed; the VJP casts
    weights to bf16 like the dense production path — bf16 tolerance)."""
    S, C, K, O = 4, 3, 24, 40
    src = jax.random.uniform(jax.random.key(2), (S, C, K))
    coords = _monotone_coords(jax.random.key(3), S, O, K)
    cot = jax.random.normal(jax.random.key(4), (S, C, O))

    def kernel_loss(x):
        return jnp.sum(scanline_lerp(x, coords, interpret=True) * cot)

    got = jax.grad(kernel_loss)(src)

    def dense_loss(x):
        s = jnp.clip(coords, 0.0, K - 1.0)
        k = jnp.arange(K, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(s[..., None] - k))
        return jnp.sum(jnp.einsum("sok,sck->sco", w, x) * cot)

    want = jax.grad(dense_loss)(src)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def _smooth(key, n, h, w):
    small = jax.random.uniform(key, (n, h // 4, w // 4, 3))
    return jax.image.resize(small, (n, h, w, 3), method="cubic")


def test_warp_kernel_path_matches_dense_path(monkeypatch):
    """The full two-pass warp through the kernel (crop + affine composed,
    rectangular out) agrees with the dense einsum path — values and
    input gradients."""
    H = W = 16
    Ho = Wo = 24
    imgs = _smooth(jax.random.key(5), 2, H, W)
    s = H / float(Ho)
    crop = jnp.array(
        [[s, 0.0, 1.0 + (s - 1) / 2], [0.0, s, 0.5 + (s - 1) / 2], [0.0, 0.0, 1.0]]
    )
    rot = affine_homography(Ho, Wo, jnp.asarray(12.0), jnp.array([0.6, -0.9]))
    M = jnp.broadcast_to(crop @ rot, (2, 3, 3))

    def run(path_flag):
        monkeypatch.setenv("IMAGEGEN_WARP_KERNEL", path_flag)
        out = warp_homography_2pass(imgs, M, out_shape=(Ho, Wo))
        g = jax.grad(
            lambda im: jnp.sum(warp_homography_2pass(im, M, out_shape=(Ho, Wo)) ** 2)
        )(imgs)
        return np.asarray(out), np.asarray(g)

    out_k, g_k = run("1")
    out_d, g_d = run("0")
    # dense path uses bf16 weights/pixels; kernel is f32 — bf16 tolerance
    np.testing.assert_allclose(out_k, out_d, atol=2e-2)
    np.testing.assert_allclose(g_k, g_d, rtol=2e-2, atol=4e-2)


def test_warp_kernel_border_clamp_gradients(monkeypatch):
    """Aggressive translation clamps MANY outputs to the source border —
    more than the backward band's taps. Those contributions are exact
    (masked full reductions onto pixels 0/K-1), so gradients must still
    match the dense path (the first TPU run caught this: ~0.87 relative
    error at borders before the reduction fix)."""
    H = W = 16
    Ho = Wo = 32
    imgs = _smooth(jax.random.key(8), 2, H, W)
    s = H / float(Ho)
    # shift half the crop window off the image: big clamp regions
    M = jnp.array(
        [[s, 0.0, -6.0], [0.0, s, 9.5], [0.0, 0.0, 1.0]]
    )
    rot = affine_homography(Ho, Wo, jnp.asarray(-20.0), jnp.zeros(2))
    Ms = jnp.stack([M, M @ rot])

    def grad_of(path_flag):
        monkeypatch.setenv("IMAGEGEN_WARP_KERNEL", path_flag)
        return np.asarray(
            jax.grad(
                lambda im: jnp.sum(
                    warp_homography_2pass(im, Ms, out_shape=(Ho, Wo)) ** 2
                )
            )(imgs)
        )

    g_k = grad_of("1")
    g_d = grad_of("0")
    np.testing.assert_allclose(g_k, g_d, rtol=2e-2, atol=4e-2)


def test_warp_kernel_perspective_and_identity(monkeypatch):
    """Identity map is exact; a perspective map stays within tolerance of
    the dense path (Mobius inverse centers the backward band)."""
    from imagegenerator_tpu.v2.augment import perspective_homography

    monkeypatch.setenv("IMAGEGEN_WARP_KERNEL", "1")
    imgs = _smooth(jax.random.key(6), 1, 20, 20)
    eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    out = warp_homography_2pass(imgs, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)

    H = W = 20
    corners = jnp.array(
        [[1.0, 1.5], [0.5, W - 2.0], [H - 1.5, W - 1.0], [H - 1.0, 0.5]]
    )
    M = perspective_homography(H, W, corners)[None]
    out_k = np.asarray(warp_homography_2pass(imgs, M))
    monkeypatch.setenv("IMAGEGEN_WARP_KERNEL", "0")
    out_d = np.asarray(warp_homography_2pass(imgs, M))
    np.testing.assert_allclose(out_k, out_d, atol=2e-2)
