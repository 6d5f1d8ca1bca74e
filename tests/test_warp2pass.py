"""Two-pass scanline warp vs the direct gather warp (oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.v2.augment import (
    affine_homography,
    bilinear_sample,
    homography_grid,
    perspective_homography,
)
from imagegenerator_tpu.v2.warp2pass import warp_homography_2pass


def _smooth_image(key, h, w):
    """Low-frequency image: interpolation-scheme differences stay tiny."""
    small = jax.random.uniform(key, (h // 8, w // 8, 3))
    return jax.image.resize(small, (h, w, 3), method="cubic")


def _direct(img, M):
    H, W, _ = img.shape
    return bilinear_sample(img, homography_grid(H, W, M))


def test_identity_exact():
    img = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    out = warp_homography_2pass(img, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-2)


def test_translation_matches_direct():
    H = W = 64
    img = _smooth_image(jax.random.key(1), H, W)
    M = jnp.eye(3).at[0, 2].set(3.7).at[1, 2].set(-2.2)
    got = warp_homography_2pass(img[None], M[None])[0]
    want = _direct(img, M)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


@pytest.mark.parametrize("angle", [10.0, -25.0])
def test_rotation_close_to_direct(angle):
    H = W = 64
    img = _smooth_image(jax.random.key(2), H, W)
    M = affine_homography(H, W, jnp.asarray(angle), jnp.zeros(2))
    got = np.asarray(warp_homography_2pass(img[None], M[None])[0])
    want = np.asarray(_direct(img, M))
    # interior only: border-clamp fill differs at the warped-in edges
    m = 8
    np.testing.assert_allclose(
        got[m:-m, m:-m], want[m:-m, m:-m], atol=5e-2
    )


def test_perspective_close_to_direct():
    H = W = 64
    img = _smooth_image(jax.random.key(3), H, W)
    corners = jnp.array(
        [[2.0, 3.0], [1.0, W - 4.0], [H - 3.0, W - 2.0], [H - 2.0, 1.5]]
    )
    M = perspective_homography(H, W, corners)
    got = np.asarray(warp_homography_2pass(img[None], M[None])[0])
    want = np.asarray(_direct(img, M))
    m = 8
    np.testing.assert_allclose(got[m:-m, m:-m], want[m:-m, m:-m], atol=5e-2)


def test_backward_is_finite_and_nonzero():
    img = _smooth_image(jax.random.key(4), 32, 32)[None]
    M = affine_homography(32, 32, jnp.asarray(15.0), jnp.array([1.0, -2.0]))[None]

    g = jax.grad(lambda im: jnp.sum(warp_homography_2pass(im, M) ** 2))(img)
    arr = np.asarray(g)
    assert np.isfinite(arr).all() and np.abs(arr).sum() > 0


def test_rectangular_upscale_matches_direct():
    """out_shape != input shape: one warp expresses crop+rescale+rotate
    (the composed-cutout path). Oracle: direct bilinear sampling on the
    composed map's output-resolution grid."""
    Hi = Wi = 32
    Ho = Wo = 56
    img = _smooth_image(jax.random.key(5), Hi, Wi)
    # inverse map: out(56) -> rotate a bit -> scale into the 32px source
    s = Hi / float(Ho)
    scale = jnp.diag(jnp.array([s, s, 1.0]))
    th = jnp.deg2rad(8.0)
    c, si = jnp.cos(th), jnp.sin(th)
    cy = cx = (Ho - 1) / 2.0
    rot = jnp.array(
        [
            [c, -si, cy - c * cy + si * cx],
            [si, c, cx - si * cy - c * cx],
            [0.0, 0.0, 1.0],
        ]
    )
    M = scale @ rot
    got = warp_homography_2pass(img[None], M[None], out_shape=(Ho, Wo))[0]
    assert got.shape == (Ho, Wo, 3)
    grid = homography_grid(Ho, Wo, M)
    want = bilinear_sample(img, grid)
    # two-pass vs one-pass interpolation differ at sub-pixel scale under
    # rotation (module docstring); 3e-2 bounds the border-tap noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_crop_matrix_matches_scale_and_translate():
    """The composed-cutout crop matrix (cutouts.py M_crop) must carry the
    (s-1)/2 pixel-center term so the fast path samples the same window
    as the slow path's scale_and_translate (ADVICE.md round-2: round 2
    omitted it, shifting crops by up to half a source pixel). Oracle:
    scale_and_translate with a triangle kernel, which IS bilinear for
    magnification."""
    H = W = 16
    out = 24
    size, oy, ox = 10.0, 2.5, 3.25  # interior window: edge clamp can't differ
    img = _smooth_image(jax.random.key(7), H, W)[None]
    s = size / out
    M = jnp.array(
        [
            [s, 0.0, oy + (s - 1.0) / 2.0],
            [0.0, s, ox + (s - 1.0) / 2.0],
            [0.0, 0.0, 1.0],
        ]
    )
    got = warp_homography_2pass(img, M[None], out_shape=(out, out))[0]
    scale = jnp.full((2,), out / size)
    translation = -jnp.array([oy, ox]) * (out / size)
    want = jax.image.scale_and_translate(
        img, (1, out, out, 3), (1, 2), scale, translation, method="linear"
    )[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_rectangular_pure_scale_exact_rows():
    """Axis-aligned scale+translate agrees with direct bilinear exactly
    (per-pass linear interp composes exactly for separable maps)."""
    Hi = Wi = 16
    Ho = Wo = 24
    img = jax.random.uniform(jax.random.key(6), (Hi, Wi, 3))
    s = Hi / float(Ho)
    M = jnp.diag(jnp.array([s, s, 1.0])).at[0, 2].set(1.3).at[1, 2].set(0.4)
    got = warp_homography_2pass(img[None], M[None], out_shape=(Ho, Wo))[0]
    want = bilinear_sample(img, homography_grid(Ho, Wo, M))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)


def test_resize_axis_aligned_matches_homography_warp():
    """The shared-weight axis-aligned resize (the split cutout path's
    second stage) is numerically identical to the dense homography warp
    on the same axis-aligned map — the weights are the same tents, only
    their storage shape differs ((N, O, K) shared vs per-scanline)."""
    from imagegenerator_tpu.v2.warp2pass import resize_axis_aligned

    N, H, W = 3, 12, 12
    out = 20
    img = jax.random.uniform(jax.random.key(9), (N, H, W, 3))
    s = jnp.array([H / out, H / out * 1.1, H / out * 0.9])
    half = (s - 1.0) / 2.0
    t_y = half + jnp.array([0.0, 0.7, -0.3])
    t_x = half + jnp.array([0.2, 0.0, 0.5])
    zeros, ones = jnp.zeros_like(s), jnp.ones_like(s)
    M = jnp.stack(
        [
            jnp.stack([s, zeros, t_y], -1),
            jnp.stack([zeros, s, t_x], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    want = warp_homography_2pass(img, M, out_shape=(out, out))
    got = resize_axis_aligned(
        img, jnp.stack([s, s], -1), jnp.stack([t_y, t_x], -1), (out, out)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_cutout_split_path_exact_when_augs_are_integer_maps():
    """Split vs composed cutout warps agree EXACTLY when the aug
    homography is an integer map (identity / pure flip): the conjugated
    aug warp's tent weights are one-hot, so the extra lerp stage is a
    pass-through. (Non-integer affine/perspective augs differ by
    interpolation-chain tolerance by design — the split trades one
    composed lerp for aug-lerp + resize-lerp, like the reference's own
    multi-stage chain.)"""
    import imagegenerator_tpu.v2.augment as aug
    from imagegenerator_tpu.v2.cutouts import MakeCutouts

    key = jax.random.key(3)
    img = jax.random.uniform(jax.random.key(1), (2, 12, 12, 3))

    # force integer-map augs: no affine/perspective, flips always fire
    orig = aug.random_geometry

    def flip_only(k, n, H, W, **kw):
        kw.update(p_affine=0.0, p_persp=0.0, p_flip=1.0)
        return orig(k, n, H, W, **kw)

    aug.random_geometry = flip_only
    try:
        import imagegenerator_tpu.v2.cutouts as cutmod

        cutmod.random_geometry = flip_only
        a = MakeCutouts(cut_size=20, cutn=4, augment=True, noise_fac=0.0,
                        warp_split=True)(key, img)
        b = MakeCutouts(cut_size=20, cutn=4, augment=True, noise_fac=0.0,
                        warp_split=False)(key, img)
    finally:
        aug.random_geometry = orig
        cutmod.random_geometry = orig
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


class TestBandedPath:
    """Block-banded windowed contraction (IMAGEGEN_WARP_BANDED=1,
    VERDICT.md round-4 next #3): same tent weights as the dense path,
    gathered (scanline, block) source windows instead of the full
    (O, K) grid — must agree with the dense path on the whole v2 aug
    geometry distribution."""

    def _banded(self, monkeypatch, bo=None, wb=None):
        monkeypatch.setenv("IMAGEGEN_WARP_BANDED", "1")
        if bo is not None:
            monkeypatch.setenv("IMAGEGEN_WARP_BAND_BO", str(bo))
        if wb is not None:
            monkeypatch.setenv("IMAGEGEN_WARP_BAND_WB", str(wb))

    def test_matches_dense_on_aug_distribution(self, monkeypatch):
        from imagegenerator_tpu.v2.augment import random_geometry

        img = jax.random.uniform(jax.random.key(5), (6, 32, 32, 3))
        # always-fire affine+perspective: the hardest (steepest) maps
        Ms = random_geometry(
            jax.random.key(6), 6, 32, 32, p_affine=1.0, p_persp=1.0
        )
        dense = warp_homography_2pass(img, Ms)
        self._banded(monkeypatch)
        banded = warp_homography_2pass(img, Ms)
        # tolerance: identical tent weights, but the windowed einsum
        # reassociates the bf16 contraction (bf16 eps ~4e-3 at these
        # magnitudes), and blocks crossing a Mobius pole (steep
        # perspective rows) clamp to the window edge — measured 0.08%
        # of elements off by <4e-3 at p_affine=p_persp=1
        np.testing.assert_allclose(
            np.asarray(banded), np.asarray(dense), atol=5e-3
        )
        assert float(np.abs(np.asarray(banded) - np.asarray(dense)).mean()) < 1e-4

    def test_matches_dense_rectangular_and_nondivisible(self, monkeypatch):
        """Rectangular out_shape whose dims do NOT divide the block size
        (exercises the block padding) on a rotation+translation map."""
        from imagegenerator_tpu.v2.augment import affine_homography

        img = jax.random.uniform(jax.random.key(7), (2, 40, 28, 3))
        M = affine_homography(40, 28, jnp.asarray(17.0), jnp.array([2.0, -1.5]))
        Ms = jnp.broadcast_to(M, (2, 3, 3))
        dense = warp_homography_2pass(img, Ms, out_shape=(27, 23))
        self._banded(monkeypatch, bo=16, wb=32)
        banded = warp_homography_2pass(img, Ms, out_shape=(27, 23))
        np.testing.assert_allclose(
            np.asarray(banded), np.asarray(dense), atol=5e-3
        )
        assert float(np.abs(np.asarray(banded) - np.asarray(dense)).mean()) < 1e-4

    def test_identity_exact(self, monkeypatch):
        img = jax.random.uniform(jax.random.key(8), (2, 32, 32, 3))
        self._banded(monkeypatch)
        out = warp_homography_2pass(
            img, jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img), atol=1e-2
        )

    def test_gradients_match_dense(self, monkeypatch):
        from imagegenerator_tpu.v2.augment import random_geometry

        img = jax.random.uniform(jax.random.key(9), (2, 24, 24, 3))
        Ms = random_geometry(
            jax.random.key(10), 2, 24, 24, p_affine=1.0, p_persp=1.0
        )

        def loss(x):
            return jnp.sum(warp_homography_2pass(x, Ms) ** 2)

        g_dense = jax.grad(loss)(img)
        self._banded(monkeypatch)
        g_banded = jax.grad(loss)(img)
        # grads route through the transposed windowed einsum + a coarse
        # windowed scatter-add; differences are bf16 cotangent rounding
        # (measured max ~8e-3 = bf16 eps at grad magnitude ~2)
        np.testing.assert_allclose(
            np.asarray(g_banded), np.asarray(g_dense), atol=2e-2
        )
        assert float(np.abs(np.asarray(g_banded) - np.asarray(g_dense)).mean()) < 1e-3

    def test_width_capped_at_source_size(self, monkeypatch):
        """width > K degrades to a full-width window (still correct)."""
        img = jax.random.uniform(jax.random.key(11), (1, 16, 16, 3))
        Ms = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        dense = warp_homography_2pass(img, Ms)
        self._banded(monkeypatch, bo=8, wb=64)
        banded = warp_homography_2pass(img, Ms)
        np.testing.assert_allclose(
            np.asarray(banded), np.asarray(dense), atol=1e-6
        )
