"""JAX image augmentations — the kornia pipeline of the reference's
cutout sampler (``/root/reference/v2_implementation/vision_utils.py:
99-106``), vectorized over the cutout batch:

  RandomHorizontalFlip(p=.5) -> ColorJitter(hue=.01, saturation=.01,
  p=.7) -> RandomSharpness(.3, p=.4) -> RandomAffine(30deg, translate
  .1, p=.8, border padding) -> RandomPerspective(.2, p=.4)

All transforms are per-sample randomized (one PRNG key in), applied as
batched tensor ops: geometric warps build per-sample inverse coordinate
grids and bilinear-sample with border clamping — no data-dependent
shapes, fully jit/vmap-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- sampling
def bilinear_sample(img, coords):
    """img: (H, W, C); coords: (H_out, W_out, 2) as (y, x) source coords.
    Border-clamped bilinear sampling.

    TPU note: the four taps are fetched with ONE flattened row-gather
    (``jnp.take`` over (H*W, C)) instead of 2-D fancy indexing — XLA
    lowers axis-0 takes far better than general multi-offset gathers.
    """
    H, W, C = img.shape
    y = jnp.clip(coords[..., 0], 0.0, H - 1.0)
    x = jnp.clip(coords[..., 1], 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]

    flat = img.reshape(H * W, C)
    out_shape = y0.shape
    idx = jnp.stack(
        [y0 * W + x0, y0 * W + x1, y1 * W + x0, y1 * W + x1], axis=0
    ).reshape(-1)
    taps = jnp.take(flat, idx, axis=0).reshape(4, *out_shape, C)
    p00, p01, p10, p11 = taps[0], taps[1], taps[2], taps[3]
    return (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )


def _identity_grid(H, W):
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    return jnp.stack(jnp.meshgrid(yy, xx, indexing="ij"), axis=-1)  # (H,W,2)


# ---------------------------------------------------------------- color
def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-8), 0.0)
    deltac_safe = jnp.where(deltac > 0, deltac, 1.0)
    rc = (maxc - r) / deltac_safe
    gc = (maxc - g) / deltac_safe
    bc = (maxc - b) / deltac_safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    # Branchless formulation: r,g,b = v - v*s*clip(min(k, 4-k), 0, 1)
    # with k = (n + 6h) mod 6 for n = 5, 3, 1. Pure VPU elementwise ops —
    # jnp.choose would lower to a gather whose backward is a TPU scatter
    # (measured 10x slower through the jitter path).
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]

    def channel(n):
        k = jnp.mod(n + h * 6.0, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def color_jitter(img, hue_shift, sat_factor):
    """img in [0,1]; hue_shift in turns; multiplicative saturation."""
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + hue_shift) % 1.0
    s = jnp.clip(hsv[..., 1] * sat_factor, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, hsv[..., 2]], axis=-1))


def sharpness(img, factor):
    """torchvision-style: blend the image with a fixed 3x3 smoothing of
    its interior. factor 1 = identity, >1 = sharper."""
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    H, W, C = img.shape
    x = img.transpose(2, 0, 1)[:, None]  # (C,1,H,W)
    blurred = jax.lax.conv_general_dilated(
        x, kernel[None, None], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0].transpose(1, 2, 0)
    # interior-only blend (torchvision keeps the 1px border unchanged)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    interior = ((yy > 0) & (yy < H - 1) & (xx > 0) & (xx < W - 1))[..., None]
    blended = img + (factor - 1.0) * (img - blurred)
    return jnp.where(interior, jnp.clip(blended, 0.0, 1.0), img)


# ------------------------------------------------------------ geometric
def affine_homography(H, W, angle_deg, translate, scale=1.0):
    """Inverse-map homography (3x3 in (y, x, 1) coords) for a
    rotation+translation about the image center."""
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta) / scale, jnp.sin(theta) / scale
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    oy = cy + translate[0]
    ox = cx + translate[1]
    return jnp.array(
        [
            [cos, sin, -cos * oy - sin * ox + cy],
            [-sin, cos, sin * oy - cos * ox + cx],
            [0.0, 0.0, 1.0],
        ]
    )


def perspective_homography(H, W, src_corners):
    """Inverse-map homography sending the output rectangle corners to
    ``src_corners`` (4x2, order: tl, tr, br, bl, as (y, x)).

    Closed form (Heckbert's unit-square-to-quad construction composed
    with the rect->unit-square scaling) instead of an 8x8
    ``jnp.linalg.solve``: identical matrices to f32 tolerance
    (tested), but batched LU lowers to a serial kernel on TPU that
    profiled at 0.6% of the whole v2 step for 32 tiny systems
    (benchmarks/PROFILE_v2_r04.md); this is a handful of fused VPU
    ops."""
    # unit-square corners (u, v) = (y/(H-1), x/(W-1)): tl=(0,0),
    # tr=(0,1), br=(1,1), bl=(1,0). Heckbert's p0..p3 walk
    # (0,0),(1,0),(1,1),(0,1) -> ours reorder to tl, bl, br, tr.
    q = src_corners[jnp.array([0, 3, 2, 1])]  # (4, 2) as (y, x)
    x0, x1, x2, x3 = q[0, 0], q[1, 0], q[2, 0], q[3, 0]  # sy at corners
    y0, y1, y2, y3 = q[0, 1], q[1, 1], q[2, 1], q[3, 1]  # sx at corners
    sx_, sy_ = x0 - x1 + x2 - x3, y0 - y1 + y2 - y3
    dx1, dx2 = x1 - x2, x3 - x2
    dy1, dy2 = y1 - y2, y3 - y2
    den = dx1 * dy2 - dx2 * dy1
    g = (sx_ * dy2 - dx2 * sy_) / den
    h = (dx1 * sy_ - sx_ * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    iu, iv = 1.0 / (H - 1.0), 1.0 / (W - 1.0)
    return jnp.stack(
        [
            jnp.stack([a * iu, b * iv, c]),
            jnp.stack([d * iu, e * iv, f]),
            jnp.stack([g * iu, h * iv, jnp.ones_like(c)]),
        ]
    )


def homography_grid(H, W, Hm):
    """(y, x) source-coordinate grid for the inverse-map homography."""
    grid = _identity_grid(H, W)
    ones = jnp.ones_like(grid[..., :1])
    pts = jnp.concatenate([grid, ones], axis=-1)  # (H,W,3) as (y,x,1)
    warped = pts @ Hm.T
    return warped[..., :2] / jnp.maximum(warped[..., 2:3], 1e-8)


# kept for API compatibility / tests
def affine_grid(H, W, angle_deg, translate, scale=1.0):
    return homography_grid(H, W, affine_homography(H, W, angle_deg, translate, scale))


def perspective_grid(H, W, src_corners):
    return homography_grid(H, W, perspective_homography(H, W, src_corners))


# ------------------------------------------------------------- pipeline
def random_color_augment(key, batch, *, hue=0.01, sat=0.01, sharp=0.3,
                         p_jitter=0.7, p_sharp=0.4):
    """The color half of the reference stack (jitter + sharpness) alone.

    Used by the composed-cutout fast path (cutouts.py), which folds
    flip/affine/perspective into the crop warp itself: color ops run on
    SOURCE-resolution copies (fewer pixels), geometry runs once."""
    N = batch.shape[0]
    keys = jax.random.split(key, 5)
    do_jit = jax.random.bernoulli(keys[0], p_jitter, (N,))
    hue_shift = jax.random.uniform(keys[1], (N,), minval=-hue, maxval=hue)
    sat_fac = jax.random.uniform(keys[2], (N,), minval=1 - sat, maxval=1 + sat)
    jittered = jax.vmap(color_jitter)(batch, hue_shift, sat_fac)
    batch = jnp.where(do_jit[:, None, None, None], jittered, batch)

    do_sharp = jax.random.bernoulli(keys[3], p_sharp, (N,))
    sharp_fac = jax.random.uniform(keys[4], (N,), minval=1.0, maxval=1.0 + sharp)
    sharped = jax.vmap(sharpness)(batch, sharp_fac)
    return jnp.where(do_sharp[:, None, None, None], sharped, batch)


def random_geometry(key, n, H, W, *, degrees=30.0, translate=0.1,
                    distortion=0.2, p_flip=0.5, p_affine=0.8, p_persp=0.4):
    """Per-sample inverse-map homographies (n, 3, 3) at (H, W) OUTPUT
    coordinates for the reference's geometric augs — horizontal flip,
    rotation+translation, perspective — identity rows where an aug does
    not fire. Value-chain order matches random_augment: flip, then
    affine, then perspective, i.e. M = F @ A @ P."""
    keys = jax.random.split(key, 5)
    eye = jnp.eye(3)

    do_flip = jax.random.bernoulli(keys[0], p_flip, (n,))
    flip = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, W - 1.0], [0.0, 0.0, 1.0]])

    do_aff = jax.random.bernoulli(keys[1], p_affine, (n,))
    angles = jax.random.uniform(keys[2], (n,), minval=-degrees, maxval=degrees)
    trans = jax.random.uniform(
        keys[3], (n, 2), minval=-translate, maxval=translate
    ) * jnp.array([H, W])

    do_persp = jax.random.bernoulli(keys[4], p_persp, (n,))
    k_c = jax.random.fold_in(keys[4], 1)
    max_dy, max_dx = distortion * H / 2.0, distortion * W / 2.0
    base = jnp.array([[0.0, 0.0], [0.0, W - 1.0], [H - 1.0, W - 1.0], [H - 1.0, 0.0]])
    sign = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], jnp.float32)
    deltas = (
        jax.random.uniform(k_c, (n, 4, 2)) * jnp.array([max_dy, max_dx]) * sign
    )
    corners = base + deltas

    def compose(sel_f, sel_a, angle, t, sel_p, cs):
        F = jnp.where(sel_f, flip, eye)
        A = jnp.where(sel_a, affine_homography(H, W, angle, t), eye)
        Pm = jnp.where(sel_p, perspective_homography(H, W, cs), eye)
        return F @ A @ Pm

    return jax.vmap(compose)(do_flip, do_aff, angles, trans, do_persp, corners)


def random_augment(key, batch, *, hue=0.01, sat=0.01, sharp=0.3,
                   degrees=30.0, translate=0.1, distortion=0.2,
                   p_flip=0.5, p_jitter=0.7, p_sharp=0.4, p_affine=0.8,
                   p_persp=0.4, warp_impl="2pass"):
    """Apply the reference's augmentation stack to (N, H, W, C) in [0,1]."""
    N, H, W, _ = batch.shape
    keys = jax.random.split(key, 10)

    # horizontal flip
    do_flip = jax.random.bernoulli(keys[0], p_flip, (N,))
    batch = jnp.where(do_flip[:, None, None, None], batch[:, :, ::-1, :], batch)

    # color jitter (hue/sat)
    do_jit = jax.random.bernoulli(keys[1], p_jitter, (N,))
    hue_shift = jax.random.uniform(keys[2], (N,), minval=-hue, maxval=hue)
    sat_fac = jax.random.uniform(keys[3], (N,), minval=1 - sat, maxval=1 + sat)
    jittered = jax.vmap(color_jitter)(batch, hue_shift, sat_fac)
    batch = jnp.where(do_jit[:, None, None, None], jittered, batch)

    # sharpness
    do_sharp = jax.random.bernoulli(keys[4], p_sharp, (N,))
    sharp_fac = jax.random.uniform(keys[5], (N,), minval=1.0, maxval=1.0 + sharp)
    sharped = jax.vmap(sharpness)(batch, sharp_fac)
    batch = jnp.where(do_sharp[:, None, None, None], sharped, batch)

    # geometric: affine (rotation+translation) then perspective, COMPOSED
    # into one homography per image so the batch pays a single bilinear
    # resampling pass instead of two (gathers dominate warp cost on TPU;
    # composing coordinate maps is also one fewer interpolation).
    do_aff = jax.random.bernoulli(keys[6], p_affine, (N,))
    angles = jax.random.uniform(keys[7], (N,), minval=-degrees, maxval=degrees)
    trans = jax.random.uniform(
        keys[8], (N, 2), minval=-translate, maxval=translate
    ) * jnp.array([H, W])

    do_persp = jax.random.bernoulli(keys[9], p_persp, (N,))
    k_c = jax.random.fold_in(keys[9], 1)
    max_dy, max_dx = distortion * H / 2.0, distortion * W / 2.0
    base = jnp.array([[0.0, 0.0], [0.0, W - 1.0], [H - 1.0, W - 1.0], [H - 1.0, 0.0]])
    sign = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], jnp.float32)
    deltas = (
        jax.random.uniform(k_c, (N, 4, 2))
        * jnp.array([max_dy, max_dx])
        * sign
    )
    corners = base + deltas

    eye = jnp.eye(3)

    def compose(sel_aff, angle, t, sel_persp, cs):
        A = jnp.where(sel_aff, affine_homography(H, W, angle, t), eye)
        Pm = jnp.where(sel_persp, perspective_homography(H, W, cs), eye)
        # output -> perspective map -> affine map -> source
        return A @ Pm

    Ms = jax.vmap(compose)(do_aff, angles, trans, do_persp, corners)
    any_warp = jnp.logical_or(do_aff, do_persp)

    if warp_impl == "2pass":
        # scanline matmul warp: forward AND backward run on the MXU
        # (gather/scatter-free) — see warp2pass.py
        from imagegenerator_tpu.v2.warp2pass import warp_homography_2pass

        warped = warp_homography_2pass(batch, Ms)
    else:
        def apply_warp(img, M):
            return bilinear_sample(img, homography_grid(H, W, M))

        warped = jax.vmap(apply_warp)(batch, Ms)
    batch = jnp.where(any_warp[:, None, None, None], warped, batch)
    return batch
