"""Two-pass scanline homography warp (Catmull–Smith decomposition).

Gather-based image warps are the wrong shape for TPU: the forward is a
general gather and the backward a scatter-add, both of which XLA
serializes. This module decomposes an inverse-map homography into two
SCANLINE resampling passes:

  pass 1 (horizontal): I1[y, j] = S[y, hx(y, j)]   for source rows y
  pass 2 (vertical):   T[i, j]  = I1[sy(i, j), j]

For a homography M (output (i,j,1) -> source (sy, sx, w)):
  sy(i,j) = (m00 i + m01 j + m02) / (m20 i + m21 j + m22),
and for fixed j, sy is a Möbius function of i with coefficients
a = m00, b = m01 j + m02, c = m20, d = m21 j + m22; inverting gives
i(y|j) = (d y - b) / (a - c y), and substituting into sx yields the
closed-form horizontal map

  hx(y, j) = (m10 (d y - b) + (m11 j + m12)(a - c y))
           / (m20 (d y - b) + (m21 j + m22)(a - c y)).

Each pass materializes per-scanline linear-interpolation weights and
contracts them with one batched matmul — the MXU does the work, and the
BACKWARD is just the transposed matmuls (no scatter). Weights are bf16;
accumulation is f32.

Accuracy: linear interpolation per pass; agrees with direct one-pass
bilinear sampling exactly for axis-aligned maps and to sub-pixel
interpolation error for the rotations (<=30 deg) and mild perspectives
(distortion 0.2) the augmentation pipeline uses. Degenerate scanlines
(a - c y -> 0) need ~90 deg rotations, far outside that range; the
denominator is eps-guarded regardless.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _safe_div(num, den, eps=1e-8):
    return num / jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)


def _kernel_mode():
    """(use_kernel, interpret): IMAGEGEN_WARP_KERNEL=1 enables the Pallas
    banded-lerp kernel (interpret-mode off-TPU, for tests); default is
    the dense einsum path. The kernel is gradient-exact and cuts
    per-element work O(K)->O(1), and its FORWARD in isolation is 2.3x
    faster than the dense contraction — but the whole v2 step measures
    SLOWER with it (67.2 vs 73.1 steps/s median-of-5 on v5e at the
    32x128->224 default): the channel-major transposes + f32 kernel I/O
    around the pallas_call, and the fusion barrier it puts in the middle
    of the augmentation graph, cost more than the forward win (see
    benchmarks/PROFILE_v2_r03.md). Kept opt-in — it scales better with O
    (dense cost is O*K, kernel is O) and is the right shape for larger
    resamples."""
    env = os.environ.get("IMAGEGEN_WARP_KERNEL")
    on_tpu = jax.default_backend() == "tpu"
    if env == "1":
        return True, not on_tpu
    return False, False


def _banded_mode():
    """(block, width) for the block-banded windowed contraction when
    IMAGEGEN_WARP_BANDED=1, else None. Block/width via
    IMAGEGEN_WARP_BAND_BO / IMAGEGEN_WARP_BAND_WB (defaults 16/32:
    exact for per-block source spans up to width-2 = 30 px, i.e. map
    slopes up to 2 — the v2 aug distribution's slopes are ~1)."""
    if os.environ.get("IMAGEGEN_WARP_BANDED") != "1":
        return None
    return (
        int(os.environ.get("IMAGEGEN_WARP_BAND_BO", "16")),
        int(os.environ.get("IMAGEGEN_WARP_BAND_WB", "32")),
    )


def _line_weights(coords, in_size, dtype=jnp.bfloat16):
    """coords: (..., out) source positions -> (..., out, in_size) linear-
    interp weights with border clamp.

    Written as a tent function max(0, 1 - |s - k|) rather than the
    floor/one-hot formulation: identical weights (for k = floor(s) it
    yields 1-frac, for k+1 it yields frac, and a clamped integer s hits
    a single 1), but ~half the VPU ops per element. This matters: the
    (out, in_size)-sized weight generation is fused into the matmul by
    XLA and is the dominant cost of the warp, not the MXU contraction
    (profiled: per-op time is invariant to the einsum's layout)."""
    s = jnp.clip(coords, 0.0, in_size - 1.0)
    k = jnp.arange(in_size, dtype=s.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(s[..., None] - k)).astype(dtype)


def _homography_scanline_coords(m, H, Ho, Wo):
    """Vectorized per-scanline source coordinates for both passes of the
    Catmull–Smith decomposition (shared by the Pallas-kernel and banded
    paths). Returns (hx, sy): hx (N, H, Wo) is the pass-1 horizontal
    source-x per (image, source row, out col); sy (N, Wo, Ho) is the
    pass-2 vertical source-y per (image, out col, out row)."""
    N = m.shape[0]
    y = jnp.arange(H, dtype=jnp.float32)
    i = jnp.arange(Ho, dtype=jnp.float32)
    j = jnp.arange(Wo, dtype=jnp.float32)

    def mc(r, c):  # (N, 1) homography coefficient columns
        return m[:, r, c][:, None]

    # ---- pass 1 (horizontal): hx(y, j), linear-fractional in j with
    # per-(image, source-row) coefficients:
    #   a1 = m10 (m21 y - m01) + m11 (m00 - m20 y)   [j coefficient]
    #   b1 = m10 (m22 y - m02) + m12 (m00 - m20 y)   [constant]
    #   a2/b2: same with m10->m20, m11->m21, m12->m22
    acy = mc(0, 0) - mc(2, 0) * y[None, :]  # (N, H)
    a1 = mc(1, 0) * (mc(2, 1) * y[None, :] - mc(0, 1)) + mc(1, 1) * acy
    b1 = mc(1, 0) * (mc(2, 2) * y[None, :] - mc(0, 2)) + mc(1, 2) * acy
    a2 = mc(2, 0) * (mc(2, 1) * y[None, :] - mc(0, 1)) + mc(2, 1) * acy
    b2 = mc(2, 0) * (mc(2, 2) * y[None, :] - mc(0, 2)) + mc(2, 2) * acy
    hx = _safe_div(
        a1[..., None] * j + b1[..., None], a2[..., None] * j + b2[..., None]
    )  # (N, H, Wo)

    # ---- pass 2 (vertical): sy(i, j) per output column j
    bj = mc(0, 1) * j + mc(0, 2)  # (N, Wo)
    dj = mc(2, 1) * j + mc(2, 2)  # (N, Wo)
    sy = _safe_div(
        mc(0, 0)[..., None] * i + bj[..., None],
        mc(2, 0)[..., None] * i + dj[..., None],
    )  # (N, Wo, Ho)
    return hx, sy


def _warp_kernel_path(images, m, Ho, Wo, interpret):
    """Banded 2-tap formulation of both passes via the Pallas scanline
    kernel (ops/pallas/scanline_lerp.py): each weight row of the dense
    tent matrices has exactly two nonzeros, so the forward contraction is
    a gather+lerp — O(1) per output instead of O(K); the backward is the
    XLA-fused transposed contraction (see the kernel's docstring for the
    measured split). Forward weights are identical to ``_line_weights``
    up to the dense path's bf16 weight cast."""
    from imagegenerator_tpu.ops.pallas.scanline_lerp import scanline_lerp

    N, H, W, C = images.shape
    hx, sy = _homography_scanline_coords(m, H, Ho, Wo)

    src1 = images.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(N * H, C, W)
    i1 = scanline_lerp(
        src1, hx.reshape(N * H, Wo), interpret=interpret
    )  # (N*H, C, Wo)

    src2 = i1.reshape(N, H, C, Wo).transpose(0, 3, 2, 1).reshape(N * Wo, C, H)
    out2 = scanline_lerp(
        src2, sy.reshape(N * Wo, Ho), interpret=interpret
    )  # (N*Wo, C, Ho)
    return out2.reshape(N, Wo, C, Ho).transpose(0, 3, 1, 2)  # (N, Ho, Wo, C)


def _banded_pass(src, s, block: int, width: int):
    """One scanline resampling pass as a BLOCK-BANDED windowed einsum
    (VERDICT.md round-4 next #3 — the named-but-untried shape).

    src: (S, K, C) scanline-major source; s: (S, O) source positions.
    Output positions are blocked ``block`` at a time; each (scanline,
    block) gathers ONE contiguous source window of static ``width`` and
    contracts tent weights (block, width) against it — the same
    linear-interp weights as the dense path, but the weight grid is
    (S, O, width) instead of (S, O, K): ~K/width less generated-weight
    HBM traffic, still a batched matmul (no per-element gather — the
    only gather is one window index per (scanline, block), and its
    backward is a windowed scatter-add at the same coarse granularity).

    Exact vs the dense path whenever each block's positions span at most
    ``width - 2`` source pixels (the v2 aug distribution's slopes are
    ~1; see the caller). Out-of-window positions clamp to the window
    edge — the same graceful border-clamp degradation the dense path
    applies at the image edge."""
    S, K, C = src.shape
    O = s.shape[1]
    pad = (-O) % block
    if pad:
        s = jnp.concatenate([s, jnp.tile(s[:, -1:], (1, pad))], axis=1)
    nb = (O + pad) // block
    width = min(width, K)
    s = jnp.clip(s, 0.0, K - 1.0)
    sblk = s.reshape(S, nb, block)
    base = jnp.clip(
        jnp.floor(sblk.min(axis=2)), 0.0, float(max(0, K - width))
    )  # (S, nb)
    rel = jnp.clip(sblk - base[..., None], 0.0, width - 1.0)  # (S, nb, block)
    k = jnp.arange(width, dtype=s.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - k)).astype(
        jnp.bfloat16
    )  # (S, nb, block, width)
    idx = base.astype(jnp.int32)[..., None] + jnp.arange(width, dtype=jnp.int32)
    win = jnp.take_along_axis(
        src, idx.reshape(S, nb * width)[..., None], axis=1
    ).reshape(S, nb, width, C)
    out = jnp.einsum(
        "sbik,sbkc->sbic", w, win.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(S, nb * block, C)
    return out[:, :O]


def _warp_banded_path(images, m, Ho, Wo, block: int, width: int):
    """Both passes via :func:`_banded_pass` (IMAGEGEN_WARP_BANDED=1)."""
    N, H, W, C = images.shape
    hx, sy = _homography_scanline_coords(m, H, Ho, Wo)
    src1 = images.astype(jnp.float32).reshape(N * H, W, C)
    i1 = _banded_pass(src1, hx.reshape(N * H, Wo), block, width)  # (N*H,Wo,C)
    src2 = (
        i1.reshape(N, H, Wo, C).transpose(0, 2, 1, 3).reshape(N * Wo, H, C)
    )
    out = _banded_pass(src2, sy.reshape(N * Wo, Ho), block, width)
    return out.reshape(N, Wo, Ho, C).transpose(0, 2, 1, 3)  # (N, Ho, Wo, C)


def resize_axis_aligned(
    images: jax.Array, scale: jax.Array, offset: jax.Array,
    out_shape: tuple,
) -> jax.Array:
    """Per-image separable AXIS-ALIGNED resample: src = scale*out +
    offset per axis (inverse map). scale/offset: (N, 2) as (y, x).

    The point of existing next to ``warp_homography_2pass``: an
    axis-aligned map's tent weights don't depend on the scanline, so the
    weight grids are (N, O, K) — ~57 KB per image instead of the
    homography warp's (S, O, K) megabytes — and each pass contracts them
    against ALL rows*channels at once (real MXU N-dim of S*C instead of
    3). The round-4 profile showed the dense homography warp is
    HBM-BOUND on exactly that weight traffic (benchmarks/
    PROFILE_v2_r04.md)."""
    N, H, W, C = images.shape
    Ho, Wo = out_shape
    j = jnp.arange(Wo, dtype=jnp.float32)
    i = jnp.arange(Ho, dtype=jnp.float32)
    sx = scale[:, 1:2] * j[None, :] + offset[:, 1:2]  # (N, Wo)
    sy = scale[:, 0:1] * i[None, :] + offset[:, 0:1]  # (N, Ho)
    wx = _line_weights(sx, W)  # (N, Wo, W)
    wy = _line_weights(sy, H)  # (N, Ho, H)
    x1 = jnp.einsum(
        "nok,nhkc->nhoc", wx, images.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (N, H, Wo, C)
    out = jnp.einsum(
        "nok,nkjc->nojc", wy, x1.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (N, Ho, Wo, C)
    return out.astype(images.dtype)


def warp_homography_2pass(
    images: jax.Array, Ms: jax.Array, out_shape: tuple | None = None
) -> jax.Array:
    """images: (N, H, W, C); Ms: (N, 3, 3) inverse-map homographies in
    (y, x, 1) coordinates, mapping OUTPUT pixel coords to SOURCE pixel
    coords. Returns the warped batch of spatial shape ``out_shape``
    (default: same as input). Rectangular in/out sizes let one warp
    express crop + rescale + flip + affine + perspective composed."""
    N, H, W, C = images.shape
    Ho, Wo = out_shape if out_shape is not None else (H, W)
    out_dtype = images.dtype
    use_kernel, interpret = _kernel_mode()
    # Mosaic's dynamic_gather needs the gathered (source) axis within one
    # vreg: pass 1 gathers along W, pass 2 along H — dense fallback above
    from imagegenerator_tpu.ops.pallas.scanline_lerp import MAX_GATHER_K

    if use_kernel and max(H, W) <= MAX_GATHER_K:
        return _warp_kernel_path(
            images, Ms.astype(jnp.float32), Ho, Wo, interpret
        ).astype(out_dtype)
    banded = _banded_mode()
    if banded is not None:
        return _warp_banded_path(
            images, Ms.astype(jnp.float32), Ho, Wo, *banded
        ).astype(out_dtype)
    y = jnp.arange(H, dtype=jnp.float32)  # source rows (pass 1)
    i = jnp.arange(Ho, dtype=jnp.float32)  # output rows (pass 2)
    j = jnp.arange(Wo, dtype=jnp.float32)  # output columns

    m = Ms.astype(jnp.float32)  # (N, 3, 3)

    def one(img, M):
        m00, m01, m02 = M[0, 0], M[0, 1], M[0, 2]
        m10, m11, m12 = M[1, 0], M[1, 1], M[1, 2]
        m20, m21, m22 = M[2, 0], M[2, 1], M[2, 2]

        # ---- pass 1: horizontal map hx(y, j) on the (H, W) grid
        b = m01 * j + m02  # (W,)
        d = m21 * j + m22  # (W,)
        dy_b = m10 * (d[None, :] * y[:, None] - b[None, :])  # (H, W)
        acy = m00 - m20 * y  # (H,) = a - c*y
        num = dy_b + (m11 * j + m12)[None, :] * acy[:, None]
        den = m20 * (d[None, :] * y[:, None] - b[None, :]) + (
            m21 * j + m22
        )[None, :] * acy[:, None]
        hx = _safe_div(num, den)  # (H, W) source x per (source row, out col)

        w1 = _line_weights(hx, W)  # (H, W_out, W_in) bf16
        i1 = jnp.einsum(
            "hok,hkc->hoc",
            w1,
            img.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (H, W, C)

        # ---- pass 2: vertical map sy(i, j) on the (H, W) grid
        sy = _safe_div(
            m00 * i[:, None] + (m01 * j + m02)[None, :],
            m20 * i[:, None] + (m21 * j + m22)[None, :],
        )  # (H_out, W)

        w2 = _line_weights(sy.swapaxes(0, 1), H)  # (W, H_out, H_in)
        out = jnp.einsum(
            "jok,kjc->ojc",
            w2,
            i1.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out

    return jax.vmap(one)(images, m).astype(out_dtype)
