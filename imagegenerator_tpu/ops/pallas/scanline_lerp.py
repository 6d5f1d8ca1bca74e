"""Pallas TPU kernel: banded scanline linear resample via lane gathers.

The two-pass warp (``v2/warp2pass.py``) contracts per-scanline linear-
interpolation weight matrices with the image on the MXU/VPU. That dense
formulation generates a (S, O, K) tent-weight grid — ~12 VPU ops per
element forward AND backward — and profiles as ~25% of the whole v2
latent-opt step (benchmarks/PROFILE_v2_r03.md). But each weight ROW has
exactly TWO nonzeros: out[o] = (1-f)*src[k0] + f*src[k0+1]. This kernel
computes that 2-tap lerp directly with per-lane dynamic gathers
(Mosaic's lane-dim ``take_along_axis``), reducing per-output work from
O(K) to O(1):

  forward:  2 gathers + a lerp per (scanline, output) element — measured
            2.3x faster than the dense forward at the 32x(128->224)
            default (0.64 vs ~1.5 ms);
  backward: the TRANSPOSED dense contraction d_src = W^T g with the tent
            weights regenerated and fused by XLA. A banded pallas
            backward (taps-windowed gathers centered by the analytic
            inverse map) was built and profiled SLOWER than this (2.73
            vs ~2.3 ms: Mosaic per-sublane gather throughput x taps x
            chunk masking beats the element-count win), so the hybrid
            keeps the kernel where it wins and XLA where it wins.

The backward is the exact transpose of the forward's weights (tent of
clipped coords — identical formula). Gradients w.r.t. the coordinate
maps are not needed (they come from the PRNG-driven augmentation
sampler) and are returned as zeros.

Layout: channel-major (S, C, K) so the gathered axis rides LANES; C=3
image channels share each gather's index vector. Mosaic's lane gather
(``tpu.dynamic_gather``) requires (a) the gathered operand to span ONE
vreg along the gather dim — so the kernel requires K <= 128 and callers
fall back to the dense path above that — and (b) index shape == operand
shape, so outputs are processed in K-wide chunks (O zero-padded to a
multiple of K) and the backward's gathers from the O-wide arrays are
chunk-decomposed with validity masks. Monotonicity of the per-scanline
coordinate map (guaranteed for the Mobius row/column maps of a
homography without a pole in range — warp2pass docstring) bounds the
backward's band width: ``taps`` >= max |d inv_coords/dk| + 2.

Reference workload this accelerates:
``/root/reference/v2_implementation/vision_utils.py:71-125`` (the
cutout resample + augmentation warp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scanlines per program. Large on purpose: the per-program work is a
# handful of vreg ops + gathers, so at small tiles the Mosaic grid-step
# overhead dominates (measured: _TS=8 made the kernel SLOWER than the
# dense einsums it replaces; 64 amortizes the grid without pressuring
# VMEM — ~1 MB of blocks per program at the 128->224 default).
_TS = int(__import__("os").environ.get("IMAGEGEN_SCANLINE_TS", "64"))


MAX_GATHER_K = 128  # tpu.dynamic_gather: one vreg along the gather dim


def _fwd_kernel(src_ref, coords_ref, out_ref, *, K, C, OP):
    ts = src_ref.shape[0]
    src2d = src_ref[:].reshape(ts * C, K)
    for c in range(OP // K):
        coords_c = coords_ref[:, c * K : (c + 1) * K]  # (ts, K)
        s = jnp.clip(coords_c, 0.0, K - 1.0)
        k0 = jnp.minimum(s.astype(jnp.int32), K - 2)
        f = s - k0.astype(s.dtype)
        idx0 = jnp.broadcast_to(k0[:, None, :], (ts, C, K)).reshape(ts * C, K)
        g0 = jnp.take_along_axis(src2d, idx0, axis=1)
        g1 = jnp.take_along_axis(src2d, idx0 + 1, axis=1)
        fb = jnp.broadcast_to(f[:, None, :], (ts, C, K)).reshape(ts * C, K)
        out_ref[:, :, c * K : (c + 1) * K] = (g0 + fb * (g1 - g0)).reshape(
            ts, C, K
        )


def _pad_axis(x, axis, to):
    pad = to - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_s(x):
    pad = (-x.shape[0]) % _TS
    return _pad_axis(x, 0, x.shape[0] + pad) if pad else x


def _fwd_call(src, coords, interpret):
    S0, C, K = src.shape
    O = coords.shape[1]
    assert K <= MAX_GATHER_K, f"scanline_lerp requires K <= {MAX_GATHER_K}"
    OP = -(-O // K) * K  # O padded to a multiple of K (chunked gathers)
    src = _pad_s(src.astype(jnp.float32))
    coords = _pad_s(_pad_axis(coords.astype(jnp.float32), 1, OP))
    S = src.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, C=C, OP=OP),
        out_shape=jax.ShapeDtypeStruct((S, C, OP), jnp.float32),
        grid=(S // _TS,),
        in_specs=[
            pl.BlockSpec((_TS, C, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TS, OP), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TS, C, OP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(src, coords)
    return out[:S0, :, :O]


def _bwd_call(g, coords, K):
    """d_src = W^T g with the tent weights regenerated in bf16 and the
    contraction fused by XLA — the exact transpose of the forward's
    weights (see module docstring for why this beats a banded kernel)."""
    s = jnp.clip(coords.astype(jnp.float32), 0.0, K - 1.0)
    k = jnp.arange(K, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(s[..., None] - k)).astype(jnp.bfloat16)
    return jnp.einsum(
        "sok,sco->sck",
        w,
        g.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scanline_lerp(src, coords, interpret: bool = False):
    """Banded linear resample along the last axis.

    src:    (S, C, K) source scanlines (channel-major)
    coords: (S, O) f32 source position for each output sample
    returns: (S, C, O) f32 with out[s,c,o] = lerp(src[s,c], coords[s,o])
             under border clamp (identical weights to the tent matrix of
             warp2pass._line_weights). Forward runs as a Pallas gather
             kernel; backward as the XLA-fused transposed contraction.
    """
    return _fwd_call(src, coords, interpret)


def _vjp_fwd(src, coords, interpret):
    K = src.shape[2]
    return _fwd_call(src, coords, interpret), (coords, K)


def _vjp_bwd(interpret, res, g):
    coords, K = res
    return _bwd_call(g, coords, K), jnp.zeros_like(coords)


scanline_lerp.defvjp(_vjp_fwd, _vjp_bwd)
