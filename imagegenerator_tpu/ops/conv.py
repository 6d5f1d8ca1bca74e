"""Functional 2-D convolution ops with PyTorch padding semantics, NHWC layout.

The reference models are defined with ``nn.Conv2d(k, s, p)`` /
``nn.ConvTranspose2d(k, s, p)`` (e.g. ``/root/reference/generator_1.py:26-33``,
``/root/reference/discrminator_1.py:28-40``). We keep the *shape semantics*
(so the architectures match layer-for-layer) but use the TPU-native NHWC
activation layout and HWIO kernel layout so XLA tiles the convs straight
onto the MXU without transposes.

Kernel layouts:
  * ``conv2d``:            ``(kh, kw, in_ch, out_ch)``  (HWIO)
  * ``conv_transpose2d``:  ``(kh, kw, out_ch, in_ch)``  — i.e. HWIO of the
    *forward* conv this op is the transpose of. This matches how a torch
    ``ConvTranspose2d`` weight ``(in, out, kh, kw)`` maps onto JAX:
    ``w_jax = w_torch.transpose(2, 3, 1, 0)``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")

# ---------------------------------------------------------------------------
# Packed fast paths for the k4/s2/p1 image-boundary convs.
#
# A conv touching the 3-channel RGB boundary is HBM-bound on TPU: its
# implicit GEMM has a 3-wide dimension that occupies 3 of the MXU's 128
# lanes, and its data-gradient (which the WGAN-GP double-backward takes
# *twice*) is another 3-lane conv. Profiled on the stage-2 step these ops
# were ~12% of the whole step at 8-34 TFLOP/s vs the 170 TFLOP/s the
# interior convs reach (benchmarks/PROFILE_stage2_r02.md).
#
# For the exact k4/s2/p1 shape every StackGAN boundary conv uses, the op
# is algebraically a k3/s1/p1 conv on a space-to-depth-packed image
# (stride 2 ≡ the s2d block size, kernel 4 ≡ 3 packed taps with two
# zeros). Packing turns (H, W, 3) into (H/2, W/2, 12): 4x fewer pixels,
# 4x more channels — same math, far better MXU occupancy, and the
# backward becomes k3 convs over 12-channel tensors instead of dilated
# convs over 3-channel ones. The kernel params keep the reference (4, 4,
# in, out) shape; the remap below is a few reshapes on a tiny tensor.
#
# Derivation (1-D, pad 1): output o(i) = sum_u W[u] x[2i+u-1], u in 0..3.
# With x2[a, p] = x[2a+p] (p in {0,1}), the source rows 2i-1..2i+2 are
# (a, p) = (i-1, 1), (i, 0), (i, 1), (i+1, 0) — three packed taps
# A in {0,1,2} around i with W3[A, p] = W[2A+p-1] (zero outside 0..3).
# The transpose case follows by the same phase split of the *output*:
# y[2a+p] = sum_A W[p+3-2A] x[a+A-1], i.e. a k3/s1/p1 conv producing
# (p, q, out)-packed channels followed by depth-to-space.
#
# Measured verdict (v5e, stage-2 step, batch 128): a WASH — these convs
# turn out to be bound by ACTIVATION HBM traffic (270-640 GB/s observed,
# near the ~819 GB/s peak), not MXU lanes, and the packing's
# space-to-depth transposes add traffic (767 vs 784 img/s end to end).
# Kept behind IMAGEGEN_PACK_BOUNDARY=1 (default off) — the formulation
# is profitable when the op lowers to a dilated conv that XLA handles
# badly, and is correctness-tested either way (test_ops.py).

_PACK_BOUNDARY = os.environ.get("IMAGEGEN_PACK_BOUNDARY", "0") == "1"


def _pack_s2d_kernel(w: jax.Array) -> jax.Array:
    """(4, 4, C, O) k4/s2/p1 kernel -> (3, 3, 4C, O) kernel over the
    space-to-depth input, channel order (p, q, c)."""
    C, O = w.shape[2], w.shape[3]
    kp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))  # index u' = u + 1
    k3 = kp.reshape(3, 2, 3, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return k3.reshape(3, 3, 4 * C, O)


def _conv2d_s2d(x, w, b, preferred_dtype):
    B, H, W, C = x.shape
    O = w.shape[-1]
    x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    out = lax.conv_general_dilated(
        x2,
        _pack_s2d_kernel(w),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _pack_d2s_kernel(w: jax.Array) -> jax.Array:
    """(4, 4, O, I) k4/s2/p1 transpose kernel -> (3, 3, I, 4O) forward-conv
    kernel whose output channels are (p, q, o) phase-packed."""
    O, I = w.shape[2], w.shape[3]
    kp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    k3 = kp.reshape(3, 2, 3, 2, O, I).transpose(0, 2, 1, 3, 4, 5)
    k3 = k3[::-1, ::-1]  # W3[A, p] = W[p + 3 - 2A]
    return k3.transpose(0, 1, 5, 2, 3, 4).reshape(3, 3, I, 4 * O)


def _conv_transpose2d_d2s(x, w, b, preferred_dtype):
    B, H, W, I = x.shape
    O = w.shape[2]
    y2 = lax.conv_general_dilated(
        x,
        _pack_d2s_kernel(w),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred_dtype,
    )
    y = y2.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, 2 * H, 2 * W, O)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    preferred_dtype=None,
) -> jax.Array:
    """``torch.nn.functional.conv2d`` semantics on NHWC/HWIO.

    Output spatial size: ``(in + 2p - k) // s + 1``.
    """
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    if (
        _PACK_BOUNDARY
        and w.shape[0] == 4
        and w.shape[1] == 4
        and (sh, sw) == (2, 2)
        and (ph, pw) == (1, 1)
        and x.shape[3] <= 8
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        return _conv2d_s2d(x, w, b, preferred_dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    preferred_dtype=None,
) -> jax.Array:
    """``torch.nn.functional.conv_transpose2d`` semantics on NHWC.

    ``w`` has layout ``(kh, kw, out_ch, in_ch)``. Output spatial size:
    ``(in - 1) * s - 2p + k`` (no output_padding / dilation — the reference
    never uses them).

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel — the exact adjoint of ``conv2d`` — which XLA lowers to a single
    MXU-friendly conv.
    """
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    kh, kw = w.shape[0], w.shape[1]
    if (
        _PACK_BOUNDARY
        and (kh, kw) == (4, 4)
        and (sh, sw) == (2, 2)
        and (ph, pw) == (1, 1)
        and w.shape[2] <= 8
    ):
        return _conv_transpose2d_d2s(x, w, b, preferred_dtype)
    # Flip spatial taps and present the kernel as HWIO for the dilated conv:
    # (kh, kw, out, in) -> flipped (kh, kw, in, out).
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    out = lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
