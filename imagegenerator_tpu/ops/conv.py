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

import jax
import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


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
