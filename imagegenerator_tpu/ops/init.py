"""Parameter initializers matching PyTorch layer defaults.

The reference never overrides torch's default inits, so distributional
parity requires reproducing them:

* ``nn.Conv2d`` / ``nn.ConvTranspose2d`` / ``nn.Linear`` weights:
  ``kaiming_uniform_(a=sqrt(5))`` which reduces to ``U(-1/sqrt(fan_in),
  1/sqrt(fan_in))``.
* biases: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` with fan_in of the weight.

fan_in conventions (receptive field x input channels):
  * conv HWIO ``(kh,kw,I,O)``: fan_in = kh*kw*I
  * conv-transpose ``(kh,kw,O,I)``: torch computes fan_in on the
    ``(in,out,kh,kw)`` tensor as ``out*kh*kw`` — i.e. the *output* channel
    count times the receptive field.
  * dense ``(I,O)``: fan_in = I
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """HWIO conv kernel: U(±1/sqrt(kh*kw*in))."""
    kh, kw, in_ch, _ = shape
    return _uniform(key, shape, 1.0 / np.sqrt(kh * kw * in_ch), dtype)


def torch_convT_kernel_init(key, shape, dtype=jnp.float32):
    """(kh, kw, out, in) transpose-conv kernel: torch fan_in = kh*kw*out."""
    kh, kw, out_ch, _ = shape
    return _uniform(key, shape, 1.0 / np.sqrt(kh * kw * out_ch), dtype)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    """(in, out) dense kernel: U(±1/sqrt(in))."""
    in_f, _ = shape
    return _uniform(key, shape, 1.0 / np.sqrt(in_f), dtype)


def fan_in_bias_init(fan_in: int):
    """torch bias init: U(±1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)

    return init
