"""Exact-erf GELU with a transcendental-free backward CDF recovery.

The stage-1 headline trains HF SpanBERT semantics, which means exact-erf
GELU (``/root/reference/train.py:68`` loads ``SpanBERT/spanbert-base-cased``;
HF BERT's intermediate activation is erf GELU). The measured price of
exact-vs-tanh is 21.5 ms/step — 10.9% of the whole stage-1 step — and it
rides INSIDE the MLP dot fusions (benchmarks/PROFILE_train_r04.md): the
forward evaluates XLA's erf polynomial and the backward evaluates it
AGAIN, because autodiff recomputes ``erf(y/sqrt2)`` from the saved input
to form d/dy gelu(y) = Phi(y) + y*phi(y).

The trick here: the gelu OUTPUT ``h`` is already a saved residual — the
following Dense needs it for its weight gradient — and ``h = y*Phi(y)``,
so the backward can recover the CDF as ``Phi = h/y`` (one VPU divide)
instead of re-running the erf polynomial. ``phi(y)`` is one hardware
``exp``. Net: the backward's erf evaluation disappears at ZERO extra
residual traffic.

Semantics:

* forward: calls ``jax.nn.gelu(approximate=False)`` — bit-identical to
  the default exact path, in and out of this wrapper.
* backward: algebraically the exact formula Phi(y) + y*phi(y); the Phi
  term carries the bf16 rounding of the saved ``h`` (relative ~2^-9),
  which is the same order as the bf16 rounding the gradient itself
  receives in mixed-precision training (measured max deviation from the
  recompute path: one bf16 ulp of the gradient). ``|y| < 1/32`` uses the
  series Phi ~ 0.5 + phi(0)*y (cubic error < 3e-6) to avoid 0/0.

This is a precision-neutral rewrite of the SAME exact-GELU math, not an
approximation like tanh GELU (which changes the function by ~1e-3).
Enabled by ``BertConfig.gelu_output_bwd`` (stage-1 headline);
``gelu_output_bwd=False`` keeps the erf-recompute backward that the
fixed-seed goldens pin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_SQRT_2PI = 0.3989422804014327  # phi(0) = 1/sqrt(2*pi)


@jax.custom_vjp
def gelu_exact_output_bwd(y: jax.Array) -> jax.Array:
    """Exact-erf GELU; backward recovers Phi from the saved output."""
    return jax.nn.gelu(y, approximate=False)


def _fwd(y):
    h = jax.nn.gelu(y, approximate=False)
    return h, (y, h)


def _bwd(res, g):
    y, h = res
    yf = y.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    phi = jnp.exp(yf * yf * -0.5) * _INV_SQRT_2PI
    small = jnp.abs(yf) < 0.03125
    cdf = jnp.where(
        small,
        0.5 + _INV_SQRT_2PI * yf,
        hf / jnp.where(small, 1.0, yf),
    )
    d = cdf + yf * phi
    return ((g.astype(jnp.float32) * d).astype(y.dtype),)


gelu_exact_output_bwd.defvjp(_fwd, _bwd)
