"""Custom-VJP gradient utilities for the v2 latent-optimization path.

JAX-native equivalents of the reference's ``torch.autograd.Function``
subclasses (``/root/reference/v2_implementation/utils.py:10-36``):

* ``replace_grad(x_forward, x_backward)`` — forward returns ``x_forward``;
  the backward pass routes the cotangent entirely to ``x_backward``
  (summed down to its shape, mirroring ``grad_in.sum_to_size``).
* ``clamp_with_grad(x, lo, hi)`` — clamp in the forward pass; in the
  backward pass zero out gradient components that would push the value
  further out of range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sum_to_shape(x: jax.Array, shape) -> jax.Array:
    """Reduce ``x`` to ``shape`` by summing broadcasted axes
    (the JAX analog of torch's ``Tensor.sum_to_size``)."""
    ndiff = x.ndim - len(shape)
    if ndiff > 0:
        x = x.sum(axis=tuple(range(ndiff)))
    axes = tuple(i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1)
    if axes:
        x = x.sum(axis=axes, keepdims=True)
    return x.reshape(shape)


@jax.custom_vjp
def replace_grad(x_forward: jax.Array, x_backward: jax.Array) -> jax.Array:
    return x_forward


def _replace_grad_fwd(x_forward, x_backward):
    return x_forward, x_backward.shape


def _replace_grad_bwd(bwd_shape, g):
    return jnp.zeros_like(g), _sum_to_shape(g, bwd_shape)


replace_grad.defvjp(_replace_grad_fwd, _replace_grad_bwd)


@jax.custom_vjp
def clamp_with_grad(x: jax.Array, lo: float, hi: float) -> jax.Array:
    return jnp.clip(x, lo, hi)


def _clamp_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), (x, lo, hi)


def _clamp_bwd(res, g):
    x, lo, hi = res
    # Keep the gradient only where it does not push x further outside
    # [lo, hi]: pass iff g * (x - clamp(x)) >= 0 (reference utils.py:29-36).
    keep = (g * (x - jnp.clip(x, lo, hi)) >= 0).astype(g.dtype)
    return g * keep, None, None


clamp_with_grad.defvjp(_clamp_fwd, _clamp_bwd)
