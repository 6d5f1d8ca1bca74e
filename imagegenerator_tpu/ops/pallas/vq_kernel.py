"""Pallas TPU kernel: fused nearest-codebook search.

The XLA formulation of vector quantization materializes the full
(N, n_embed) distance matrix in HBM before the argmin — for the f16
ImageNet VQGAN that's N x 16384 floats per call. This kernel streams
codebook tiles through VMEM and keeps only a running (min, argmin) per
row, so HBM traffic drops from O(N*K) to O(N*D + K*D):

  grid = (N/NT, K/KT); for a fixed row tile the K tiles arrive
  sequentially (TPU grids iterate the last axis innermost), so VMEM
  scratch carries the running best distance across K steps. Each step is
  one (NT, D) x (D, KT) MXU matmul plus a VPU row-min.

Since argmin_k ||x - c_k||^2 = argmin_k (||c_k||^2 - 2 x.c_k), the
row-constant ||x||^2 term is never computed at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILE = 256
K_TILE = 2048


def _vq_kernel(x_ref, cbt_ref, c2_ref, idx_ref, best_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # scores = ||c||^2 - 2 x.c  (row-constant ||x||^2 dropped)
    xc = jax.lax.dot_general(
        x_ref[:],
        cbt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = c2_ref[:] - 2.0 * xc  # (NT, KT)

    local_min = jnp.min(scores, axis=1, keepdims=True)  # (NT, 1)
    local_arg = jnp.argmin(scores, axis=1)[:, None].astype(jnp.int32)
    local_arg = local_arg + k * K_TILE

    better = local_min < best_ref[:]
    idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
    best_ref[:] = jnp.where(better, local_min, best_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codebook_indices_pallas(
    x: jax.Array, codebook: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """x: (N, D) float32/bfloat16; codebook: (K, D). Returns (N,) int32.

    Pads N to N_TILE and K to K_TILE (padded codebook rows get +inf
    scores so they are never selected).
    """
    n, d = x.shape
    k, _ = codebook.shape

    n_pad = (-n) % N_TILE
    k_pad = (-k) % K_TILE
    xp = jnp.pad(x.astype(jnp.float32), ((0, n_pad), (0, 0)))
    cbt = jnp.pad(codebook.astype(jnp.float32), ((0, k_pad), (0, 0))).T  # (D, Kp)
    c2 = jnp.sum(jnp.square(cbt), axis=0, keepdims=True)  # (1, Kp)
    if k_pad:
        pad_mask = jnp.arange(c2.shape[1]) >= k
        c2 = jnp.where(pad_mask[None, :], jnp.inf, c2)

    np_, kp = xp.shape[0], cbt.shape[1]
    grid = (np_ // N_TILE, kp // K_TILE)

    idx = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, K_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (N_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N_TILE, 1), jnp.float32)],
        interpret=interpret,
    )(xp, cbt, c2)
    return idx[:n, 0]


def supported(d: int) -> bool:
    """The kernel wants the contraction dim on full lanes."""
    return d % 128 == 0
