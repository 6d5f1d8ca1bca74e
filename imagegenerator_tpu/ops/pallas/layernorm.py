"""Pallas TPU kernel: fused LayerNorm forward + VJP.

Why: the stage-1 profile (benchmarks/PROFILE_stage1_r03.md) shows
~27 ms/step of backward ``reduce_sum`` + unfused f32 residual/LayerNorm
elementwise around the 25 BERT LayerNorms — XLA computes dx, dgamma and
dbeta as separate passes over the (B*T, 768) f32 cotangent, re-reading
HBM each time. This kernel computes the whole LayerNorm VJP (dx, dgamma,
dbeta) in ONE pass over (dy, x): the per-row moments ride in registers
and the parameter gradients accumulate in a VMEM scratch across the
sequential row-block grid, so HBM traffic drops from ~5 tensor reads to
2 reads + 1 write.

Numerics: all statistics in f32 regardless of input dtype (matches
``flax.linen.LayerNorm``'s promotion of a bf16 input against f32
params); forward outputs the promoted dtype, dx is cast back to
``x.dtype`` exactly as AD through the implicit ``astype`` would.

Role in the reference: the text-encoder LayerNorms of the fine-tuned
SpanBERT (``/root/reference/train.py:68``; HF BERT's
``attention.output.LayerNorm`` / ``output.LayerNorm``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512


def supported(d: int) -> bool:
    """Feature dim must fill whole lane tiles."""
    return d % 128 == 0


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(
        jnp.float32
    )
    y_ref[:] = y.astype(y_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(
    dy_ref, x_ref, mean_ref, rstd_ref, scale_ref,
    dx_ref, dgamma_ref, dbeta_ref,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    dy = dy_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    rstd = rstd_ref[:]
    xhat = (x - mean_ref[:]) * rstd
    dxhat = dy * scale_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[:] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)
    dgamma_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _pad_rows(a, n_pad):
    return jnp.pad(a, ((0, n_pad), (0, 0))) if n_pad else a


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, scale, bias, eps: float = 1e-12, interpret: bool = False):
    """LayerNorm over the last axis of ``x`` (any leading shape).

    ``scale``/``bias`` are (D,) parameters. Output dtype follows JAX
    promotion of (x, scale) — f32 params on bf16 activations yield f32,
    matching ``nn.LayerNorm``'s default.
    """
    y, _ = _fwd(x, scale, bias, eps, interpret)
    return y


def _call_fwd(x2, scale, bias, eps, interpret):
    n, d = x2.shape
    n_pad = (-n) % ROW_TILE
    xp = _pad_rows(x2, n_pad)
    np_ = n + n_pad
    out_dtype = jnp.promote_types(x2.dtype, scale.dtype)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(np_ // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d), out_dtype),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xp, scale[None, :], bias[None, :])
    return y[:n], mean[:n], rstd[:n]


def _fwd(x, scale, bias, eps, interpret):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    y, mean, rstd = _call_fwd(x2, scale, bias, eps, interpret)
    # bias rides in the residuals only so the bwd can cast dbeta to ITS
    # dtype (scale and bias may differ)
    return y.reshape(shape), (x2, mean, rstd, scale, bias)


def _bwd(eps, interpret, res, dy):
    x2, mean, rstd, scale, bias = res
    d = x2.shape[-1]
    dy2 = dy.reshape(-1, d)
    n = x2.shape[0]
    n_pad = (-n) % ROW_TILE
    np_ = n + n_pad
    # padded dy rows are zero => they contribute nothing to dgamma/dbeta
    dyp = _pad_rows(dy2, n_pad)
    xp = _pad_rows(x2, n_pad)
    meanp = _pad_rows(mean, n_pad)
    # rstd of padded rows multiplies a zero dxhat; keep it finite
    rstdp = _pad_rows(rstd, n_pad)
    dx, dgamma, dbeta = pl.pallas_call(
        _bwd_kernel,
        grid=(np_ // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(dyp, xp, meanp, rstdp, scale[None, :])
    dx = dx[:n].reshape(dy.shape[:-1] + (d,))
    return (
        dx,
        dgamma[0].astype(scale.dtype),
        dbeta[0].astype(bias.dtype),
    )


fused_layernorm.defvjp(_fwd, _bwd)
