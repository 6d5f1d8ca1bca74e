"""flax.linen layers with torch shape/init semantics on NHWC.

These are the building blocks for the v1 StackGAN models
(``/root/reference/generator_1.py``, ``discrminator_1.py``,
``generator_2.py``, ``discriminator_2.py``): strided conv / conv-transpose
blocks with BatchNorm and (Leaky)ReLU. The block APIs are kept
kernel-swappable so the fused Pallas implementations can slot in behind
the same interface.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagegenerator_tpu.ops import conv as conv_ops
from imagegenerator_tpu.ops import init as torch_init

Dtype = Any


class Conv2d(nn.Module):
    """torch ``nn.Conv2d(in, out, k, s, p)`` on NHWC. Kernel: HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = None  # compute dtype; None = infer from input
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            torch_init.torch_conv_kernel_init,
            (k, k, in_ch, self.features),
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_init.fan_in_bias_init(k * k * in_ch),
                (self.features,),
                self.param_dtype,
            )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        return conv_ops.conv2d(
            x,
            kernel.astype(dtype),
            bias if bias is None else bias.astype(dtype),
            stride=self.stride,
            padding=self.padding,
        )


class ConvTranspose2d(nn.Module):
    """torch ``nn.ConvTranspose2d(in, out, k, s, p)`` on NHWC.

    Kernel layout ``(kh, kw, out, in)`` — see ``ops.conv.conv_transpose2d``.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            torch_init.torch_convT_kernel_init,
            (k, k, self.features, in_ch),
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            # torch fan_in for ConvTranspose2d bias = out_ch * k * k.
            bias = self.param(
                "bias",
                torch_init.fan_in_bias_init(k * k * self.features),
                (self.features,),
                self.param_dtype,
            )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        return conv_ops.conv_transpose2d(
            x,
            kernel.astype(dtype),
            bias if bias is None else bias.astype(dtype),
            stride=self.stride,
            padding=self.padding,
        )


class Dense(nn.Module):
    """torch ``nn.Linear`` with torch default init. Kernel: (in, out)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_init.torch_dense_kernel_init,
            (in_f, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        out = jnp.dot(x, kernel.astype(dtype), preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_init.fan_in_bias_init(in_f),
                (self.features,),
                self.param_dtype,
            )
            out = out + bias.astype(dtype)
        return out


class BatchNorm(nn.Module):
    """torch ``nn.BatchNorm2d`` semantics (momentum 0.1, eps 1e-5).

    flax momentum convention: ``new = momentum*old + (1-momentum)*batch``,
    so torch momentum 0.1 -> flax momentum 0.9. Per-replica statistics:
    under the DP ``shard_map`` each shard normalizes with its own batch
    stats, matching the reference's torch_xla per-core BatchNorm (no
    cross-replica sync in the reference).
    """

    use_running_average: bool = False
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)


class UpBlock(nn.Module):
    """ConvTranspose(k4) + BN + ReLU — the StackGAN upsampling block
    (``/root/reference/generator_1.py:26-40``)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvTranspose2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = BatchNorm(dtype=self.dtype, param_dtype=self.param_dtype)(
            x, use_running_average=not train
        )
        return jax.nn.relu(x)


class DownBlock(nn.Module):
    """Conv(k4 s2 p1) + BN + LeakyReLU(0.1) — the StackGAN downsampling
    block (``/root/reference/discrminator_1.py:28-40``)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    negative_slope: float = 0.1
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = BatchNorm(dtype=self.dtype, param_dtype=self.param_dtype)(
            x, use_running_average=not train
        )
        return jax.nn.leaky_relu(x, self.negative_slope)
