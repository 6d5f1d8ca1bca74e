"""StackGAN Stage-I / Stage-II generators and discriminators, NHWC.

Layer-for-layer capability match with the reference architectures:

* ``StageIGenerator``    — ``/root/reference/generator_1.py:5-40``:
  [c_hat(128) ‖ z(100)] = 228 → 1x1 spatial → ConvT 228→192 (k4 s1 p0,
  → 4x4) → 192→96 → 96→48 → 48→24 (each k4 s2 p1, BN+ReLU) →
  ConvT 24→3 (k4 s2 p1) + tanh ⇒ 64x64x3.
* ``StageIDiscriminator`` — ``/root/reference/discrminator_1.py:6-52``:
  64px → Conv(3→64 k4s2p1)+LReLU(0.1) → DownBlocks 64→128→256→512 ⇒
  4x4x512; text tem(512)→Dense→Nd(128) replicated 4x4, channel-concat
  (640) → 1x1 conv → 128 → flatten → Dense(1) critic score.
* ``StageIIGenerator``   — ``/root/reference/generator_2.py:42-105``:
  64px fake → Conv(3→128)+LReLU → DownBlock(128→512) ⇒ 16x16x512;
  c_hat2(128) replicated 16x16, concat ⇒ 640ch; 4 ResidualBlocks
  (640↔320); UpBlocks 640→320→160→80 → ConvT(80→3)+tanh ⇒ 256x256x3.
* ``StageIIDiscriminator`` — ``/root/reference/discriminator_2.py:5-54``:
  256px → Conv(3→16)+LReLU → DownBlocks 16→32→64→128→256→512 ⇒ 4x4x512;
  text path as Stage-I but 1x1 conv → 160 → Dense(160*16, 1).
  (The reference's ``forward`` uses an undefined ``x`` instead of ``img``
  at discriminator_2.py:28 — a crash bug we fix, as documented in
  SURVEY.md §2.)

All modules run NHWC with channel-last concats — on TPU the channel axis
is the lane axis, so the text-feature concat + 1x1 conv fuse into a single
MXU matmul per pixel.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagegenerator_tpu.ops.layers import (
    BatchNorm,
    Conv2d,
    ConvTranspose2d,
    Dense,
    DownBlock,
    UpBlock,
)

Dtype = Any


class StageIGenerator(nn.Module):
    """``channels`` parameterizes depth: the first entry is the stride-1
    1x1→4x4 block, each later entry a stride-2 upsample, plus the final
    stride-2 ConvT to RGB — output resolution = 2**(len(channels) + 2).
    The default (192, 96, 48, 24) is the reference architecture (64px);
    shorter tuples give genuinely small test configs (e.g. 2 -> 16px)."""

    c_dim: int = 128
    z_dim: int = 100
    channels: tuple = (192, 96, 48, 24)
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @property
    def resolution(self) -> int:
        return 2 ** (len(self.channels) + 2)

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (B, c_dim + z_dim) -> (B, 1, 1, C)
        x = x[:, None, None, :]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = UpBlock(
            self.channels[0], kernel_size=4, stride=1, padding=0, **kw
        )(x, train)
        for feat in self.channels[1:]:
            x = UpBlock(feat, **kw)(x, train)
        x = ConvTranspose2d(3, 4, 2, 1, **kw)(x)
        return jnp.tanh(x)


class _TextImageCriticHead(nn.Module):
    """Shared critic head: compress text -> Nd, replicate over the 4x4
    feature map, concat, 1x1 conv, flatten, scalar score. Stateless (no
    BN), so one image-tower output can be scored against several text
    embeddings — the fused matched/mismatched formulation."""

    nd: int
    resize_ch: int
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, tem):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        compressed = Dense(self.nd, **kw)(tem)  # (B, Nd)
        h, w = feat.shape[1], feat.shape[2]
        rep = jnp.broadcast_to(
            compressed[:, None, None, :], (feat.shape[0], h, w, self.nd)
        ).astype(feat.dtype)
        x = jnp.concatenate([feat, rep], axis=-1)
        x = Conv2d(self.resize_ch, 1, 1, 0, **kw)(x)
        x = x.reshape(x.shape[0], -1)
        return Dense(1, **kw)(x)


class StageIDiscriminator(nn.Module):
    """``channels``: first entry = stem conv, rest = DownBlocks; input
    resolution = 2**(len(channels) + 2) (each layer is stride 2, ending at
    a 4x4 feature map). Default matches the reference (64px)."""

    tem_size: int = 512
    nd: int = 128
    channels: tuple = (64, 128, 256, 512)
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.conv_in = Conv2d(self.channels[0], 4, 2, 1, **kw)
        self.down_blocks = [DownBlock(f, **kw) for f in self.channels[1:]]
        self.head = _TextImageCriticHead(self.nd, 128, **kw)

    def features(self, img, train: bool = True):
        """Image tower: 64px -> (B, 4, 4, 512)."""
        x = jax.nn.leaky_relu(self.conv_in(img), 0.1)
        for block in self.down_blocks:
            x = block(x, train)
        return x

    def score(self, feat, tem):
        return self.head(feat, tem)

    def __call__(self, img, tem, train: bool = True):
        return self.score(self.features(img, train), tem)


class ResidualBlock(nn.Module):
    """conv3x3+BN -> ReLU -> conv3x3+BN -> ReLU -> conv3x3+BN -> +id -> ReLU
    (reference ``generator_2.py:5-39``)."""

    intermediate: int
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        in_ch = x.shape[-1]

        def conv_bn(feat, h):
            h = Conv2d(feat, 3, 1, 1, use_bias=False, **kw)(h)
            return BatchNorm(param_dtype=self.param_dtype, dtype=self.dtype)(
                h, use_running_average=not train
            )

        identity = x
        x = jax.nn.relu(conv_bn(self.intermediate, x))
        x = jax.nn.relu(conv_bn(self.intermediate, x))
        x = conv_bn(in_ch, x)
        return jax.nn.relu(x + identity)


class StageIIGenerator(nn.Module):
    """Output resolution = input/4 * 2**(len(up_channels) + 1); the
    defaults reproduce the reference 64→256px refinement exactly."""

    num_residual: int = 4
    in_channels: int = 128
    feat_channels: int = 512
    res_channels: int = 320
    up_channels: tuple = (320, 160, 80)
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_64, c_hat, train: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Conv2d(self.in_channels, 4, 2, 1, **kw)(img_64)
        x = jax.nn.leaky_relu(x, 0.1)
        x = DownBlock(self.feat_channels, **kw)(x, train)  # (B, 16, 16, 512)
        rep = jnp.broadcast_to(
            c_hat[:, None, None, :],
            (x.shape[0], x.shape[1], x.shape[2], c_hat.shape[-1]),
        ).astype(x.dtype)
        x = jnp.concatenate([x, rep], axis=-1)  # (B, 16, 16, 640)
        for _ in range(self.num_residual):
            x = ResidualBlock(self.res_channels, **kw)(x, train)
        for feat in self.up_channels:
            x = UpBlock(feat, **kw)(x, train)
        x = ConvTranspose2d(3, 4, 2, 1, **kw)(x)
        return jnp.tanh(x)  # (B, 256, 256, 3)


class StageIIDiscriminator(nn.Module):
    """``channels``: stem conv + DownBlocks; input resolution =
    2**(len(channels) + 2). Default matches the reference (256px)."""

    tem_size: int = 512
    nd: int = 128
    channels: tuple = (16, 32, 64, 128, 256, 512)
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.conv_in = Conv2d(self.channels[0], 4, 2, 1, **kw)
        self.down_blocks = [DownBlock(f, **kw) for f in self.channels[1:]]
        self.head = _TextImageCriticHead(self.nd, 160, **kw)

    def features(self, img, train: bool = True):
        """Image tower: 256px -> (B, 4, 4, 512)."""
        x = jax.nn.leaky_relu(self.conv_in(img), 0.1)
        for block in self.down_blocks:
            x = block(x, train)
        return x

    def score(self, feat, tem):
        return self.head(feat, tem)

    def __call__(self, img, tem, train: bool = True):
        return self.score(self.features(img, train), tem)
