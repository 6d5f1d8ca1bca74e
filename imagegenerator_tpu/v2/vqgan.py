"""VQGAN (taming-transformers ``VQModel``) in flax, NHWC.

The reference loads this model from the vendored taming-transformers
package (``/root/reference/v2_implementation/load_vqgan.py:5-14``); the
published ``vqgan_imagenet_f16_16384`` checkpoint defines the
architecture reimplemented here:

  * Encoder/Decoder: conv_in -> per-resolution ResnetBlocks (GroupNorm32
    + swish + 3x3 convs, 1x1 nin shortcut on channel change) with
    spatial self-attention at ``attn_resolutions``; strided-conv
    downsample with (0,1) asymmetric pad / nearest-2x + conv upsample;
    mid = Resnet-Attn-Resnet; GroupNorm + swish + conv_out.
  * quant_conv / post_quant_conv 1x1 projections around a codebook
    ``VectorQuantizer`` (n_e x e_dim, straight-through).

TPU-first details: NHWC layout throughout; the attention block flattens
HxW into one sequence axis and runs a single QK^T/AV matmul pair on the
MXU; the quantizer distance computation is one big (B*H*W, e_dim) x
(e_dim, n_e) matmul (see ``ops/quantize.py``).

``config_from_yaml_dict`` accepts the taming yaml's ``model.params``
dict so the reference's ``-conf`` files work unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagegenerator_tpu.ops.quantize import nearest_codebook_indices, vector_quantize

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VQGANConfig:
    embed_dim: int = 256
    n_embed: int = 16384
    # ddconfig
    z_channels: int = 256
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def f(self) -> int:
        """Spatial downsampling factor: 2^(num_resolutions-1)
        (reference generate.py:81)."""
        return 2 ** (self.num_resolutions - 1)

    @classmethod
    def tiny(cls) -> "VQGANConfig":
        return cls(
            embed_dim=8,
            n_embed=32,
            z_channels=8,
            resolution=32,
            ch=8,
            ch_mult=(1, 2),
            num_res_blocks=1,
            attn_resolutions=(16,),
        )

    @classmethod
    def imagenet_f16_16384(cls) -> "VQGANConfig":
        return cls()


def config_from_yaml_dict(params: dict) -> VQGANConfig:
    """Build a config from a taming yaml's ``model.params`` mapping."""
    dd = params["ddconfig"]
    return VQGANConfig(
        embed_dim=params["embed_dim"],
        n_embed=params["n_embed"],
        z_channels=dd["z_channels"],
        resolution=dd["resolution"],
        in_channels=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        ch=dd["ch"],
        ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"],
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        dropout=dd.get("dropout", 0.0),
    )


def _group_norm(x, name):
    # taming uses GroupNorm(32); real configs always have >=128 channels.
    # min() keeps tiny test configs valid without changing full-size nets.
    groups = min(32, x.shape[-1])
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name)(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        h = _group_norm(x, "norm1")
        h = jax.nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _group_norm(h, "norm2")
        h = jax.nn.swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _group_norm(x, "norm")
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        attn = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (C ** -0.5), axis=-1).astype(v.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        # taming pads (0, 1) on H and W then conv stride 2 (no padding)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=2, padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VQGANConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.Conv(c.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        cur_res = c.resolution
        for level, mult in enumerate(c.ch_mult):
            for blk in range(c.num_res_blocks):
                h = ResnetBlock(
                    c.ch * mult, self.dtype, name=f"down_{level}_block_{blk}"
                )(h)
                if cur_res in c.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"down_{level}_attn_{blk}")(h)
            if level != c.num_resolutions - 1:
                h = Downsample(self.dtype, name=f"down_{level}_downsample")(h)
                cur_res //= 2
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = _group_norm(h, "norm_out")
        h = jax.nn.swish(h)
        return nn.Conv(
            c.z_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class Decoder(nn.Module):
    config: VQGANConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, z):
        c = self.config
        block_in = c.ch * c.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        cur_res = c.resolution // c.f
        for level in reversed(range(c.num_resolutions)):
            out_ch = c.ch * c.ch_mult[level]
            for blk in range(c.num_res_blocks + 1):
                h = ResnetBlock(out_ch, self.dtype, name=f"up_{level}_block_{blk}")(h)
                if cur_res in c.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_{level}_attn_{blk}")(h)
            if level != 0:
                h = Upsample(self.dtype, name=f"up_{level}_upsample")(h)
                cur_res *= 2
        h = _group_norm(h, "norm_out")
        h = jax.nn.swish(h)
        return nn.Conv(
            c.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class VQModel(nn.Module):
    """encode: image -> (quantized z, indices); decode: z -> image.

    Images are NHWC in [-1, 1]; latents are NHWC with C = embed_dim.
    """

    config: VQGANConfig
    dtype: Dtype = None

    def setup(self):
        c = self.config
        self.encoder = Encoder(c, self.dtype)
        self.decoder = Decoder(c, self.dtype)
        self.quant_conv = nn.Conv(c.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(c.z_channels, (1, 1), dtype=self.dtype)
        self.codebook = self.param(
            "codebook",
            # taming init: U(-1/n_e, 1/n_e)
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / c.n_embed, 1.0 / c.n_embed
            ),
            (c.n_embed, c.embed_dim),
        )

    def encode(self, x):
        h = self.quant_conv(self.encoder(x))
        z_q = vector_quantize(h, self.codebook)
        indices = nearest_codebook_indices(h, self.codebook)
        return z_q, indices

    def decode(self, z_q):
        return self.decoder(self.post_quant_conv(z_q))

    def quantize(self, z):
        return vector_quantize(z, self.codebook)

    def __call__(self, x):
        z_q, _ = self.encode(x)
        return self.decode(z_q)
