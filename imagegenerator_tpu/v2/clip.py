"""CLIP (ViT image tower + causal text transformer) in flax, NHWC.

The reference loads OpenAI CLIP via ``clip.load(args.clip_model)``
(``/root/reference/v2_implementation/generate.py:74-78``) and uses only
``encode_image`` / ``encode_text`` / ``visual.input_resolution``. This is
a from-scratch flax implementation of that architecture family
(ViT-B/32, ViT-B/16, ViT-L/14 image towers + the matching text towers):

  * visual: stride-``patch`` conv embed (no bias) -> prepend class token
    -> learned positional embedding -> pre-LN transformer with QuickGELU
    MLPs -> ln_post on the class token -> projection to embed_dim.
  * text: token embedding (vocab 49408) -> positional embedding ->
    causally-masked transformer -> ln_final -> features at the EOT token
    (argmax of token ids) -> text projection.

Weights convert from an OpenAI CLIP torch state_dict via
``convert.convert_clip_params``. Tests run small random configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision: ``vision_layers`` int = ViT depth; tuple = ModifiedResNet
    # stage depths (the same convention as OpenAI's build_model)
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: Any = 12
    vision_heads: int = 12
    patch_size: int = 32
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, (tuple, list))

    @classmethod
    def vit_b32(cls) -> "CLIPConfig":
        return cls()

    @classmethod
    def vit_b16(cls) -> "CLIPConfig":
        return cls(patch_size=16)

    @classmethod
    def rn50(cls) -> "CLIPConfig":
        return cls(
            embed_dim=1024,
            vision_width=64,
            vision_layers=(3, 4, 6, 3),
            vision_heads=32,  # width * 32 // 64
        )

    @classmethod
    def rn101(cls) -> "CLIPConfig":
        return cls(
            embed_dim=512,
            vision_width=64,
            vision_layers=(3, 4, 23, 3),
            vision_heads=32,
        )

    @classmethod
    def rn50x4(cls) -> "CLIPConfig":
        # EfficientNet-style compound scaling of RN50 (published OpenAI
        # configs; the converter re-derives all of this from a real
        # checkpoint's shapes, these defaults only serve random-init runs)
        return cls(
            embed_dim=640,
            image_resolution=288,
            vision_width=80,
            vision_layers=(4, 6, 10, 6),
            vision_heads=40,  # width * 32 // 64
            text_width=640,
            text_heads=10,
        )

    @classmethod
    def rn50x16(cls) -> "CLIPConfig":
        return cls(
            embed_dim=768,
            image_resolution=384,
            vision_width=96,
            vision_layers=(6, 8, 18, 8),
            vision_heads=48,
            text_width=768,
            text_heads=12,
        )

    @classmethod
    def rn50x64(cls) -> "CLIPConfig":
        return cls(
            embed_dim=1024,
            image_resolution=448,
            vision_width=128,
            vision_layers=(3, 15, 36, 10),
            vision_heads=64,
            text_width=1024,
            text_heads=16,
        )

    @classmethod
    def vit_l14(cls) -> "CLIPConfig":
        return cls(
            embed_dim=768,
            vision_width=1024,
            vision_layers=24,
            vision_heads=16,
            patch_size=14,
            text_width=768,
            text_layers=12,
            text_heads=12,
        )

    @classmethod
    def vit_l14_336(cls) -> "CLIPConfig":
        # clip.load("ViT-L/14@336px"): the L/14 tower fine-tuned at 336px
        # (24x24 patch grid); checkpoints override via state_dict inference
        return dataclasses.replace(cls.vit_l14(), image_resolution=336)

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        return cls(
            embed_dim=16,
            image_resolution=32,
            vision_width=16,
            vision_layers=2,
            vision_heads=2,
            patch_size=8,
            vocab_size=256,
            context_length=16,
            text_width=16,
            text_layers=2,
            text_heads=2,
        )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Block(nn.Module):
    """Pre-LN residual attention block with QuickGELU MLP."""

    width: int
    heads: int
    causal: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hd = self.width // self.heads

        h = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.heads, hd)
        k = k.reshape(B, T, self.heads, hd)
        v = v.reshape(B, T, self.heads, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        if self.causal:
            mask = jnp.tril(jnp.ones((T, T), bool))
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, C)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(ctx)

        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x


class _PatchEmbed(nn.Module):
    """Patch embedding as reshape + one GEMM instead of a strided conv.

    Mathematically identical (stride == kernel == patch, VALID padding,
    same HWIO kernel param so checkpoints convert unchanged), but the
    BACKWARD of the conv formulation lowers to an input-dilated conv
    that ran HBM-bound at 0.36 TF/s and ate 47% of the whole v2
    latent-opt step (profiled, benchmarks/PROFILE_v2_r02.md); as a GEMM
    transpose it rides the MXU."""

    width: int
    patch: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, images):
        p = self.patch
        B, H, W, C = images.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, C, self.width)
        )
        dtype = self.dtype or images.dtype
        # cast BEFORE the patch reorganization (half the HBM bytes,
        # benchmarks/PROFILE_v2_r03.md), then hand the (py, px, c)
        # contraction straight to dot_general instead of materializing
        # an explicit 6-D transpose: the strided patch gather moves
        # 96-byte rows, which as a standalone HBM transpose ran at
        # ~0.26 ms/iter in the v2 step; folded into the dot's operand
        # reads it measured ~1% whole-step faster
        # (benchmarks/PROFILE_v2_r04.md).
        x = images.astype(dtype).reshape(B, H // p, p, W // p, p, C)
        out = jax.lax.dot_general(
            x, kernel.astype(dtype),
            dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
            preferred_element_type=dtype,
        )  # (B, H//p, W//p, width)
        return out.reshape(B, (H // p) * (W // p), self.width)


class VisionTransformer(nn.Module):
    config: CLIPConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, images):
        """images: (B, R, R, 3), CLIP-normalized. Returns (B, embed_dim)."""
        c = self.config
        scale = c.vision_width ** -0.5
        x = _PatchEmbed(
            c.vision_width, c.patch_size, dtype=self.dtype, name="conv1"
        )(images)
        B = x.shape[0]
        cls_emb = self.param(
            "class_embedding",
            lambda k, s: scale * jax.random.normal(k, s),
            (c.vision_width,),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_emb, (B, 1, c.vision_width)).astype(x.dtype), x],
            axis=1,
        )
        pos = self.param(
            "positional_embedding",
            lambda k, s: scale * jax.random.normal(k, s),
            (x.shape[1], c.vision_width),
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = _Block(
                c.vision_width, c.vision_heads, dtype=self.dtype, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            lambda k, s: scale * jax.random.normal(k, s),
            (c.vision_width, c.embed_dim),
        )
        return jnp.dot(x, proj.astype(x.dtype), preferred_element_type=x.dtype)


class _FrozenBN(nn.Module):
    """Eval-mode BatchNorm as a frozen affine over running statistics
    (torch eps 1e-5). CLIP is always a frozen perceptor in this framework
    (reference generate.py:74-76 freezes it), so there is no train-mode
    BN state to carry."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = self.param("mean", nn.initializers.zeros, (f,))
        var = self.param("var", nn.initializers.ones, (f,))
        inv = (scale / jnp.sqrt(var + 1e-5)).astype(x.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + 1e-5)).astype(x.dtype)


class _Bottleneck(nn.Module):
    """CLIP's modified ResNet bottleneck: stride-2 happens via an
    AvgPool AFTER conv2 (anti-aliased downsampling), and the shortcut
    downsample is AvgPool -> 1x1 conv -> BN."""

    planes: int
    stride: int = 1
    dtype: Dtype = None
    EXPANSION = 4

    @nn.compact
    def __call__(self, x):
        kw = dict(use_bias=False, dtype=self.dtype)
        out_ch = self.planes * self.EXPANSION

        h = nn.Conv(self.planes, (1, 1), name="conv1", **kw)(x)
        h = jax.nn.relu(_FrozenBN(self.dtype, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, name="conv2", **kw)(h)
        h = jax.nn.relu(_FrozenBN(self.dtype, name="bn2")(h))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride,) * 2, strides=(self.stride,) * 2)
        h = nn.Conv(out_ch, (1, 1), name="conv3", **kw)(h)
        h = _FrozenBN(self.dtype, name="bn3")(h)

        if self.stride > 1 or x.shape[-1] != out_ch:
            idn = (
                nn.avg_pool(x, (self.stride,) * 2, strides=(self.stride,) * 2)
                if self.stride > 1
                else x
            )
            idn = nn.Conv(out_ch, (1, 1), name="downsample_conv", **kw)(idn)
            idn = _FrozenBN(self.dtype, name="downsample_bn")(idn)
        else:
            idn = x
        return jax.nn.relu(h + idn)


class _AttentionPool2d(nn.Module):
    """CLIP's attention pooling head: tokens = flattened feature map with
    a mean token prepended + learned positional embedding; one multi-head
    attention with the mean token as the only query; c_proj to embed_dim."""

    embed_dim: int
    heads: int
    output_dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda k, s: jax.random.normal(k, s) / np.sqrt(self.embed_dim),
            (H * W + 1, C),
        )
        x = x + pos.astype(x.dtype)
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)
        hd = self.embed_dim // self.heads
        q = q.reshape(B, 1, self.heads, hd)
        k = k.reshape(B, -1, self.heads, hd)
        v = v.reshape(B, -1, self.heads, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, self.embed_dim)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(ctx)
        return out[:, 0, :]


class ModifiedResNet(nn.Module):
    """CLIP's RN image tower (RN50/RN101): 3-conv anti-aliased stem with
    an avg-pool, 4 bottleneck stages, attention-pool head. Supports the
    reference's ``clip.load('RN50'/'RN101')`` path (generate.py:74-75,
    ``-m`` flag arg_parser.py:33-38) that round 1 rejected."""

    config: CLIPConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, images):
        c = self.config
        w = c.vision_width
        kw = dict(use_bias=False, dtype=self.dtype)

        x = nn.Conv(w // 2, (3, 3), strides=2, padding=1, name="conv1", **kw)(images)
        x = jax.nn.relu(_FrozenBN(self.dtype, name="bn1")(x))
        x = nn.Conv(w // 2, (3, 3), padding=1, name="conv2", **kw)(x)
        x = jax.nn.relu(_FrozenBN(self.dtype, name="bn2")(x))
        x = nn.Conv(w, (3, 3), padding=1, name="conv3", **kw)(x)
        x = jax.nn.relu(_FrozenBN(self.dtype, name="bn3")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        for stage, blocks in enumerate(c.vision_layers):
            planes = w * 2 ** stage
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = _Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)

        return _AttentionPool2d(
            embed_dim=w * 32,
            heads=c.vision_heads,
            output_dim=c.embed_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x)


class TextTransformer(nn.Module):
    config: CLIPConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, context_length) int32. Returns (B, embed_dim);
        features taken at the EOT position (= per-row argmax of ids)."""
        c = self.config
        x = nn.Embed(c.vocab_size, c.text_width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            lambda k, s: 0.01 * jax.random.normal(k, s),
            (c.context_length, c.text_width),
        )
        x = x + pos[: x.shape[1]].astype(x.dtype)
        for i in range(c.text_layers):
            x = _Block(
                c.text_width, c.text_heads, causal=True, dtype=self.dtype,
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
        proj = self.param(
            "text_projection",
            lambda k, s: (c.text_width ** -0.5) * jax.random.normal(k, s),
            (c.text_width, c.embed_dim),
        )
        return jnp.dot(x, proj.astype(x.dtype), preferred_element_type=x.dtype)


class CLIP(nn.Module):
    config: CLIPConfig
    dtype: Dtype = None

    def setup(self):
        if self.config.is_resnet:
            self.visual = ModifiedResNet(self.config, self.dtype)
        else:
            self.visual = VisionTransformer(self.config, self.dtype)
        self.text = TextTransformer(self.config, self.dtype)

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)


# CLIP image normalization constants (reference generate.py:117-119).
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def normalize_image(x):
    """[0,1] NHWC -> CLIP-normalized."""
    return (x - IMAGE_MEAN) / IMAGE_STD
