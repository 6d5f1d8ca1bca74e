"""Checkpoint-conversion parity: torch oracles -> converter -> flax.

Builds small torch modules that replicate the taming-transformers VQGAN
and OpenAI CLIP architectures *with their exact state_dict naming*, runs
them on random inputs, converts their weights with ``v2/convert.py``,
and checks our flax models produce the same outputs. This validates both
the converter key/layout mapping and the architectural fidelity of the
flax reimplementations (GroupNorm+swish resnets, asymmetric-pad
downsample, spatial attention, QuickGELU, EOT pooling) without needing
the published multi-GB checkpoints.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from imagegenerator_tpu.v2 import convert
from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel

torch.manual_seed(0)


# --------------------------------------------------------------- VQGAN oracle
def _gn(ch):
    return nn.GroupNorm(min(32, ch), ch, eps=1e-6, affine=True)


class TResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TAttnBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = _gn(ch)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w = torch.bmm(q, k) * (c ** -0.5)
        w = torch.softmax(w, dim=2)
        v = v.reshape(b, c, hh * ww)
        h = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class TDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, 2, 0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, 1, 1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TEncoder(nn.Module):
    def __init__(self, cfg: VQGANConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, cfg.ch, 3, 1, 1)
        self.down = nn.ModuleList()
        cur_res = cfg.resolution
        cin = cfg.ch
        for level, mult in enumerate(cfg.ch_mult):
            stage = nn.Module()
            stage.block = nn.ModuleList()
            stage.attn = nn.ModuleList()
            for _ in range(cfg.num_res_blocks):
                stage.block.append(TResnetBlock(cin, cfg.ch * mult))
                cin = cfg.ch * mult
                if cur_res in cfg.attn_resolutions:
                    stage.attn.append(TAttnBlock(cin))
            if level != cfg.num_resolutions - 1:
                stage.downsample = TDownsample(cin)
                cur_res //= 2
            self.down.append(stage)
        self.mid = nn.Module()
        self.mid.block_1 = TResnetBlock(cin, cin)
        self.mid.attn_1 = TAttnBlock(cin)
        self.mid.block_2 = TResnetBlock(cin, cin)
        self.norm_out = _gn(cin)
        self.conv_out = nn.Conv2d(cin, cfg.z_channels, 3, 1, 1)

    def forward(self, x):
        h = self.conv_in(x)
        cur_res = self.cfg.resolution
        for level, stage in enumerate(self.down):
            for i, blk in enumerate(stage.block):
                h = blk(h)
                if len(stage.attn) > i:
                    h = stage.attn[i](h)
            if hasattr(stage, "downsample"):
                h = stage.downsample(h)
                cur_res //= 2
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(F.silu(self.norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self, cfg: VQGANConfig):
        super().__init__()
        self.cfg = cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        self.conv_in = nn.Conv2d(cfg.z_channels, block_in, 3, 1, 1)
        self.mid = nn.Module()
        self.mid.block_1 = TResnetBlock(block_in, block_in)
        self.mid.attn_1 = TAttnBlock(block_in)
        self.mid.block_2 = TResnetBlock(block_in, block_in)
        self.up = nn.ModuleList([nn.Module() for _ in cfg.ch_mult])
        cur_res = cfg.resolution // cfg.f
        cin = block_in
        for level in reversed(range(cfg.num_resolutions)):
            stage = self.up[level]
            stage.block = nn.ModuleList()
            stage.attn = nn.ModuleList()
            cout = cfg.ch * cfg.ch_mult[level]
            for _ in range(cfg.num_res_blocks + 1):
                stage.block.append(TResnetBlock(cin, cout))
                cin = cout
                if cur_res in cfg.attn_resolutions:
                    stage.attn.append(TAttnBlock(cin))
            if level != 0:
                stage.upsample = TUpsample(cin)
                cur_res *= 2
        self.norm_out = _gn(cin)
        self.conv_out = nn.Conv2d(cin, cfg.out_ch, 3, 1, 1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for level in reversed(range(self.cfg.num_resolutions)):
            stage = self.up[level]
            for i, blk in enumerate(stage.block):
                h = blk(h)
                if len(stage.attn) > i:
                    h = stage.attn[i](h)
            if hasattr(stage, "upsample"):
                h = stage.upsample(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TVQModel(nn.Module):
    def __init__(self, cfg: VQGANConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quant_conv = nn.Conv2d(cfg.z_channels, cfg.embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
        self.quantize = nn.Module()
        self.quantize.embedding = nn.Embedding(cfg.n_embed, cfg.embed_dim)


@pytest.fixture(scope="module")
def vq_pair():
    cfg = VQGANConfig.tiny()
    tmodel = TVQModel(cfg).eval()
    params = convert.convert_vqgan_params(tmodel.state_dict(), cfg)
    return cfg, tmodel, params


def test_vqgan_encoder_parity(vq_pair):
    cfg, tmodel, params = vq_pair
    x = np.random.RandomState(0).randn(2, cfg.resolution, cfg.resolution, 3).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel.quant_conv(
            tmodel.encoder(torch.from_numpy(x).permute(0, 3, 1, 2))
        ).permute(0, 2, 3, 1).numpy()

    model = VQModel(cfg)

    def enc(p, img):
        return model.apply({"params": p}, img, method=lambda m, v: m.quant_conv(m.encoder(v)))

    got = np.asarray(enc(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vqgan_decoder_parity(vq_pair):
    cfg, tmodel, params = vq_pair
    latent = cfg.resolution // cfg.f
    z = np.random.RandomState(1).randn(2, latent, latent, cfg.embed_dim).astype(
        np.float32
    )
    with torch.no_grad():
        want = tmodel.decoder(
            tmodel.post_quant_conv(torch.from_numpy(z).permute(0, 3, 1, 2))
        ).permute(0, 2, 3, 1).numpy()

    model = VQModel(cfg)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(z), method=VQModel.decode)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- CLIP oracle
class TCLIPBlock(nn.Module):
    def __init__(self, width, heads, attn_mask=None):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))
        self.ln_2 = nn.LayerNorm(width)
        self.attn_mask = attn_mask

    def forward(self, x):  # x: (T, B, C)
        h = self.ln_1(x)
        h = self.attn(h, h, h, need_weights=False, attn_mask=self.attn_mask)[0]
        x = x + h
        h = self.ln_2(x)
        h = self.mlp.c_proj(self.mlp.c_fc(h) * torch.sigmoid(1.702 * self.mlp.c_fc(h)))
        return x + h


class TCLIP(nn.Module):
    """Minimal ViT-CLIP with OpenAI state_dict naming."""

    def __init__(self, cfg: CLIPConfig):
        super().__init__()
        self.cfg = cfg
        scale = cfg.vision_width ** -0.5
        self.visual = nn.Module()
        self.visual.conv1 = nn.Conv2d(
            3, cfg.vision_width, cfg.patch_size, cfg.patch_size, bias=False
        )
        n_patches = (cfg.image_resolution // cfg.patch_size) ** 2
        self.visual.class_embedding = nn.Parameter(
            scale * torch.randn(cfg.vision_width)
        )
        self.visual.positional_embedding = nn.Parameter(
            scale * torch.randn(n_patches + 1, cfg.vision_width)
        )
        self.visual.ln_pre = nn.LayerNorm(cfg.vision_width)
        self.visual.transformer = nn.Module()
        self.visual.transformer.resblocks = nn.ModuleList(
            [TCLIPBlock(cfg.vision_width, cfg.vision_heads) for _ in range(cfg.vision_layers)]
        )
        self.visual.ln_post = nn.LayerNorm(cfg.vision_width)
        self.visual.proj = nn.Parameter(
            scale * torch.randn(cfg.vision_width, cfg.embed_dim)
        )

        mask = torch.full((cfg.context_length, cfg.context_length), float("-inf"))
        mask.triu_(1)
        self.token_embedding = nn.Embedding(cfg.vocab_size, cfg.text_width)
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(cfg.context_length, cfg.text_width)
        )
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [TCLIPBlock(cfg.text_width, cfg.text_heads, mask) for _ in range(cfg.text_layers)]
        )
        self.ln_final = nn.LayerNorm(cfg.text_width)
        self.text_projection = nn.Parameter(
            (cfg.text_width ** -0.5) * torch.randn(cfg.text_width, cfg.embed_dim)
        )

    def encode_image(self, x):
        v = self.visual
        x = v.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = v.class_embedding[None, None].expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + v.positional_embedding
        x = v.ln_pre(x).permute(1, 0, 2)
        for blk in v.transformer.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        return v.ln_post(x[:, 0, :]) @ v.proj

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = self.ln_final(x.permute(1, 0, 2))
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection


def _clip_state_dict(t: TCLIP) -> dict:
    """Rename torch MultiheadAttention params to OpenAI CLIP naming."""
    sd = {}
    for k, v in t.state_dict().items():
        k = k.replace(".attn.in_proj_weight", ".attn.in_proj_weight")
        k = k.replace(".attn.out_proj.", ".attn.out_proj.")
        sd[k] = v
    return sd


@pytest.fixture(scope="module")
def clip_pair():
    cfg = CLIPConfig.tiny()
    tmodel = TCLIP(cfg).eval()
    sd = _clip_state_dict(tmodel)
    params = convert.convert_clip_params(sd, cfg)
    return cfg, tmodel, params


def test_clip_image_parity(clip_pair):
    cfg, tmodel, params = clip_pair
    x = np.random.RandomState(2).randn(
        2, cfg.image_resolution, cfg.image_resolution, 3
    ).astype(np.float32)
    with torch.no_grad():
        want = tmodel.encode_image(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    model = CLIP(cfg)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), method=CLIP.encode_image)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_clip_text_parity(clip_pair):
    cfg, tmodel, params = clip_pair
    rng = np.random.RandomState(3)
    toks = rng.randint(1, cfg.vocab_size - 2, (2, cfg.context_length)).astype(np.int64)
    toks[:, -1] = cfg.vocab_size - 1  # EOT = max id
    with torch.no_grad():
        want = tmodel.encode_text(torch.from_numpy(toks)).numpy()
    model = CLIP(cfg)
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(toks.astype(np.int32)),
            method=CLIP.encode_text,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_unrecognized_clip_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        convert.clip_config_from_state_dict(
            {"visual.conv1.weight": np.zeros((64, 3, 7, 7))}
        )


# ------------------------------------------------- modified-ResNet oracle
from collections import OrderedDict  # noqa: E402


class TBottleneck(nn.Module):
    """OpenAI CLIP Bottleneck with exact naming (conv1/bn1/.../downsample)."""

    EXP = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * self.EXP, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.EXP)
        self.stride = stride
        self.downsample = None
        if stride > 1 or inplanes != planes * self.EXP:
            self.downsample = nn.Sequential(
                OrderedDict(
                    [
                        ("-1", nn.AvgPool2d(stride) if stride > 1 else nn.Identity()),
                        ("0", nn.Conv2d(inplanes, planes * self.EXP, 1, bias=False)),
                        ("1", nn.BatchNorm2d(planes * self.EXP)),
                    ]
                )
            )

    def forward(self, x):
        idn = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return F.relu(out + idn)


class TAttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):  # (N, C, H, W)
        N, C, H, W = x.shape
        x = x.reshape(N, C, H * W).permute(0, 2, 1)  # (N, HW, C)
        x = torch.cat([x.mean(dim=1, keepdim=True), x], dim=1)
        x = x + self.positional_embedding[None]
        q = self.q_proj(x[:, :1])
        k = self.k_proj(x)
        v = self.v_proj(x)
        hd = C // self.num_heads
        q = q.reshape(N, 1, self.num_heads, hd).permute(0, 2, 1, 3)
        k = k.reshape(N, -1, self.num_heads, hd).permute(0, 2, 1, 3)
        v = v.reshape(N, -1, self.num_heads, hd).permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, dim=-1)
        ctx = (attn @ v).permute(0, 2, 1, 3).reshape(N, 1, C)
        return self.c_proj(ctx)[:, 0]


class TModifiedResNet(nn.Module):
    """CLIP RN image tower with exact OpenAI naming, mounted at `visual.`"""

    def __init__(self, cfg: CLIPConfig):
        super().__init__()
        w = cfg.vision_width
        self.conv1 = nn.Conv2d(3, w // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(w // 2)
        self.conv2 = nn.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(w // 2)
        self.conv3 = nn.Conv2d(w // 2, w, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(w)
        self.avgpool = nn.AvgPool2d(2)
        inplanes = w
        for stage, blocks in enumerate(cfg.vision_layers):
            planes = w * 2 ** stage
            stride = 1 if stage == 0 else 2
            layer = []
            for b in range(blocks):
                layer.append(
                    TBottleneck(inplanes, planes, stride if b == 0 else 1)
                )
                inplanes = planes * TBottleneck.EXP
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layer))
        self.attnpool = TAttentionPool2d(
            cfg.image_resolution // 32, w * 32, cfg.vision_heads, cfg.embed_dim
        )
        self.cfg = cfg

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for stage in range(len(self.cfg.vision_layers)):
            x = getattr(self, f"layer{stage + 1}")(x)
        return self.attnpool(x)


def _rn_tiny_cfg():
    return CLIPConfig(
        embed_dim=32,
        image_resolution=64,
        vision_width=16,
        vision_layers=(1, 1, 1, 1),
        vision_heads=8,  # (width*32) / 64
        vocab_size=256,
        context_length=16,
        text_width=16,
        text_layers=2,
        text_heads=2,
    )


@pytest.fixture(scope="module")
def rn_pair():
    cfg = _rn_tiny_cfg()
    tvis = TModifiedResNet(cfg)
    # randomize BN running stats so the converter's mean/var mapping is
    # actually exercised (fresh BN has mean 0 / var 1)
    with torch.no_grad():
        for m in tvis.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tvis.eval()
    # mount under `visual.` + borrow a tiny text tower so the full
    # state_dict looks like a real RN checkpoint
    ttext = TCLIP(cfg.__class__.tiny())
    sd = {f"visual.{k}": v for k, v in tvis.state_dict().items()}
    for k, v in _clip_state_dict(ttext).items():
        if not k.startswith("visual."):
            sd[k] = v
    return cfg, tvis, sd


def test_rn_config_inference(rn_pair):
    cfg, _, sd = rn_pair
    inferred = convert.clip_config_from_state_dict(sd)
    assert inferred.is_resnet
    assert tuple(inferred.vision_layers) == (1, 1, 1, 1)
    assert inferred.vision_width == cfg.vision_width
    assert inferred.image_resolution == cfg.image_resolution
    assert inferred.embed_dim == cfg.embed_dim
    assert inferred.vision_heads == cfg.vision_heads


def test_rn_image_parity(rn_pair):
    cfg, tvis, sd = rn_pair
    inferred = convert.clip_config_from_state_dict(sd)
    params = convert.convert_clip_params(sd, inferred)
    x = np.random.RandomState(7).randn(
        2, cfg.image_resolution, cfg.image_resolution, 3
    ).astype(np.float32)
    with torch.no_grad():
        want = tvis(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    model = CLIP(inferred)
    got = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x), method=CLIP.encode_image
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def rn_x_pair():
    """Width/depth-scaled RN shape (asymmetric stage depths, like the
    RN50x4/x16/x64 family) — same oracle, different geometry, so the
    converter's stage indexing is exercised beyond the uniform
    (1,1,1,1) case."""
    cfg = CLIPConfig(
        embed_dim=48,
        image_resolution=96,
        vision_width=16,
        vision_layers=(2, 1, 3, 1),
        vision_heads=8,
        vocab_size=256,
        context_length=16,
        text_width=16,
        text_layers=2,
        text_heads=2,
    )
    tvis = TModifiedResNet(cfg)
    with torch.no_grad():
        for m in tvis.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tvis.eval()
    ttext = TCLIP(cfg.__class__.tiny())
    sd = {f"visual.{k}": v for k, v in tvis.state_dict().items()}
    for k, v in _clip_state_dict(ttext).items():
        if not k.startswith("visual."):
            sd[k] = v
    return cfg, tvis, sd


def test_rn_x_scaled_parity(rn_x_pair):
    cfg, tvis, sd = rn_x_pair
    inferred = convert.clip_config_from_state_dict(sd)
    assert tuple(inferred.vision_layers) == (2, 1, 3, 1)
    assert inferred.image_resolution == 96
    params = convert.convert_clip_params(sd, inferred)
    x = np.random.RandomState(11).randn(
        2, cfg.image_resolution, cfg.image_resolution, 3
    ).astype(np.float32)
    with torch.no_grad():
        want = tvis(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        CLIP(inferred).apply(
            {"params": params}, jnp.asarray(x), method=CLIP.encode_image
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rn_registry_covers_reference_flag_surface():
    """The reference's -m flag accepts every clip.load model name
    (arg_parser.py:33-38); all RN names must resolve to coherent
    configs (checkpoints override these via state_dict inference)."""
    from imagegenerator_tpu.v2.generate import CLIP_CONFIGS

    for name in ("RN50", "RN101", "RN50x4", "RN50x16", "RN50x64"):
        cfg = CLIP_CONFIGS[name]()
        assert cfg.is_resnet
        assert cfg.vision_heads == cfg.vision_width * 32 // 64
        assert cfg.image_resolution % 32 == 0
        assert cfg.embed_dim % cfg.text_heads == 0
