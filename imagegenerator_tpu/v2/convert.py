"""PyTorch checkpoint -> flax pytree converters for VQGAN and CLIP.

The published weights the reference consumes are torch ``.ckpt``/``.pt``
files (taming-transformers VQGAN and OpenAI CLIP); torch (CPU) is
available in this environment for loading them. Layout mapping:

  * conv weights: OIHW -> HWIO (``transpose(2, 3, 1, 0)``)
  * linear weights: (out, in) -> (in, out) (``.T``)
  * CLIP's packed ``in_proj_weight``/``bias`` map onto our fused
    ``in_proj`` Dense.
"""

from __future__ import annotations

import numpy as np

from imagegenerator_tpu.v2.clip import CLIPConfig
from imagegenerator_tpu.v2.vqgan import VQGANConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: _np(v) for k, v in sd.items()}


def _conv(sd, name):
    p = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"])
    return p


def _dense(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}


def _norm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


# ---------------------------------------------------------------- VQGAN
def convert_vqgan_params(sd: dict, config: VQGANConfig) -> dict:
    """taming VQModel state_dict -> our ``VQModel`` params."""

    def resnet(prefix):
        p = {
            "norm1": _norm(sd, f"{prefix}.norm1"),
            "conv1": _conv(sd, f"{prefix}.conv1"),
            "norm2": _norm(sd, f"{prefix}.norm2"),
            "conv2": _conv(sd, f"{prefix}.conv2"),
        }
        if f"{prefix}.nin_shortcut.weight" in sd:
            p["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
        return p

    def attn(prefix):
        return {
            "norm": _norm(sd, f"{prefix}.norm"),
            "q": _conv(sd, f"{prefix}.q"),
            "k": _conv(sd, f"{prefix}.k"),
            "v": _conv(sd, f"{prefix}.v"),
            "proj_out": _conv(sd, f"{prefix}.proj_out"),
        }

    c = config
    enc = {"conv_in": _conv(sd, "encoder.conv_in")}
    cur_res = c.resolution
    for level in range(c.num_resolutions):
        for blk in range(c.num_res_blocks):
            enc[f"down_{level}_block_{blk}"] = resnet(
                f"encoder.down.{level}.block.{blk}"
            )
            if cur_res in c.attn_resolutions:
                enc[f"down_{level}_attn_{blk}"] = attn(
                    f"encoder.down.{level}.attn.{blk}"
                )
        if level != c.num_resolutions - 1:
            enc[f"down_{level}_downsample"] = {
                "conv": _conv(sd, f"encoder.down.{level}.downsample.conv")
            }
            cur_res //= 2
    enc["mid_block_1"] = resnet("encoder.mid.block_1")
    enc["mid_attn_1"] = attn("encoder.mid.attn_1")
    enc["mid_block_2"] = resnet("encoder.mid.block_2")
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_1"] = resnet("decoder.mid.block_1")
    dec["mid_attn_1"] = attn("decoder.mid.attn_1")
    dec["mid_block_2"] = resnet("decoder.mid.block_2")
    cur_res = c.resolution // c.f
    for level in reversed(range(c.num_resolutions)):
        for blk in range(c.num_res_blocks + 1):
            dec[f"up_{level}_block_{blk}"] = resnet(f"decoder.up.{level}.block.{blk}")
            if cur_res in c.attn_resolutions:
                dec[f"up_{level}_attn_{blk}"] = attn(f"decoder.up.{level}.attn.{blk}")
        if level != 0:
            dec[f"up_{level}_upsample"] = {
                "conv": _conv(sd, f"decoder.up.{level}.upsample.conv")
            }
            cur_res *= 2
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "codebook": _np(sd["quantize.embedding.weight"]),
    }


# ---------------------------------------------------------------- CLIP
def _bn(sd, name):
    return {
        "scale": _np(sd[f"{name}.weight"]),
        "bias": _np(sd[f"{name}.bias"]),
        "mean": _np(sd[f"{name}.running_mean"]),
        "var": _np(sd[f"{name}.running_var"]),
    }


def _rn_text_kwargs(sd: dict) -> dict:
    text_width = sd["ln_final.weight"].shape[0]
    text_layers = (
        max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))
        + 1
    )
    return dict(
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        text_width=text_width,
        text_layers=text_layers,
        text_heads=max(1, text_width // 64),
    )


def clip_config_from_state_dict(sd: dict) -> CLIPConfig:
    """Infer the architecture from an OpenAI CLIP state_dict (the same
    derivation clip.build_model does). Handles both ViT and modified-
    ResNet (RN50/RN101) image towers."""
    if not any(k.startswith("visual.transformer.") for k in sd):
        if "visual.attnpool.c_proj.weight" not in sd:
            raise ValueError(
                "unrecognized CLIP state_dict: neither a ViT "
                "(visual.transformer.*) nor a modified-ResNet "
                "(visual.attnpool.*) image tower"
            )
        # modified ResNet: stage depths from visual.layer{L}.{i}.* keys
        layers = tuple(
            max(
                int(k.split(".")[2])
                for k in sd
                if k.startswith(f"visual.layer{stage}.")
            )
            + 1
            for stage in (1, 2, 3, 4)
        )
        vision_width = sd["visual.conv1.weight"].shape[0] * 2  # stem is w/2
        grid = int(round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
        return CLIPConfig(
            embed_dim=sd["visual.attnpool.c_proj.weight"].shape[0],
            image_resolution=grid * 32,
            vision_width=vision_width,
            vision_layers=layers,
            vision_heads=max(1, vision_width * 32 // 64),
            **_rn_text_kwargs(sd),
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = (
        max(
            int(k.split(".")[3])
            for k in sd
            if k.startswith("visual.transformer.resblocks.")
        )
        + 1
    )
    text_width = sd["ln_final.weight"].shape[0]
    text_layers = (
        max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("transformer.resblocks.")
        )
        + 1
    )
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=patch_size * grid,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_heads=max(1, vision_width // 64),
        patch_size=patch_size,
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        text_width=text_width,
        text_layers=text_layers,
        text_heads=max(1, text_width // 64),
    )


def convert_clip_params(sd: dict, config: CLIPConfig) -> dict:
    def block(prefix):
        return {
            "ln_1": _norm(sd, f"{prefix}.ln_1"),
            "in_proj": {
                "kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            },
            "out_proj": _dense(sd, f"{prefix}.attn.out_proj"),
            "ln_2": _norm(sd, f"{prefix}.ln_2"),
            "mlp_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
            "mlp_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
        }

    if config.is_resnet:
        visual = {
            "conv1": _conv(sd, "visual.conv1"),
            "bn1": _bn(sd, "visual.bn1"),
            "conv2": _conv(sd, "visual.conv2"),
            "bn2": _bn(sd, "visual.bn2"),
            "conv3": _conv(sd, "visual.conv3"),
            "bn3": _bn(sd, "visual.bn3"),
            "attnpool": {
                "positional_embedding": _np(
                    sd["visual.attnpool.positional_embedding"]
                ),
                "q_proj": _dense(sd, "visual.attnpool.q_proj"),
                "k_proj": _dense(sd, "visual.attnpool.k_proj"),
                "v_proj": _dense(sd, "visual.attnpool.v_proj"),
                "c_proj": _dense(sd, "visual.attnpool.c_proj"),
            },
        }
        for stage, blocks in enumerate(config.vision_layers):
            for b in range(blocks):
                p = f"visual.layer{stage + 1}.{b}"
                bp = {
                    "conv1": _conv(sd, f"{p}.conv1"),
                    "bn1": _bn(sd, f"{p}.bn1"),
                    "conv2": _conv(sd, f"{p}.conv2"),
                    "bn2": _bn(sd, f"{p}.bn2"),
                    "conv3": _conv(sd, f"{p}.conv3"),
                    "bn3": _bn(sd, f"{p}.bn3"),
                }
                if f"{p}.downsample.0.weight" in sd:
                    bp["downsample_conv"] = _conv(sd, f"{p}.downsample.0")
                    bp["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
                visual[f"layer{stage + 1}_{b}"] = bp
    else:
        visual = {
            "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
            "class_embedding": _np(sd["visual.class_embedding"]),
            "positional_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": _norm(sd, "visual.ln_pre"),
            "ln_post": _norm(sd, "visual.ln_post"),
            "proj": _np(sd["visual.proj"]),
        }
        for i in range(config.vision_layers):
            visual[f"block_{i}"] = block(f"visual.transformer.resblocks.{i}")

    text = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _norm(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(config.text_layers):
        text[f"block_{i}"] = block(f"transformer.resblocks.{i}")

    return {"visual": visual, "text": text}
