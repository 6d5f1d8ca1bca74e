"""Dry-run of tools/validate_real_weights.py against the synthetic torch
checkpoints the parity tests already build (VERDICT.md round-2 next #9:
the weights-day script must be tested before weights day)."""

import gzip
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))


@pytest.fixture(scope="module")
def synthetic_files(tmp_path_factory):
    import yaml

    from imagegenerator_tpu.v2.clip import CLIPConfig
    from imagegenerator_tpu.v2.vqgan import VQGANConfig
    from tests.test_bert_convert import THFBert
    from tests.test_convert_parity import TCLIP, TVQModel
    from imagegenerator_tpu.models.bert import BertConfig

    tmp = tmp_path_factory.mktemp("weights_day")
    vq_cfg = VQGANConfig.tiny()
    torch.save({"state_dict": TVQModel(vq_cfg).state_dict()}, tmp / "vq.ckpt")
    (tmp / "vq.yaml").write_text(
        yaml.safe_dump(
            {
                "model": {
                    "target": "taming.models.vqgan.VQModel",
                    "params": {
                        "embed_dim": vq_cfg.embed_dim,
                        "n_embed": vq_cfg.n_embed,
                        "ddconfig": {
                            "z_channels": vq_cfg.z_channels,
                            "resolution": vq_cfg.resolution,
                            "in_channels": 3,
                            "out_ch": 3,
                            "ch": vq_cfg.ch,
                            "ch_mult": list(vq_cfg.ch_mult),
                            "num_res_blocks": vq_cfg.num_res_blocks,
                            "attn_resolutions": list(vq_cfg.attn_resolutions),
                            "dropout": 0.0,
                        },
                    },
                }
            }
        )
    )
    clip_cfg = CLIPConfig.tiny()
    torch.save(TCLIP(clip_cfg).state_dict(), tmp / "clip.pt")
    torch.save(THFBert(BertConfig.tiny()).state_dict(), tmp / "bert.bin")
    # minimal BPE merges file (standard format)
    merges = ["#version: 0.2", "a </w>", "c a", "ca t</w>"]
    merges += [f"q{'x' * (i % 3)} z" for i in range(49152 - 256 - 2 - 3)]
    with gzip.open(tmp / "bpe.txt.gz", "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    return tmp


def test_weights_day_dry_run(synthetic_files, tmp_path):
    from validate_real_weights import main

    out = tmp_path / "out"
    main(
        [
            "--vqgan_config", str(synthetic_files / "vq.yaml"),
            "--vqgan_checkpoint", str(synthetic_files / "vq.ckpt"),
            "--clip_checkpoint", str(synthetic_files / "clip.pt"),
            "--bert_checkpoint", str(synthetic_files / "bert.bin"),
            "--bpe_vocab", str(synthetic_files / "bpe.txt.gz"),
            "--iterations", "2",
            "--out", str(out),
        ]
    )
    assert (out / "vqgan_roundtrip.npz").exists()
    assert (out / "clip_embeds.npz").exists()
    assert (out / "bert_cls.npz").exists()
    assert (out / "weights_day_sample.png").exists()
    assert (out / "MANIFEST.json").exists()
    import json

    manifest = json.loads((out / "MANIFEST.json").read_text())
    assert manifest["validated"] == [
        "vqgan", "clip", "bert", "generation", "eval",
    ]


def test_weights_day_requires_some_input():
    from validate_real_weights import main

    with pytest.raises(SystemExit):
        main(["--out", "/tmp/nowhere"])
