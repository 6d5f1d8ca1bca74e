"""Sampling CLI (train/sample.py): restore a checkpoint, generate PNGs
with the caption in a 'comment' text chunk — the v1 inference surface
(the reference's only sampler is the in-training TensorBoard grid,
stage_2_train_fn.py:181-208)."""

import jax
import numpy as np
from PIL import Image

from imagegenerator_tpu.checkpoint import CheckpointManager
from imagegenerator_tpu.train import sample
from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System
from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System


def _save_ckpt(tmp_path, stage):
    if stage == 1:
        system = Stage1System(Stage1Config.tiny())
    else:
        system = Stage2System(Stage2Config.tiny())
    state = system.init(jax.random.key(0), 2)
    mgr = CheckpointManager(f"{tmp_path}/ck/Stage{stage}", save_every_epochs=1)
    mgr.save(0, state)
    mgr.wait()
    return system


def test_sample_cli_stage1(tmp_path):
    _save_ckpt(tmp_path, 1)
    out = tmp_path / "out1"
    sample.main([
        "--stage", "1", "--tiny",
        "--checkpoint_dir", f"{tmp_path}/ck",
        "--caption", "a red bus|a snowy street",
        "-n", "2", "-o", str(out), "--seed", "3",
    ])
    files = sorted(p.name for p in out.iterdir())
    assert files == [
        "sample_0_0.png", "sample_0_1.png", "sample_1_0.png", "sample_1_1.png"
    ]
    img = Image.open(out / "sample_1_0.png")
    res = Stage1Config.tiny().resolution
    assert img.size == (res, res) and img.mode == "RGB"
    assert img.text["comment"] == "a snowy street"
    # different captions/noise -> different pixels
    a = np.asarray(Image.open(out / "sample_0_0.png"))
    b = np.asarray(Image.open(out / "sample_0_1.png"))
    assert not np.array_equal(a, b)


def test_sample_cli_stage2(tmp_path):
    _save_ckpt(tmp_path, 2)
    out = tmp_path / "out2"
    sample.main([
        "--stage", "2", "--tiny",
        "--checkpoint_dir", f"{tmp_path}/ck",
        "--caption", "a dog on a beach",
        "-o", str(out),
    ])
    img = Image.open(out / "sample_0_0.png")
    res = Stage2Config.tiny().resolution
    assert img.size == (res, res)
    assert img.text["comment"] == "a dog on a beach"


def test_sample_cli_no_checkpoint(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="no checkpoint"):
        sample.main([
            "--stage", "1", "--tiny",
            "--checkpoint_dir", f"{tmp_path}/empty",
            "--caption", "x", "-o", str(tmp_path / "o"),
        ])
