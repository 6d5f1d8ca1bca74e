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


def test_sample_cli_ema(tmp_path):
    """--ema samples from the checkpoint's EMA side tree; the same
    checkpoint without --ema falls back to the live weights (and the
    two differ when the trees differ)."""
    import pytest

    from imagegenerator_tpu.train import ema as ema_lib

    system = Stage1System(Stage1Config.tiny())
    state = system.init(jax.random.key(0), 2)
    # a visibly different average: EMA of freshly-reinitialized params
    other = system.init(jax.random.key(9), 2)
    ema_tree = ema_lib.init_ema(other.params, ema_lib.STAGE1_MODULES)
    mgr = CheckpointManager(f"{tmp_path}/ck/Stage1", save_every_epochs=1)
    mgr.save_with_aux(0, state, {"ema": ema_tree})
    mgr.wait()

    base = [
        "--stage", "1", "--tiny",
        "--checkpoint_dir", f"{tmp_path}/ck",
        "--caption", "a red bus", "--seed", "3",
    ]
    sample.main(base + ["-o", str(tmp_path / "live")])
    sample.main(base + ["-o", str(tmp_path / "avg"), "--ema"])
    live = np.asarray(Image.open(tmp_path / "live" / "sample_0_0.png"))
    avg = np.asarray(Image.open(tmp_path / "avg" / "sample_0_0.png"))
    assert live.shape == avg.shape
    assert not np.array_equal(live, avg)

    # --ema against a plain (no-aux) checkpoint names the problem
    _save_ckpt(tmp_path / "plain", 1)
    with pytest.raises(SystemExit, match="no EMA"):
        sample.main([
            "--stage", "1", "--tiny",
            "--checkpoint_dir", f"{tmp_path}/plain/ck",
            "--caption", "x", "-o", str(tmp_path / "o"), "--ema",
        ])


def test_sample_cli_no_checkpoint(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="no checkpoint"):
        sample.main([
            "--stage", "1", "--tiny",
            "--checkpoint_dir", f"{tmp_path}/empty",
            "--caption", "x", "-o", str(tmp_path / "o"),
        ])
