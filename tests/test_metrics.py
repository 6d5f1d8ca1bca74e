"""Metrics utilities: image grid assembly and writer output."""

import numpy as np

from imagegenerator_tpu.utils.metrics import MetricsWriter, image_grid


def test_image_grid_layout():
    imgs = np.random.default_rng(0).uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
    grid = image_grid(imgs, nrow=4, pad=2)
    # 2 rows x 4 cols of 8px tiles with 2px padding
    assert grid.shape == (2 * 10 + 2, 4 * 10 + 2, 3)
    assert grid.min() >= 0.0 and grid.max() <= 1.0


def test_writer_console_only(capsys, tmp_path):
    w = MetricsWriter(logdir=None)
    w.scalars(3, {"loss": 1.25})
    out = capsys.readouterr().out
    assert "step 3" in out and "loss: 1.2500" in out
    w.images(3, "x", np.zeros((2, 4, 4, 3)))  # no-op without TB
    w.close()


def test_writer_tensorboard(tmp_path):
    w = MetricsWriter(logdir=str(tmp_path / "tb"))
    w.scalars(0, {"a": 1.0})
    w.images(0, "imgs", np.zeros((2, 4, 4, 3), np.float32))
    w.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files, "tensorboard event file not written"
