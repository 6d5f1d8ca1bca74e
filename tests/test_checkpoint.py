"""Checkpoint/resume roundtrip with the latest + per-epoch layout."""

import jax
import numpy as np

from imagegenerator_tpu.checkpoint import CheckpointManager
from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System


def test_save_restore_roundtrip(tmp_path):
    system = Stage1System(Stage1Config.tiny(n_critic=1))
    state = system.init(jax.random.key(0), 2)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every_epochs=10)
    assert mgr.restore_latest(state) == (None, 0)
    assert mgr.should_save(0) and mgr.should_save(10) and not mgr.should_save(7)

    mgr.save(0, state)
    mgr.save(10, state)

    restored, start_epoch = mgr.restore_latest(jax.tree.map(np.zeros_like, state))
    assert start_epoch == 11
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
