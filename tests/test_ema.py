"""EMA generator averages (train/ema.py): update math, trainer
checkpoint round-trip in the {"state", "aux"} layout, the pre-EMA
upgrade path, and the sampling CLI's --ema surface. The reference has
no EMA; its sampling surfaces read live training weights
(/root/reference/stage_2_train_fn.py:181-208)."""

import jax
import numpy as np
import pytest

from imagegenerator_tpu.data import CocoCaptions, DataLoader, HashTokenizer, open_store
from imagegenerator_tpu.train import ema as ema_lib
from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System
from imagegenerator_tpu.train.trainer import Stage1Trainer, TrainerOptions
from tests.test_trainer import _setup_dataset


def test_ema_update_closed_form():
    rng = np.random.default_rng(0)
    decay = 0.9
    ema = {"generator": {"w": rng.standard_normal(7).astype(np.float32)}}
    expect = ema["generator"]["w"].copy()
    update = ema_lib.make_ema_update(decay)
    for k in range(4):
        p = rng.standard_normal(7).astype(np.float32)
        ema = update(ema, {"generator": {"w": p}})
        expect = expect * decay + p * (1 - decay)
    np.testing.assert_allclose(
        np.asarray(ema["generator"]["w"]), expect, rtol=1e-6
    )


def test_init_and_swap():
    params = {"generator": {"w": np.ones(3)}, "critic": {"w": np.zeros(3)}}
    ema = ema_lib.init_ema(params, ("generator",))
    assert set(ema) == {"generator"}
    tracked = ema_lib.tracked(params, ema)
    assert set(tracked) == {"generator"}


def _make_trainer(tmp_path, store_name, ema_decay, batch_size=2, n_images=4):
    store = open_store(f"mem://{store_name}")
    _setup_dataset(store, n_images=n_images)
    cfg = Stage1Config.tiny(n_critic=1)
    system = Stage1System(cfg)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    loader = DataLoader(ds, tok, batch_size=batch_size, num_workers=2)
    options = TrainerOptions(
        num_epochs=1,
        save_every_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        seed=7,
        ema_decay=ema_decay,
    )
    return Stage1Trainer(system, loader, options), system


def test_trainer_ema_checkpoint_roundtrip(tmp_path):
    trainer, system = _make_trainer(tmp_path, "ema-rt", 0.5)
    state, start = trainer.init_state(batch_size=2)
    state = trainer.fit(state, start)
    assert trainer.ema is not None
    # the average lags the live weights after training steps
    live = np.asarray(jax.tree.leaves(state.params["generator"])[0])
    avg = np.asarray(jax.tree.leaves(trainer.ema["generator"])[0])
    assert not np.allclose(live, avg)

    # fresh trainer restores BOTH trees from the composite layout
    trainer2, _ = _make_trainer(tmp_path, "ema-rt2", 0.5)
    state2, start2 = trainer2.init_state(batch_size=2)
    assert start2 == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer2.ema["generator"])[0]), avg
    )

    # a NON-ema trainer (e.g. stage-2 loading an EMA stage-1 run, or a
    # user who dropped the flag) restores the live state transparently:
    # restore_latest detects the composite layout from metadata
    trainer3, _ = _make_trainer(tmp_path, "ema-rt3", None)
    state3, start3 = trainer3.init_state(batch_size=2)
    assert start3 == 1 and trainer3.ema is None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state3.params["generator"])[0]), live
    )


def test_trainer_ema_under_mesh(tmp_path):
    # replicated-DP mesh trainer path: the EMA update consumes
    # mesh-sharded params and must stay numerically a plain average
    import jax as _jax

    trainer, _ = _make_trainer(
        tmp_path, "ema-mesh", 0.5, batch_size=8, n_images=16
    )
    devices = np.array(_jax.devices()[:8]).reshape(8)
    mesh = _jax.sharding.Mesh(devices, ("data",))
    trainer.mesh = mesh
    from imagegenerator_tpu.train import stage1 as s1

    trainer.step_fn = s1.make_train_step(trainer.system, mesh=mesh)
    state, start = trainer.init_state(batch_size=8)
    before = np.asarray(jax.tree.leaves(trainer.ema["generator"])[0]).copy()
    state = trainer.fit(state, start)
    after = np.asarray(jax.tree.leaves(trainer.ema["generator"])[0])
    live = np.asarray(jax.tree.leaves(state.params["generator"])[0])
    assert not np.array_equal(before, after)  # the average moved
    assert np.isfinite(after).all()
    # decay 0.5 over 2 steps: average strictly between init and live
    assert not np.allclose(after, live)


def test_stage2_trainer_ema(tmp_path):
    # stage-2 averages the TRAINED generator-side modules (CA2 + G2);
    # a wrong module name would KeyError at init_ema
    from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System
    from imagegenerator_tpu.train.trainer import Stage2Trainer

    store = open_store("mem://ema-s2")
    _setup_dataset(store)
    cfg = Stage2Config.tiny(n_critic=1)
    system = Stage2System(cfg)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    loader = DataLoader(ds, tok, batch_size=2, num_workers=2)
    options = TrainerOptions(
        num_epochs=1, save_every_epochs=1, sample_every_steps=0,
        checkpoint_dir=str(tmp_path / "ck2"), seed=7, ema_decay=0.5,
    )
    trainer = Stage2Trainer(system, loader, options)
    state, start = trainer.init_state(batch_size=2)
    state = trainer.fit(state, start)
    assert set(trainer.ema) == {"con_augment_2", "generator"}
    avg = np.asarray(jax.tree.leaves(trainer.ema["generator"])[0])
    live = np.asarray(jax.tree.leaves(state.params["generator"])[0])
    assert np.isfinite(avg).all() and not np.allclose(avg, live)


def test_plain_checkpoint_upgrades_to_ema(tmp_path):
    # train WITHOUT ema, then resume WITH: the average seeds from the
    # restored params (restore_latest_with_aux returns aux=None)
    trainer, _ = _make_trainer(tmp_path, "ema-up", None)
    state, start = trainer.init_state(batch_size=2)
    trainer.fit(state, start)

    trainer2, _ = _make_trainer(tmp_path, "ema-up2", 0.9)
    state2, start2 = trainer2.init_state(batch_size=2)
    assert start2 == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer2.ema["generator"])[0]),
        np.asarray(jax.tree.leaves(state2.params["generator"])[0]),
    )
