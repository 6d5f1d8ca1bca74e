"""End-to-end integration: full stage-1 training epoch via the CLI path
on synthetic in-memory data (SURVEY.md §4 'integration tests: 1-step
train on synthetic data with a fake in-memory bucket')."""

import io
import json

import numpy as np
import pytest
from PIL import Image

from imagegenerator_tpu.data import CocoCaptions, DataLoader, HashTokenizer, open_store
from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System
from imagegenerator_tpu.train.trainer import Stage1Trainer, TrainerOptions


def _setup_dataset(store, n_images=4):
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n_images):
        name = f"img{i}.png"
        buf = io.BytesIO()
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(buf, format="PNG")
        store.write_bytes(f"imgs/{name}", buf.getvalue())
        images.append({"id": i, "file_name": name})
        annotations.append({"image_id": i, "caption": f"synthetic caption {i}"})
    store.write_text(
        "ann/captions.json", json.dumps({"images": images, "annotations": annotations})
    )


def test_stage1_trainer_epoch(tmp_path):
    store = open_store("mem://trainer-test")
    _setup_dataset(store)

    cfg = Stage1Config.tiny(n_critic=1)
    system = Stage1System(cfg)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    loader = DataLoader(ds, tok, batch_size=2, num_workers=2)

    options = TrainerOptions(
        num_epochs=1,
        save_every_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        seed=7,
    )
    trainer = Stage1Trainer(system, loader, options)
    state, start_epoch = trainer.init_state(batch_size=2)
    assert start_epoch == 0
    state = trainer.fit(state, start_epoch)
    assert int(state.step) == 2  # 4 samples / batch 2

    # resume path: a fresh trainer restores epoch 0's checkpoint
    trainer2 = Stage1Trainer(system, loader, options)
    _, start2 = trainer2.init_state(batch_size=2)
    assert start2 == 1


def test_stage2_trainer_mesh_epoch_with_sampling(tmp_path):
    """Stage-2 trainer under the 8-device CPU mesh, with the image-grid
    sampling path exercised on mesh-sharded batches (round-1 gap:
    system.sample on a sharded batch was never tested under a mesh —
    VERDICT.md 'What's weak' #8)."""
    import jax
    import numpy as np

    from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System
    from imagegenerator_tpu.train.trainer import Stage2Trainer

    store = open_store("mem://trainer2-mesh-test")
    _setup_dataset(store, n_images=16)

    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = jax.sharding.Mesh(devices, ("data",))

    cfg = Stage2Config.tiny(n_critic=1)
    system = Stage2System(cfg)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    loader = DataLoader(ds, tok, batch_size=8, num_workers=2, mesh=mesh)

    options = TrainerOptions(
        num_epochs=1,
        save_every_epochs=1,
        sample_every_steps=1,  # fires at gstep 1 (second batch)
        checkpoint_dir=str(tmp_path / "ckpt2m"),
        seed=3,
    )
    trainer = Stage2Trainer(system, loader, options, mesh=mesh)
    state, start = trainer.init_state(batch_size=1)
    state = trainer.fit(state, start)
    assert int(np.asarray(state.step)) == 2  # 16 samples / global batch 8


def test_stage2_trainer_tem_batches_sample_safe(tmp_path):
    """With precomputed-embedding batches ({'tem','image'}) the sampling
    path must use the tem variant instead of crashing on missing
    input_ids (ADVICE.md round-1 finding)."""
    import jax
    import numpy as np

    from imagegenerator_tpu.data.text_cache import (
        PrecomputedTextDataset,
        TemCollate,
        precompute_caption_embeddings,
    )
    from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System
    from imagegenerator_tpu.train.trainer import Stage2Trainer

    store = open_store("mem://trainer2-tem-test")
    _setup_dataset(store)

    cfg = Stage2Config.tiny(n_critic=1)
    system = Stage2System(cfg)
    state0 = system.init(jax.random.key(0), 2)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    captions = [e.caption for e in ds.entries]
    table = precompute_caption_embeddings(
        lambda i, m: system.embed_texts(state0, i, m),
        tok, captions, cfg.tem_size, batch_size=2, store=store,
    )
    loader = DataLoader(
        PrecomputedTextDataset(ds, table), TemCollate(), batch_size=2, num_workers=2
    )
    options = TrainerOptions(num_epochs=1, sample_every_steps=1, seed=3)
    trainer = Stage2Trainer(system, loader, options)
    state, start = trainer.init_state(batch_size=2)
    state = trainer.fit(state, start)
    assert int(np.asarray(state.step)) == 2


def test_stage2_trainer_epoch(tmp_path):
    """Stage-2 trainer end-to-end: 256px synthetic data, image sampling
    via the fixed-noise path, checkpoint + resume."""
    from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System
    from imagegenerator_tpu.train.trainer import Stage2Trainer

    store = open_store("mem://trainer2-test")
    _setup_dataset(store)

    cfg = Stage2Config.tiny(n_critic=1)
    system = Stage2System(cfg)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    loader = DataLoader(ds, tok, batch_size=2, num_workers=2)

    options = TrainerOptions(
        num_epochs=1,
        save_every_epochs=1,
        sample_every_steps=1,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        seed=3,
    )
    trainer = Stage2Trainer(system, loader, options)
    state, start = trainer.init_state(batch_size=2)
    state = trainer.fit(state, start)
    assert int(state.step) == 2

    trainer2 = Stage2Trainer(system, loader, options)
    _, start2 = trainer2.init_state(batch_size=2)
    assert start2 == 1


def test_stage1_cli_tp_mesh(tmp_path):
    """CLI --tp 2: stage-1 training on the 2-D (data, model) mesh via
    GSPMD with the in-step BERT Megatron-sharded (dp=4 x tp=2 on the 8
    virtual CPU devices), end to end through the data pipeline and
    checkpointing."""
    import io
    import json

    import numpy as np
    from PIL import Image

    from imagegenerator_tpu.data import open_store
    from imagegenerator_tpu.train import cli

    store = open_store("mem://tp-cli-smoke")
    rng = np.random.default_rng(0)
    images, annotations = [], []
    # --tp 2 -> 4 data shards; batch_size 2/shard -> global batch 8
    for i in range(8):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        store.write_bytes(f"imgs/img{i}.png", buf.getvalue())
        images.append({"id": i, "file_name": f"img{i}.png"})
        annotations.append({"image_id": i, "caption": f"a caption {i}"})
    store.write_text(
        "ann/captions.json",
        json.dumps({"images": images, "annotations": annotations}),
    )

    cli.main(
        [
            "--stage", "1",
            "--tiny",
            "--data", "mem://tp-cli-smoke",
            "--root", "imgs",
            "--ann_file", "ann/captions.json",
            "--batch_size", "2",
            "--num_epochs", "1",
            "--n_critic", "1",
            "--seq_len", "8",
            "--tp", "2",
            # EMA composed with the 2-D TP mesh: the trainer-held
            # average consumes GSPMD tp-sharded params each step and
            # the checkpoint takes the {"state","aux"} layout
            "--ema", "0.9",
            "--checkpoint_dir", str(tmp_path / "ckpts"),
        ]
    )
    assert (tmp_path / "ckpts" / "Stage1" / "LATEST_EPOCH").exists()
    from imagegenerator_tpu.checkpoint import CheckpointManager

    assert CheckpointManager(
        str(tmp_path / "ckpts" / "Stage1")
    )._is_composite(
        str(tmp_path / "ckpts" / "Stage1" / "epochs" / "checkpoint_epoch_0")
    )
