"""Offline caption-embedding cache: correctness, store caching, loader
integration with the stage-2 'tem' fast path."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from imagegenerator_tpu.data import CocoCaptions, DataLoader, HashTokenizer, open_store
from imagegenerator_tpu.data.text_cache import (
    PrecomputedTextDataset,
    TemCollate,
    precompute_caption_embeddings,
)
from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System, make_train_step


def _setup_store(store, n=4):
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        store.write_bytes(f"imgs/img{i}.png", buf.getvalue())
        images.append({"id": i, "file_name": f"img{i}.png"})
        annotations.append({"image_id": i, "caption": f"caption number {i}"})
    store.write_text(
        "ann/captions.json", json.dumps({"images": images, "annotations": annotations})
    )


def test_precompute_and_cache():
    store = open_store("mem://textcache-test")
    cfg = Stage2Config.tiny()
    system = Stage2System(cfg)
    state = system.init(jax.random.key(0), 2)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    captions = [f"caption number {i}" for i in range(5)]

    def embed_fn(ids, mask):
        return system.embed_texts(state, ids, mask)

    table = precompute_caption_embeddings(
        embed_fn, tok, captions, cfg.tem_size, batch_size=2, store=store
    )
    assert table.shape == (5, cfg.tem_size)

    # direct equality with the in-step encoder
    toks = tok(captions[:2])
    want = np.asarray(
        system.embed_texts(
            state, jnp.asarray(toks["input_ids"]), jnp.asarray(toks["attention_mask"])
        )
    )
    np.testing.assert_allclose(table[:2], want, rtol=1e-4, atol=1e-5)

    # second call must hit the store cache (poison embed_fn to prove it)
    def boom(*_):
        raise AssertionError("cache miss")

    table2 = precompute_caption_embeddings(
        boom, tok, captions, cfg.tem_size, batch_size=2, store=store
    )
    np.testing.assert_array_equal(table, table2)


def test_loader_with_precomputed_tem_trains():
    store = open_store("mem://textcache-train")
    _setup_store(store)
    cfg = Stage2Config.tiny(n_critic=1)
    system = Stage2System(cfg)
    state = system.init(jax.random.key(0), 2)

    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=cfg.resolution)
    tok = HashTokenizer(vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len)
    captions = [e.caption for e in ds.entries]
    table = precompute_caption_embeddings(
        lambda i, m: system.embed_texts(state, i, m), tok, captions, cfg.tem_size,
        batch_size=2, store=store,
    )

    loader = DataLoader(
        PrecomputedTextDataset(ds, table), TemCollate(), batch_size=2, num_workers=2
    )
    step = make_train_step(system, donate=False)
    for batch in loader:
        assert batch["tem"].shape == (2, cfg.tem_size)
        state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss_gen"]))
    assert int(state.step) == 2
