"""Data pipeline: manifest build, decode/normalize, tokenizers, loader."""

import io
import json

import numpy as np
import pytest
from PIL import Image

from imagegenerator_tpu.data import (
    CocoCaptions,
    DataLoader,
    HashTokenizer,
    MemoryStore,
    build_manifest,
    open_store,
)


def _png_bytes(w=80, h=60, color=(255, 0, 0)):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def store():
    s = MemoryStore()
    anns = {
        "images": [
            {"id": 1, "file_name": "img1.png"},
            {"id": 2, "file_name": "img2.png"},
        ],
        "annotations": [
            {"image_id": 1, "caption": "a red square"},
            {"image_id": 1, "caption": "another caption for one"},
            {"image_id": 2, "caption": "a green square"},
            {"image_id": 2, "caption": "second green caption"},
        ],
    }
    s.write_text("ann/captions.json", json.dumps(anns))
    s.write_bytes("imgs/img1.png", _png_bytes(color=(255, 0, 0)))
    s.write_bytes("imgs/img2.png", _png_bytes(color=(0, 255, 0)))
    return s


def test_build_manifest(store):
    m = build_manifest(store, "ann/captions.json")
    assert len(m) == 4
    assert m[0].caption == "a red square" and m[0].file_name == "img1.png"


def test_dataset_item_uint8_default(store):
    # default transfer dtype is uint8 (device-side normalize path)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=64)
    caption, img = ds[0]
    assert caption == "a red square"
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img[..., 0].mean() > 254 and img[..., 1].mean() < 1


def test_dataset_item_float32(store):
    ds = CocoCaptions(
        store, "imgs", "ann/captions.json", image_size=64, image_dtype="float32"
    )
    caption, img = ds[0]
    assert caption == "a red square"
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    # pure red normalized: R ~ +1, G/B ~ -1
    assert img[..., 0].mean() > 0.99 and img[..., 1].mean() < -0.99


def test_dataset_uint8_matches_float32_to_quantization(store):
    # normalize(u8 path) must equal the f32 path up to the u8
    # quantization step (0.5 * 2/255) — the one rounding the uint8
    # transfer path adds on top of the shared resample
    ds8 = CocoCaptions(store, "imgs", "ann/captions.json", image_size=48)
    dsf = CocoCaptions(
        store, "imgs", "ann/captions.json", image_size=48, image_dtype="float32"
    )
    _, img8 = ds8[0]
    _, imgf = dsf[0]
    norm8 = img8.astype(np.float32) * (2.0 / 255.0) - 1.0
    assert np.abs(norm8 - imgf).max() <= 0.5 * 2.0 / 255.0 + 1e-6


def test_host_sharding(store):
    full = CocoCaptions(store, "imgs", "ann/captions.json")
    h0 = CocoCaptions(store, "imgs", "ann/captions.json", host_index=0, host_count=2)
    h1 = CocoCaptions(store, "imgs", "ann/captions.json", host_index=1, host_count=2)
    assert len(h0) == len(h1) == len(full) // 2
    assert h0.entries[0] != h1.entries[0]


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=1000, max_length=16)
    a = tok(["a red square", "a GREEN square!"])
    b = tok(["a red square", "a GREEN square!"])
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    assert a["input_ids"].shape == (2, 16)
    assert a["input_ids"][0, 0] == HashTokenizer.CLS
    assert a["attention_mask"][0].sum() == 5  # CLS + 3 words + SEP
    # same word -> same id regardless of position/case-fold
    assert a["input_ids"][0, 3] == a["input_ids"][1, 3]  # 'square'


def test_loader_yields_device_batches(store):
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=64)
    tok = HashTokenizer(vocab_size=1000, max_length=16)
    loader = DataLoader(ds, tok, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(iter(loader))
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (2, 64, 64, 3)
        # default transfer dtype rides through collate + device_put
        assert np.asarray(b["image"]).dtype == np.uint8
        assert b["input_ids"].shape == (2, 16)

    # shuffling is epoch-dependent but deterministic per (seed, epoch)
    loader2 = DataLoader(ds, tok, batch_size=2, shuffle=True, seed=1, num_workers=2)
    b2 = list(iter(loader2))
    np.testing.assert_array_equal(
        np.asarray(batches[0]["image"]), np.asarray(b2[0]["image"])
    )


def test_open_store_mem_roundtrip():
    s1 = open_store("mem://bucket-a")
    s2 = open_store("mem://bucket-a")
    s1.write_text("x/y.txt", "hello")
    assert s2.read_text("x/y.txt") == "hello"
    assert s2.listdir("x") == ["y.txt"]
    assert not s2.exists("nope")
