"""Offline caption-embedding cache for stage-2 training.

The stage-2 text encoder is frozen (reference stage_2_train_fn.py:52-57),
so every caption's embedding is a constant — recomputing BERT inside the
train step wastes ~20% of step time (BASELINE.md). This module embeds a
dataset's captions ONCE (batched through the frozen encoder) and caches
the (N, tem_size) table in the blob store; the loader then serves
``batch['tem']`` rows instead of token ids, and the train step skips the
encoder entirely (``Stage2System.train_step``'s 'tem' path).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np

import jax
import jax.numpy as jnp


def _cache_key(captions: list[str], tem_size: int) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(str(tem_size).encode())
    for c in captions:
        h.update(c.encode("utf-8"))
        h.update(b"\0")
    return h.hexdigest()


def precompute_caption_embeddings(
    embed_fn,
    tokenizer,
    captions: list[str],
    tem_size: int,
    *,
    batch_size: int = 256,
    store=None,
    cache_prefix: str = "text_cache",
    params=None,
) -> np.ndarray:
    """Embed every caption through ``embed_fn(tokens, mask) -> (B, tem)``.

    With a ``store``, the table is cached under a content hash of the
    captions, so repeated runs (and resumed jobs) skip the encoder sweep.

    Pass the encoder weights via ``params`` (calling convention becomes
    ``embed_fn(params, tokens, mask)``) rather than closing over them:
    closure-captured weights become CONSTANTS in the jitted HLO, and a
    BERT-base's ~400 MB constant payload overflows remote-compile
    transports (observed: the axon tunnel rejects it with HTTP 413).
    """
    cache_path = None
    if store is not None:
        cache_path = f"{cache_prefix}/{_cache_key(captions, tem_size)}.npy"
        if store.exists(cache_path):
            buf = io.BytesIO(store.read_bytes(cache_path))
            return np.load(buf)

    n = len(captions)
    out = np.zeros((n, tem_size), np.float32)
    embed_jit = jax.jit(embed_fn)
    for start in range(0, n, batch_size):
        chunk = captions[start : start + batch_size]
        # pad the ragged tail so one compiled shape serves every chunk
        padded = chunk + [""] * (batch_size - len(chunk))
        toks = tokenizer(padded)
        ids = jnp.asarray(toks["input_ids"])
        mask = jnp.asarray(toks["attention_mask"])
        tem = embed_jit(params, ids, mask) if params is not None else embed_jit(
            ids, mask
        )
        out[start : start + len(chunk)] = np.asarray(tem)[: len(chunk)]

    if store is not None and cache_path is not None:
        buf = io.BytesIO()
        np.save(buf, out)
        store.write_bytes(cache_path, buf.getvalue())
    return out


class PrecomputedTextDataset:
    """Wraps a (caption, image) dataset so samples carry the cached
    embedding row instead of raw text: ``__getitem__ -> (tem, image)``."""

    def __init__(self, dataset, tem_table: np.ndarray):
        assert len(dataset) == len(tem_table), "embedding table size mismatch"
        self.dataset = dataset
        self.tem_table = tem_table

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        _, image = self.dataset[index]
        return self.tem_table[index], image


class TemCollate:
    """Collate for precomputed embeddings: stacks tem rows (the tokenizer
    role in the standard loader). ``dtype`` must match the dtype the
    train step was compiled against (e.g. ml_dtypes.bfloat16 for a bf16
    step — AOT-compiled executables reject mismatched argument dtypes)."""

    def __init__(self, dtype=np.float32):
        self.dtype = dtype

    def __call__(self, tems: list[np.ndarray]) -> dict[str, np.ndarray]:
        return {"tem": np.stack(tems).astype(self.dtype)}
