"""CLIP-based quality metrics: image embeddings and CLIPScore.

Pairs with ``frechet.py`` to give the framework the evaluation story
the reference entirely lacks (it has no metric code — see
frechet.py's module docstring). Two metrics:

* **CLIPScore** (Hessel et al. 2021): ``100 * max(cos(E_img, E_txt), 0)``
  averaged over caption/image pairs — a reference-free fidelity score
  for the v1 sampling CLI's caption-conditioned outputs and the v2
  CLI's prompt-conditioned outputs alike.
* **CLIP feature extraction** for the Fréchet distance (CLIP-FID):
  the image tower's post-projection embedding, unnormalized, the
  convention of Kynkaanniemi et al. 2022.

Everything device-side is one jitted fixed-shape batch function —
ragged trailing batches are padded to the compiled shape and the pad
rows dropped on host, so evaluating 10 or 10,000 images reuses one
executable. Images enter as [0,1] float NHWC at any resolution and
are resized on device (bicubic, the same family the reference's
``resample`` uses for its non-Lanczos leg, vision_utils.py:88-90)
to the tower's input resolution, then CLIP-normalized
(generate.py:117-119 constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from imagegenerator_tpu.v2.clip import CLIP, normalize_image

__all__ = ["image_embeddings", "text_embeddings", "clip_score"]


def _shardings(mesh):
    """(replicated params, batch-sharded data) NamedShardings, or
    (None, None) for single-device jit. Extraction is embarrassingly
    data-parallel: params replicate, the batch splits over the mesh's
    ``data`` axis, zero collectives — the same DP recipe as the
    trainers (parallel/mesh.py)."""
    if mesh is None:
        return None, None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


@functools.lru_cache(maxsize=8)
def _embed_image_fn(cfg, dtype, mesh=None):
    model = CLIP(cfg, dtype=dtype)
    res = cfg.image_resolution
    rep, dp = _shardings(mesh)

    @functools.partial(
        jax.jit,
        **({} if mesh is None else {"in_shardings": (rep, dp),
                                    "out_shardings": dp}),
    )
    def fn(params, images01):
        x = images01.astype(jnp.float32)
        if x.shape[1] != res or x.shape[2] != res:
            x = jax.image.resize(
                x, (x.shape[0], res, res, x.shape[3]), "cubic"
            )
        x = normalize_image(jnp.clip(x, 0.0, 1.0)).astype(
            dtype or jnp.float32
        )
        emb = model.apply(
            {"params": params}, x, method=CLIP.encode_image
        )
        return emb.astype(jnp.float32)

    return fn


@functools.lru_cache(maxsize=8)
def _embed_text_fn(cfg, dtype, mesh=None):
    model = CLIP(cfg, dtype=dtype)
    rep, dp = _shardings(mesh)

    @functools.partial(
        jax.jit,
        **({} if mesh is None else {"in_shardings": (rep, dp),
                                    "out_shardings": dp}),
    )
    def fn(params, tokens):
        emb = model.apply(
            {"params": params}, tokens, method=CLIP.encode_text
        )
        return emb.astype(jnp.float32)

    return fn


def _batched(fn, params, arrays, batch_size):
    """Run ``fn(params, batch)`` over fixed-size batches, padding the
    tail by repeating its first row; returns the unpadded concat."""
    n = arrays.shape[0]
    out = []
    for start in range(0, n, batch_size):
        chunk = arrays[start : start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[:1], pad, axis=0)], axis=0
            )
        emb = fn(params, jnp.asarray(chunk))
        out.append(np.asarray(emb)[: batch_size - pad])
    return np.concatenate(out, axis=0)


def _check_mesh_batch(mesh, batch_size):
    if mesh is not None and batch_size % mesh.devices.size:
        raise ValueError(
            f"batch_size {batch_size} must divide evenly over the "
            f"{mesh.devices.size}-device mesh"
        )


def image_embeddings(
    cfg, params, images01, batch_size: int = 32, dtype=None, mesh=None
):
    """(N, H, W, 3) [0,1] images -> (N, embed_dim) float32 CLIP embeds.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
    each fixed-shape batch shards over it (params replicated)."""
    images01 = np.asarray(images01, np.float32)
    if images01.ndim != 4 or images01.shape[-1] != 3:
        raise ValueError(f"expected (N, H, W, 3) images, got {images01.shape}")
    _check_mesh_batch(mesh, batch_size)
    return _batched(
        _embed_image_fn(cfg, dtype, mesh), params, images01, batch_size
    )


def text_embeddings(
    cfg, params, tokens, batch_size: int = 64, dtype=None, mesh=None
):
    """(N, context_length) int tokens -> (N, embed_dim) float32."""
    tokens = np.asarray(tokens, np.int32)
    _check_mesh_batch(mesh, batch_size)
    return _batched(
        _embed_text_fn(cfg, dtype, mesh), params, tokens, batch_size
    )


def clip_score(image_embeds, text_embeds) -> float:
    """Mean CLIPScore over aligned (image, text) embedding rows:
    ``100 * max(cos, 0)`` per pair (Hessel et al. 2021), float64 host
    math like the Fréchet finalization."""
    ie = np.asarray(image_embeds, np.float64)
    te = np.asarray(text_embeds, np.float64)
    if ie.shape != te.shape:
        raise ValueError(
            f"embedding shapes differ: {ie.shape} vs {te.shape}"
        )
    ie = ie / np.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / np.linalg.norm(te, axis=-1, keepdims=True)
    cos = (ie * te).sum(axis=-1)
    return float(np.mean(np.maximum(cos, 0.0)) * 100.0)
