"""Evaluation CLI: CLIPScore and CLIP-Fréchet distance for sample sets.

The reference has no evaluation path at all — fidelity there is
eyeballing TensorBoard grids (``/root/reference/stage_2_train_fn.py:
196-208``) or the committed output.png. This CLI closes the loop for
both halves of the framework: score the v1 sampling CLI's outputs
against their captions, or compare a generated set against a real set.

    # caption fidelity of generated samples (CLIPScore)
    python evaluate.py --samples samples/ --captions "a red bus|a dog" \
        --clip_checkpoint ViT-B-32.pt --bpe_vocab bpe_simple_vocab_16e6.txt.gz

    # distribution distance vs a real set (CLIP-FID)
    python evaluate.py --samples samples/ --ref real_images/ \
        --clip_checkpoint ViT-B-32.pt

Inputs are a directory of PNG/JPEG files, a single image file, or an
``.npz`` with an ``images`` array (N, H, W, 3), uint8 or [0,1] float —
streamed batch-wise (one embedding pass feeds both metrics; nothing
larger than a batch is resident, so 50k-image sets fit). Captions are
``|``-separated like the v2 prompt flag (arg_parser.py:10-14), or
``@path`` for one-per-line files; one caption broadcasts to all
samples. Without ``--clip_checkpoint`` the tower falls back to the
same randomly-initialized tiny model as the v2 CLI (numbers are then
mechanical smoke only, and the output says so).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from imagegenerator_tpu.eval import clip_eval, frechet


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--samples", required=True,
                   help="generated set: image directory or .npz")
    p.add_argument("--ref", default=None,
                   help="real/reference set (enables the Fréchet metric)")
    p.add_argument("--captions", default=None,
                   help="'|'-separated captions aligned with --samples "
                        "(or @file, one per line; a single caption "
                        "broadcasts) — enables CLIPScore")
    p.add_argument("-m", "--clip_model", default="ViT-B/32",
                   help="CLIP tower name (the v2 CLI's -m choices)")
    p.add_argument("--clip_checkpoint", default=None,
                   help="torch CLIP checkpoint (.pt) converted in-process")
    p.add_argument("--bpe_vocab", default=None,
                   help="CLIP BPE vocab (v2 --bpe_vocab); hash fallback "
                        "when absent")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each embedding batch over this many "
                        "devices (data-parallel mesh; --batch must "
                        "divide evenly)")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="f32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--out", default=None,
                   help="also write the JSON result to this path")
    return p


class ImageSet:
    """Lazy image source: a directory of images, a single image file,
    or an .npz with an ``images`` array. ``batches(b)`` yields [0,1]
    float32 (<=b, H, W, 3) chunks without ever materializing the whole
    set — a 50k-image CLIP-FID reference set streams through the
    embedding loop at batch-size memory (the point of
    ``frechet.FeatureMoments``)."""

    _EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, path: str):
        self.path = path
        if path.endswith(".npz"):
            # header-only probe: shape/dtype from the .npy member header,
            # no array data read (a 50k-image ref set is ~10 GB)
            shape, _ = self._npz_header()
            if len(shape) != 4 or shape[-1] != 3:
                raise ValueError(
                    f"{path}: expected (N, H, W, 3), got {shape}"
                )
            self._names = None
            self._n = shape[0]
        elif os.path.isfile(path):
            self._names = [path]
            self._n = 1
        else:
            self._names = [
                os.path.join(path, f)
                for f in sorted(os.listdir(path))
                if f.lower().endswith(self._EXTS)
            ]
            if not self._names:
                raise ValueError(f"no images found in {path}")
            self._n = len(self._names)

    def __len__(self) -> int:
        return self._n

    def _decode(self, path: str, size):
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB")
            if size is not None and im.size != size:
                # mixed sizes: conform to the first image; the device
                # path resizes to the CLIP resolution regardless
                im = im.resize(size, Image.BICUBIC)
            return np.asarray(im, np.uint8), im.size

    def _npz_member(self):
        """Open the ``images.npy`` member for sequential reading and
        parse its header; -> (fileobj positioned at the data, shape,
        dtype). Works on compressed and stored members alike —
        ZipExtFile reads are sequential, which is all streaming needs."""
        import zipfile

        from numpy.lib import format as npformat

        zf = zipfile.ZipFile(self.path)
        # np.load accepts the member with or without the .npy suffix
        member = next(
            (n for n in ("images.npy", "images") if n in zf.namelist()),
            None,
        )
        if member is None:
            zf.close()
            raise ValueError(f"{self.path} has no 'images' array")
        f = zf.open(member)
        try:
            version = npformat.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = npformat.read_array_header_1_0(f)
            else:
                shape, fortran, dtype = npformat.read_array_header_2_0(f)
            if fortran:
                raise ValueError(
                    f"{self.path}: Fortran-order array unsupported"
                )
        except Exception:
            f.close()
            zf.close()
            raise
        return f, zf, shape, dtype

    def _npz_header(self):
        f, zf, shape, dtype = self._npz_member()
        f.close()
        zf.close()
        return shape, dtype

    def batches(self, batch_size: int):
        if self._names is None:
            f, zf, shape, dtype = self._npz_member()
            row_bytes = int(np.prod(shape[1:])) * dtype.itemsize
            try:
                for s in range(0, self._n, batch_size):
                    n = min(batch_size, self._n - s)
                    buf = f.read(n * row_bytes)
                    chunk = np.frombuffer(buf, dtype=dtype).reshape(
                        (n,) + shape[1:]
                    )
                    if chunk.dtype == np.uint8:
                        chunk = chunk.astype(np.float32) / 255.0
                    yield np.asarray(chunk, np.float32)
            finally:
                f.close()
                zf.close()
            return
        size = None
        for s in range(0, self._n, batch_size):
            out = []
            for name in self._names[s : s + batch_size]:
                arr, size0 = self._decode(name, size)
                size = size or size0
                out.append(arr)
            yield np.stack(out).astype(np.float32) / 255.0


def load_image_set(path: str) -> np.ndarray:
    """Eager (N, H, W, 3) float32 [0,1] load — small sets / tests; the
    CLI itself streams via ImageSet.batches."""
    return np.concatenate(list(ImageSet(path).batches(64)), axis=0)


def parse_captions(spec: str, n_samples: int) -> list:
    if spec.startswith("@"):
        with open(spec[1:]) as f:
            caps = [ln.strip() for ln in f if ln.strip()]
    else:
        caps = [c.strip() for c in spec.split("|") if c.strip()]
    if len(caps) == 1:
        caps = caps * n_samples
    if len(caps) != n_samples:
        raise ValueError(
            f"{len(caps)} captions for {n_samples} samples "
            "(give 1 to broadcast)"
        )
    return caps


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from imagegenerator_tpu.v2.generate import load_clip
    from imagegenerator_tpu.v2.tokenizer import open_tokenizer

    args = get_parser().parse_args(argv)
    if args.ref is None and args.captions is None:
        get_parser().error("nothing to compute: give --ref, --captions, "
                           "or both")
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    mesh = None
    if args.dp > 1:
        from imagegenerator_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.dp)

    samples = ImageSet(args.samples)
    cfg, params = load_clip(
        args.clip_model, args.clip_checkpoint,
        jax.random.PRNGKey(args.seed),
    )
    real_weights = bool(
        args.clip_checkpoint and os.path.exists(args.clip_checkpoint)
    )

    result = {
        "n_samples": len(samples),
        "clip_model": args.clip_model if real_weights else "tiny-random",
        "real_weights": real_weights,
    }

    # captions: tokenize + embed each UNIQUE caption once (a broadcast
    # caption is one tokenization and one text forward, review round 5)
    te_n = idx = None
    if args.captions is not None:
        caps = parse_captions(args.captions, len(samples))
        unique = list(dict.fromkeys(caps))
        tokenizer = open_tokenizer(
            args.bpe_vocab, cfg.context_length, cfg.vocab_size
        )
        te = clip_eval.text_embeddings(
            cfg, params, tokenizer(unique),
            batch_size=args.batch, dtype=dtype, mesh=mesh,
        ).astype(np.float64)
        te_n = te / np.linalg.norm(te, axis=-1, keepdims=True)
        cap_row = {c: i for i, c in enumerate(unique)}
        idx = np.asarray([cap_row[c] for c in caps])

    # one streaming pass over the samples: every batch is embedded
    # once and feeds both metrics (moments for Fréchet, cosine sums
    # for CLIPScore) — nothing larger than a batch is ever resident
    moments = (
        frechet.FeatureMoments(cfg.embed_dim)
        if args.ref is not None
        else None
    )
    score_sum, pos = 0.0, 0
    for chunk in samples.batches(args.batch):
        emb = clip_eval.image_embeddings(
            cfg, params, chunk,
            batch_size=args.batch, dtype=dtype, mesh=mesh,
        )
        if moments is not None:
            moments.update(emb)
        if te_n is not None:
            ie = np.asarray(emb, np.float64)
            ie /= np.linalg.norm(ie, axis=-1, keepdims=True)
            cos = (ie * te_n[idx[pos : pos + len(emb)]]).sum(axis=-1)
            score_sum += np.maximum(cos, 0.0).sum()
        pos += len(emb)
    if te_n is not None:
        result["clip_score"] = round(100.0 * score_sum / len(samples), 4)

    if args.ref is not None:
        ref = ImageSet(args.ref)
        ref_moments = frechet.FeatureMoments(cfg.embed_dim)
        for chunk in ref.batches(args.batch):
            ref_moments.update(clip_eval.image_embeddings(
                cfg, params, chunk,
                batch_size=args.batch, dtype=dtype, mesh=mesh,
            ))
        result["n_ref"] = len(ref)
        result["frechet_clip_distance"] = round(
            frechet.frechet_distance(
                *moments.stats(), *ref_moments.stats()
            ),
            6,
        )

    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    main()
