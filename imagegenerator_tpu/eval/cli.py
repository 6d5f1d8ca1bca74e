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
``.npz`` with an ``images`` array (N, H, W, 3), uint8 or [0,1] float. Captions are
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


def load_image_set(path: str) -> np.ndarray:
    """Directory of images, a single image file, or .npz ->
    (N, H, W, 3) float32 in [0,1]."""
    if os.path.isfile(path) and not path.endswith(".npz"):
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.uint8)
        return arr[None].astype(np.float32) / 255.0
    if path.endswith(".npz"):
        with np.load(path) as z:
            if "images" not in z:
                raise ValueError(f"{path} has no 'images' array")
            imgs = z["images"]
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        imgs = np.asarray(imgs, np.float32)
        if imgs.ndim != 4 or imgs.shape[-1] != 3:
            raise ValueError(
                f"{path}: expected (N, H, W, 3), got {imgs.shape}"
            )
        return imgs
    from PIL import Image

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    names = sorted(
        f for f in os.listdir(path) if f.lower().endswith(exts)
    )
    if not names:
        raise ValueError(f"no images found in {path}")
    out = []
    size = None
    for name in names:
        with Image.open(os.path.join(path, name)) as im:
            im = im.convert("RGB")
            if size is None:
                size = im.size
            elif im.size != size:
                # mixed sizes: conform to the first image; the device
                # path resizes to the CLIP resolution regardless
                im = im.resize(size, Image.BICUBIC)
            out.append(np.asarray(im, np.uint8))
    return np.stack(out).astype(np.float32) / 255.0


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

    samples = load_image_set(args.samples)
    cfg, params = load_clip(
        args.clip_model, args.clip_checkpoint,
        jax.random.PRNGKey(args.seed),
    )
    real_weights = bool(
        args.clip_checkpoint and os.path.exists(args.clip_checkpoint)
    )

    result = {
        "n_samples": int(samples.shape[0]),
        "clip_model": args.clip_model if real_weights else "tiny-random",
        "real_weights": real_weights,
    }
    sample_emb = clip_eval.image_embeddings(
        cfg, params, samples, batch_size=args.batch, dtype=dtype, mesh=mesh
    )

    if args.captions is not None:
        caps = parse_captions(args.captions, samples.shape[0])
        tokenizer = open_tokenizer(
            args.bpe_vocab, cfg.context_length, cfg.vocab_size
        )
        tokens = np.concatenate([tokenizer([c]) for c in caps], axis=0)
        text_emb = clip_eval.text_embeddings(
            cfg, params, tokens, batch_size=args.batch, dtype=dtype, mesh=mesh
        )
        result["clip_score"] = round(
            clip_eval.clip_score(sample_emb, text_emb), 4
        )

    if args.ref is not None:
        ref = load_image_set(args.ref)
        ref_emb = clip_eval.image_embeddings(
            cfg, params, ref, batch_size=args.batch, dtype=dtype, mesh=mesh
        )
        result["n_ref"] = int(ref.shape[0])
        result["frechet_clip_distance"] = round(
            frechet.frechet_distance(
                *frechet.gaussian_stats(sample_emb),
                *frechet.gaussian_stats(ref_emb),
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
