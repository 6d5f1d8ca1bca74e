"""Weights-day playbook: validate published checkpoints the moment they
land on disk (VERDICT.md round-2 next #9).

This environment has zero network egress, so the published taming VQGAN
``.ckpt``/``.yaml``, OpenAI CLIP ``.pt``, SpanBERT ``pytorch_model.bin``
and the CLIP BPE merges file cannot be fetched; every converter is
parity-tested against exact-named torch oracles instead
(tests/test_convert_parity.py, tests/test_bert_convert.py). When real
files appear, run:

    python tools/validate_real_weights.py \
        --vqgan_config checkpoints/vqgan_imagenet_f16_16384.yaml \
        --vqgan_checkpoint checkpoints/vqgan_imagenet_f16_16384.ckpt \
        --clip_checkpoint checkpoints/ViT-B-32.pt \
        --bert_checkpoint checkpoints/spanbert/pytorch_model.bin \
        --bpe_vocab checkpoints/bpe_simple_vocab_16e6.txt.gz \
        --out weights_day/ --strict

Every section is optional — pass whichever files you have. Steps per
file: convert -> structural checks -> deterministic forward smoke ->
fixed-seed golden artifacts written under --out (the real-weight
fidelity anchors BASELINE.json asks for) -> one real 128px generation
(VQGAN+CLIP both present). Reference contracts:
``/root/reference/v2_implementation/load_vqgan.py:5-14`` (VQGAN),
``generate.py:74-78`` (CLIP), ``train.py:68`` (SpanBERT).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _section(name):
    print(f"\n=== {name} ===", flush=True)


def _save_golden(out_dir: str, name: str, **arrays) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.npz")
    np.savez(path, **arrays)
    print(f"golden written: {path}")


def validate_vqgan(config_path: str, ckpt_path: str, out_dir: str):
    import jax
    import jax.numpy as jnp

    from imagegenerator_tpu.v2.generate import load_vqgan
    from imagegenerator_tpu.v2.vqgan import VQModel

    _section(f"VQGAN: {ckpt_path}")
    cfg, params = load_vqgan(config_path, ckpt_path, jax.random.key(0))
    print(f"config: f={cfg.f}, n_embed={cfg.n_embed}, embed_dim={cfg.embed_dim}")
    assert params["codebook"].shape == (cfg.n_embed, cfg.embed_dim)

    model = VQModel(cfg)
    # deterministic probe image: encode -> quantize -> decode roundtrip
    x = jnp.asarray(
        np.sin(np.arange(128 * 128 * 3, dtype=np.float32).reshape(1, 128, 128, 3)
               * 0.37)
    )
    z_q, idx = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=VQModel.encode)
    )(params, x)
    dec = jax.jit(
        lambda p, z: model.apply({"params": p}, z, method=VQModel.decode)
    )(params, z_q)
    print(f"encode: z_q {z_q.shape}, used codes {len(np.unique(np.asarray(idx)))}")
    print(f"decode: {dec.shape}, range [{float(dec.min()):.3f}, {float(dec.max()):.3f}]")
    assert dec.shape == x.shape
    assert np.isfinite(np.asarray(dec)).all()
    _save_golden(
        out_dir, "vqgan_roundtrip",
        z_q=np.asarray(z_q), indices=np.asarray(idx), decoded=np.asarray(dec),
    )
    return cfg, params


def validate_clip(ckpt_path: str, bpe_path: str | None, out_dir: str):
    import jax
    import jax.numpy as jnp

    from imagegenerator_tpu.v2.clip import CLIP, normalize_image
    from imagegenerator_tpu.v2.generate import load_clip
    from imagegenerator_tpu.v2.tokenizer import open_tokenizer

    _section(f"CLIP: {ckpt_path}")
    cfg, params = load_clip("ViT-B/32", ckpt_path, jax.random.key(1))
    print(
        f"config: image_res={cfg.image_resolution}, embed_dim={cfg.embed_dim}, "
        f"vision={'RN' if cfg.vision_layers_rn else 'ViT'}"
        if hasattr(cfg, "vision_layers_rn")
        else f"config: image_res={cfg.image_resolution}, embed_dim={cfg.embed_dim}"
    )
    model = CLIP(cfg)
    tok = open_tokenizer(bpe_path, cfg.context_length, cfg.vocab_size)
    prompts = ["a photo of a cat", "a diagram of a steam engine"]
    tokens = tok(prompts)
    if tokens.max() >= cfg.vocab_size:
        # only possible in a dry run: a real merges file pairs with the
        # published 49408-vocab model; synthetic tiny checkpoints don't
        print(
            f"[dry-run] tokenizer ids exceed the model vocab "
            f"({tokens.max()} >= {cfg.vocab_size}); folding into range"
        )
        tokens = tokens % cfg.vocab_size
    print(f"token ids[0][:8]: {tokens[0][:8].tolist()}")
    te = jax.jit(
        lambda p, t: model.apply({"params": p}, t, method=CLIP.encode_text)
    )(params, jnp.asarray(tokens))
    r = cfg.image_resolution
    probe = np.linspace(0, 1, r * r * 3, dtype=np.float32).reshape(1, r, r, 3)
    ie = jax.jit(
        lambda p, im: model.apply({"params": p}, im, method=CLIP.encode_image)
    )(params, normalize_image(jnp.asarray(probe)))
    te_n = np.asarray(te) / np.linalg.norm(np.asarray(te), axis=-1, keepdims=True)
    ie_n = np.asarray(ie) / np.linalg.norm(np.asarray(ie), axis=-1, keepdims=True)
    sims = ie_n @ te_n.T
    print(f"text embeds {te.shape}, image embeds {ie.shape}, sims {sims.ravel()}")
    assert np.isfinite(te_n).all() and np.isfinite(ie_n).all()
    # real weights should discriminate the two prompts (random ones don't)
    _save_golden(
        out_dir, "clip_embeds",
        tokens=tokens, text_embeds=np.asarray(te), image_embeds=np.asarray(ie),
    )
    return cfg, params


def validate_bert(ckpt_path: str, out_dir: str):
    import jax
    import jax.numpy as jnp

    from imagegenerator_tpu.models.bert import BertEncoder, load_bert_checkpoint

    _section(f"BERT (SpanBERT): {ckpt_path}")
    params, cfg = load_bert_checkpoint(ckpt_path)
    print(
        f"config: hidden={cfg.hidden_size}, layers={cfg.num_layers}, "
        f"vocab={cfg.vocab_size}"
    )
    enc = BertEncoder(cfg)
    ids = jnp.asarray(
        np.arange(2 * 16, dtype=np.int32).reshape(2, 16) % cfg.vocab_size
    )
    mask = jnp.ones((2, 16), jnp.int32)
    hidden = jax.jit(
        lambda p, i, m: enc.apply({"params": p}, i, m, deterministic=True)
    )(params, ids, mask)
    cls = np.asarray(hidden[:, 0, :])
    print(f"CLS hidden: {cls.shape}, norm {np.linalg.norm(cls, axis=-1)}")
    assert np.isfinite(cls).all()
    _save_golden(out_dir, "bert_cls", input_ids=np.asarray(ids), cls=cls)
    return cfg, params


def real_generation(args, out_dir: str) -> None:
    """One fixed-seed 128px generation through the production CLI path."""
    from imagegenerator_tpu.v2.generate import main as generate_main

    _section("real generation (v2 CLI path)")
    out_png = os.path.join(out_dir, "weights_day_sample.png")
    argv = [
        "-p", _EVAL_PROMPT,
        "-i", str(args.iterations),
        "-se", str(args.iterations),
        "-sd", "123456",
        "-o", out_png,
        "-conf", args.vqgan_config,
        "-ckpt", args.vqgan_checkpoint,
        "-m", args.clip_model,
    ]
    if args.clip_checkpoint:
        argv += ["--clip_checkpoint", args.clip_checkpoint]
    if args.bpe_vocab:
        argv += ["--bpe_vocab", args.bpe_vocab]
    generate_main(argv)
    print(f"sample written: {out_png}")


_EVAL_PROMPT = "a watercolor painting of a fox in a snowy forest"
_EVAL_FOIL = "a spreadsheet of quarterly earnings figures"


def validate_eval(args, out_dir: str) -> None:
    """CLIPScore discrimination on the weights-day sample: the matched
    prompt must outscore an unrelated foil (real weights only — a
    random tower can't discriminate, so a dry run just reports).
    Exercises the evaluation subsystem (imagegenerator_tpu/eval/)
    with ONE model load / ONE image embedding (the two prompts share
    everything but their text forward)."""
    import jax

    from imagegenerator_tpu.eval import clip_eval
    from imagegenerator_tpu.eval.cli import load_image_set
    from imagegenerator_tpu.v2.generate import load_clip
    from imagegenerator_tpu.v2.tokenizer import open_tokenizer

    _section("evaluation (CLIPScore on the weights-day sample)")
    sample = load_image_set(os.path.join(out_dir, "weights_day_sample.png"))
    cfg, params = load_clip(
        args.clip_model, args.clip_checkpoint, jax.random.key(2)
    )
    tok = open_tokenizer(args.bpe_vocab, cfg.context_length, cfg.vocab_size)
    tokens = tok([_EVAL_PROMPT, _EVAL_FOIL])
    if tokens.max() >= cfg.vocab_size:  # dry-run-only, as in validate_clip
        tokens = tokens % cfg.vocab_size
    ie = clip_eval.image_embeddings(cfg, params, sample, batch_size=1)
    te = clip_eval.text_embeddings(cfg, params, tokens, batch_size=2)
    matched = clip_eval.clip_score(ie, te[:1])
    foil = clip_eval.clip_score(ie, te[1:])
    ok = matched > foil
    print(
        f"CLIPScore matched prompt: {matched:.2f}, foil: {foil:.2f} -> "
        f"{'DISCRIMINATES' if ok else 'no discrimination'}"
    )
    if args.strict:
        # weights-day runs pass --strict: published CLIP weights must
        # rank the generation's own prompt above an unrelated foil
        # (synthetic/random test checkpoints can't, so the dry run
        # only reports)
        assert ok, (
            "CLIP weights failed to rank the generation's own prompt "
            "above an unrelated foil"
        )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--vqgan_config", default=None)
    p.add_argument("--vqgan_checkpoint", default=None)
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--clip_model", default="ViT-B/32")
    p.add_argument("--bert_checkpoint", default=None)
    p.add_argument("--bpe_vocab", default=None)
    p.add_argument("--iterations", type=int, default=50)
    p.add_argument("--out", default="weights_day")
    p.add_argument("--strict", action="store_true",
                   help="assert semantic checks that only hold for real "
                        "published weights (e.g. CLIPScore prompt "
                        "discrimination) — use on weights day")
    args = p.parse_args(argv)

    ran = []
    if args.vqgan_config and args.vqgan_checkpoint:
        validate_vqgan(args.vqgan_config, args.vqgan_checkpoint, args.out)
        ran.append("vqgan")
    if args.clip_checkpoint:
        validate_clip(args.clip_checkpoint, args.bpe_vocab, args.out)
        ran.append("clip")
    if args.bert_checkpoint:
        validate_bert(args.bert_checkpoint, args.out)
        ran.append("bert")
    if "vqgan" in ran and "clip" in ran:
        real_generation(args, args.out)
        ran.append("generation")
        validate_eval(args, args.out)
        ran.append("eval")
    if not ran:
        p.error("no checkpoint paths given — nothing to validate")
    manifest = os.path.join(args.out, "MANIFEST.json")
    with open(manifest, "w") as f:
        json.dump({"validated": ran}, f)
    print(f"\nAll sections passed: {ran} (manifest: {manifest})")


if __name__ == "__main__":
    main()
