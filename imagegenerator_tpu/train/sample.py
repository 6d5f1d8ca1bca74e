"""Sampling CLI: generate images from a trained v1 checkpoint.

The reference has no standalone inference path — its only sample surface
is the fixed-noise TensorBoard image grid inside stage-2 training
(``/root/reference/stage_2_train_fn.py:181-208``). This CLI completes
the v1 story for a user of the framework: load the latest checkpoint a
training run wrote (``train.py --checkpoint_dir ...``), encode captions
through the (fine-tuned) text encoder, and decode 64px (stage 1) or
256px (stage 2) images, one PNG per sample with the caption embedded in
a ``comment`` text chunk (the same artifact contract as the v2 CLI's
output.png, generate.py:144-151).

    python -m imagegenerator_tpu.train.sample --stage 2 \
        --checkpoint_dir ./checkpoints --caption "a red bus|a snowy street" \
        -n 4 -o samples/

Model-shape flags must match the training run (same contract as resume);
``--tiny`` mirrors the training CLI's tiny config for smoke tests.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--stage", type=int, choices=[1, 2], default=2,
                   help="1 = 64px generator, 2 = 256px refinement stack")
    p.add_argument("--checkpoint_dir", required=True,
                   help="the training run's --checkpoint_dir; the latest "
                        "committed epoch under Stage{N}/ is restored")
    p.add_argument("--caption", required=True,
                   help="caption(s), '|'-separated like the v2 CLI's "
                        "prompts (arg_parser.py -p)")
    def _positive(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return n

    p.add_argument("-n", "--num_samples", type=_positive, default=1,
                   help="samples per caption (fresh CA/z noise each)")
    p.add_argument("-o", "--output", default="samples",
                   help="output directory (created if missing)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true",
                   help="sample from the EMA averages a --ema training "
                        "run stored (train/ema.py) instead of the live "
                        "weights")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (must match a --tiny training "
                        "run)")
    # model-shape flags — reference train.py:31-37 defaults, same as the
    # training CLI; a checkpoint only restores into a matching shape
    p.add_argument("--tem_size", type=int, default=512)
    p.add_argument("--c_dim", type=int, default=128)
    p.add_argument("--z_dim", type=int, default=100)
    p.add_argument("--nd", type=int, default=128)
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--bert_vocab", type=int, default=28996)
    p.add_argument("--bert_checkpoint", default=None,
                   help="torch SpanBERT/BERT state_dict used at training "
                        "(--bert_checkpoint there): its INFERRED "
                        "ARCHITECTURE shapes the restore template; the "
                        "fine-tuned weights themselves come from the "
                        "training checkpoint")
    p.add_argument("--gelu", choices=["exact", "exact_outbwd", "tanh"],
                   default="exact",
                   help="text-encoder GELU flavor — MUST match training "
                        "(--gelu there): tanh is a different function, "
                        "so sampling a tanh-trained encoder with exact "
                        "silently shifts every embedding. exact_outbwd "
                        "equals exact at inference (the variants differ "
                        "only in the backward)")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer name/path (must match training); "
                        "default: the deterministic hash tokenizer")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image, PngImagePlugin

    from imagegenerator_tpu.checkpoint import CheckpointManager
    from imagegenerator_tpu.data.tokenizer import HashTokenizer
    from imagegenerator_tpu.models.bert import BertConfig
    from imagegenerator_tpu.train import stage1 as s1
    from imagegenerator_tpu.train import stage2 as s2

    captions = [c.strip() for c in args.caption.split("|") if c.strip()]
    if not captions:
        raise SystemExit("--caption is empty")
    batch_size = len(captions) * args.num_samples

    # BertConfig must reproduce the TRAINING run's encoder function and
    # architecture (same construction rules as train/cli.py:main): a
    # --bert_checkpoint run inferred its layer/width shapes from the
    # torch file, and --gelu tanh is a different function — both must be
    # re-declared here or the restore template/function won't match.
    import dataclasses as _dc

    bert_cfg = BertConfig(vocab_size=args.bert_vocab)
    if args.bert_checkpoint:
        from imagegenerator_tpu.models.bert import load_bert_checkpoint

        _, bert_cfg = load_bert_checkpoint(args.bert_checkpoint)
    if args.gelu != "exact":
        bert_cfg = _dc.replace(
            bert_cfg,
            gelu_approximate=args.gelu == "tanh",
            gelu_output_bwd=args.gelu == "exact_outbwd",
        )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    common = dict(
        tem_size=args.tem_size,
        c_dim=args.c_dim,
        z_dim=args.z_dim,
        nd=args.nd,
        seq_len=args.seq_len,
        compute_dtype=dtype,
        bert=bert_cfg,
    )
    tiny_kw = (
        dict(bert=bert_cfg, seq_len=args.seq_len)
        if args.bert_checkpoint
        else {}
    )
    if args.stage == 1:
        cfg = (
            s1.Stage1Config.tiny(**tiny_kw)
            if args.tiny
            else s1.Stage1Config(**common)
        )
        system = s1.Stage1System(cfg)
    else:
        cfg = (
            s2.Stage2Config.tiny(**tiny_kw)
            if args.tiny
            else s2.Stage2Config(**common)
        )
        system = s2.Stage2System(cfg)

    # abstract template: restore_latest takes shapes/dtypes, so nothing
    # is compiled or materialized just to be overwritten by the restore
    template = jax.eval_shape(
        lambda k: system.init(k, batch_size), jax.random.key(0)
    )
    mgr = CheckpointManager(f"{args.checkpoint_dir}/Stage{args.stage}")
    if args.ema:
        from imagegenerator_tpu.train import ema as ema_lib

        state, aux, start_epoch = mgr.restore_latest_with_aux(template)
        if state is not None and aux is None:
            raise SystemExit(
                "--ema: this checkpoint has no EMA side tree (train "
                "with --ema DECAY to produce one)"
            )
        if aux is not None:
            state = ema_lib.swap_in(state, aux["ema"])
    else:
        # composite (EMA-run) checkpoints restore their live weights
        # transparently here — restore_latest detects the layout
        state, start_epoch = mgr.restore_latest(template)
    if state is None:
        raise SystemExit(
            f"no checkpoint found under "
            f"{args.checkpoint_dir}/Stage{args.stage}"
        )
    print(f"Loaded checkpoint at epoch {start_epoch - 1}")

    if args.tokenizer:
        from imagegenerator_tpu.data.tokenizer import HFTokenizer

        tok = HFTokenizer(args.tokenizer, max_length=cfg.seq_len)
    else:
        tok = HashTokenizer(
            vocab_size=cfg.bert.vocab_size, max_length=cfg.seq_len
        )
    # caption i repeated num_samples times, sample index varying fastest
    texts = [c for c in captions for _ in range(args.num_samples)]
    batch = tok(texts)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    imgs = jax.jit(system.sample)(state, batch, jax.random.key(args.seed))
    imgs = np.asarray(jax.device_get(imgs), np.float32)  # (B, H, W, 3) [-1, 1]
    arr = np.clip((imgs + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)

    os.makedirs(args.output, exist_ok=True)
    for i, caption in enumerate(captions):
        for j in range(args.num_samples):
            info = PngImagePlugin.PngInfo()
            info.add_text("comment", caption)
            path = os.path.join(args.output, f"sample_{i}_{j}.png")
            Image.fromarray(arr[i * args.num_samples + j]).save(
                path, pnginfo=info
            )
            print(f"wrote {path} ({arr.shape[1]}x{arr.shape[2]}): {caption}")


if __name__ == "__main__":
    main()
