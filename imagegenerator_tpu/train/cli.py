"""v1 training CLI — the ``python train.py`` role of the reference
(``/root/reference/train.py``), with the same hyperparameter defaults
(TEM_SIZE=512, lr=1e-3, c_dim=128, z_dim=100, Nd=128, 500 epochs,
batch 32, train.py:31-37) exposed as real flags instead of module
constants (SURVEY.md §5 'give v1 a real config').

Usage:
  python train.py --stage 1 --data mem://demo ... (or python -m
  imagegenerator_tpu.train.cli)

The reference's torch_xla runtime maps as: xmp.spawn per core ->
jax.sharding.Mesh over all local devices; broadcast_master_param ->
replicated NamedSharding; DistributedSampler -> per-host dataset shard;
MpDeviceLoader -> the prefetching DataLoader.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from imagegenerator_tpu.data import CocoCaptions, DataLoader, open_store
from imagegenerator_tpu.models.bert import BertConfig
from imagegenerator_tpu.train import stage1 as s1
from imagegenerator_tpu.train import stage2 as s2
from imagegenerator_tpu.train.trainer import (
    Stage1Trainer,
    Stage2Trainer,
    TrainerOptions,
)


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="StackGAN-style two-stage trainer (TPU)")
    p.add_argument("--stage", type=int, choices=(1, 2), default=1)
    # data (reference train.py:117-124 defaults)
    p.add_argument("--data", type=str, default="gs://data-and-checkpoints-bucket",
                   help="dataset store url (gs://bucket, local path, mem://)")
    p.add_argument("--root", type=str, default="dataset/train2017")
    p.add_argument("--ann_file", type=str,
                   default="dataset/annotations/captions_train2017.json")
    # hyperparameters (reference train.py:31-37)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--encoder_lr", type=float, default=5e-5)
    p.add_argument("--tem_size", type=int, default=512)
    p.add_argument("--c_dim", type=int, default=128)
    p.add_argument("--z_dim", type=int, default=100)
    p.add_argument("--nd", type=int, default=128)
    p.add_argument("--n_critic", type=int, default=5)
    p.add_argument("--lambda_gp", type=float, default=10.0)
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--kl_mode", choices=("correct", "faithful"), default="correct")
    p.add_argument("--dtype", choices=("f32", "bf16"), default="bf16")
    # infra
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    p.add_argument("--stage1_checkpoint", type=str, default=None,
                   help="stage-2: directory of the stage-1 checkpoint to freeze")
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (CPU smoke runs)")
    p.add_argument("--bert_vocab", type=int, default=28996)
    p.add_argument("--rng_impl", choices=["threefry2x32", "rbg"], default=None,
                   help="PRNG implementation for in-step randomness "
                        "(default: JAX's threefry). 'rbg' is ~8%% faster "
                        "whole-step on v5e with --gelu tanh; both are "
                        "deterministic per seed with different bitstreams")
    p.add_argument("--gelu", choices=["exact", "exact_outbwd", "tanh"],
                   default="exact",
                   help="text-encoder GELU flavor: 'exact' (erf — what "
                        "HF SpanBERT computes; default), 'exact_outbwd' "
                        "(same bit-identical forward; backward recovers "
                        "the CDF from the saved gelu output instead of "
                        "re-running the erf polynomial — ops/gelu.py), "
                        "or 'tanh' (approximation, ~9%% faster stage-1 "
                        "step on v5e; benchmarks/PROFILE_stage1_r03.md)")
    p.add_argument("--text_reuse_mis", action="store_true",
                   help="stage 1: reuse the matched-caption embeddings "
                        "for the mismatched pairs (tem_mis = tem[perm]) "
                        "— halves the dominant text-encoder cost. Exact "
                        "when text dropout is off (then it is automatic);"
                        " under dropout the mismatched pair shares its "
                        "matched twin's dropout sample instead of the "
                        "reference's fresh draw")
    p.add_argument("--dropout_bits", type=int, choices=[8, 16, 32],
                   default=None,
                   help="mask-draw width for the text encoder's hidden-"
                        "dropout sites: 32 = nn.Dropout's f32-uniform "
                        "compare (default); 16/8 draw uint16/uint8 bits "
                        "(ops/dropout.py) — halves/quarters the non-"
                        "fusible RngBitGenerator HBM traffic. Unbiased "
                        "(kept values rescale by the exact quantized "
                        "keep prob); keep-prob quantization 2^-bits")
    p.add_argument("--fused_attn", action="store_true",
                   help="fuse text-encoder attention (QK^T+softmax+"
                        "dropout+PV) into one Pallas kernel per "
                        "direction; logits/probs stay in VMEM and the "
                        "backward recomputes them (dropout keep-masks "
                        "come from the TPU hardware PRNG — a different "
                        "deterministic bitstream than the default). "
                        "Composes with --tp (head-group sharding via "
                        "custom_partitioning)")
    p.add_argument("--fused_ln", action="store_true",
                   help="route text-encoder LayerNorms through the "
                        "fused Pallas forward+VJP kernel (one HBM pass "
                        "for dx+dgamma+dbeta; parity-tested vs "
                        "nn.LayerNorm, XLA fallback off-TPU)")
    p.add_argument("--bert_checkpoint", type=str, default=None,
                   help="local HF torch state_dict (pytorch_model.bin / "
                        ".pt) of the pretrained text encoder — the "
                        "SpanBERT/spanbert-base-cased role of reference "
                        "train.py:68; architecture is inferred from the "
                        "weights")
    p.add_argument("--tokenizer", type=str, default=None,
                   help="local HF tokenizer dir/name (the SpanBERT "
                        "tokenizer role of reference data_loader.py:68-79); "
                        "default: the dependency-free HashTokenizer")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host "
                        "pods; the reference's PJRT process-group role)")
    def _decay(v):
        d = float(v)
        if not 0.0 <= d < 1.0:
            raise argparse.ArgumentTypeError(
                f"EMA decay must be in [0, 1), got {d}"
            )
        return d

    p.add_argument("--ema", type=_decay, default=None, metavar="DECAY",
                   help="keep an exponential moving average of the "
                        "generator-side params at this decay (e.g. "
                        "0.999); stored in checkpoints as a side tree "
                        "and sampled via train.sample --ema "
                        "(train/ema.py — the reference has no EMA)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the training "
                        "run into this directory (view with xprof / "
                        "TensorBoard's profile plugin)")
    p.add_argument("--image_dtype", choices=["uint8", "float32"],
                   default="uint8",
                   help="loader->device image transfer dtype. uint8 "
                        "(default): the loader ships resampled bytes and "
                        "the train step normalizes to [-1,1] ON-DEVICE — "
                        "4x fewer host->device bytes at <=0.5/255 "
                        "post-resample quantization (the reference "
                        "resamples float tensors — ToTensor before "
                        "Resize, train.py:40-48 — so this is a transfer-"
                        "width trade, not parity). float32: host-side "
                        "normalize, quantization-free, 4x the bytes")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (stage 1): shards the "
                        "in-step BERT Megatron-style over a 2-D "
                        "(data, model) mesh via GSPMD; device count must "
                        "be divisible by this. 1 = pure DP (reference "
                        "parallelism)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.multihost:
        jax.distributed.initialize()
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    devices = np.array(jax.devices())
    if args.tp > 1:
        if args.stage != 1:
            raise SystemExit("--tp applies to stage 1 (the in-step BERT)")
        # --fused_attn composes with --tp: the kernel carries
        # custom_partitioning rules (batch -> data, head groups ->
        # model), so GSPMD shards it instead of all-gathering
        # (tests/test_tp.py::test_stage1_2d_mesh_fused_attention)
        if len(devices) % args.tp:
            raise SystemExit(
                f"--tp {args.tp} does not divide {len(devices)} devices"
            )
        mesh = jax.sharding.Mesh(
            devices.reshape(-1, args.tp), ("data", "model")
        )
    else:
        mesh = jax.sharding.Mesh(devices, ("data",)) if len(devices) > 1 else None

    # Pretrained text encoder (reference train.py:68): load + convert the
    # torch state_dict up front so its inferred architecture flows into
    # the train config; params are transplanted after init below.
    bert_params = None
    bert_cfg = BertConfig(vocab_size=args.bert_vocab)
    if args.bert_checkpoint:
        from imagegenerator_tpu.models.bert import load_bert_checkpoint

        bert_params, bert_cfg = load_bert_checkpoint(args.bert_checkpoint)
        print(
            f"Loaded pretrained BERT: {bert_cfg.num_layers}L/"
            f"{bert_cfg.hidden_size}H vocab={bert_cfg.vocab_size}"
        )
    if (
        args.gelu != "exact" or args.fused_ln or args.fused_attn
        or args.dropout_bits is not None
    ):
        import dataclasses as _dc

        bert_cfg = _dc.replace(
            bert_cfg,
            gelu_approximate=args.gelu == "tanh" or bert_cfg.gelu_approximate,
            gelu_output_bwd=args.gelu == "exact_outbwd"
            or bert_cfg.gelu_output_bwd,
            fused_ln=args.fused_ln or bert_cfg.fused_ln,
            fused_attention=args.fused_attn or bert_cfg.fused_attention,
            # None = flag unset -> keep the (checkpoint) config; an
            # explicit value — INCLUDING 32 — always wins, so the exact
            # nn.Dropout bitstream stays CLI-reachable over a narrower
            # checkpoint config (review round 5)
            dropout_bits=args.dropout_bits
            if args.dropout_bits is not None
            else bert_cfg.dropout_bits,
        )

    common = dict(
        tem_size=args.tem_size,
        c_dim=args.c_dim,
        z_dim=args.z_dim,
        nd=args.nd,
        n_critic=args.n_critic,
        lambda_gp=args.lambda_gp,
        kl_mode=args.kl_mode,
        seq_len=args.seq_len,
        compute_dtype=dtype,
        bert=bert_cfg,
    )

    # config first — the dataset image size follows cfg.resolution (tiny
    # configs run a genuinely small pyramid)
    tiny_kw = dict(n_critic=args.n_critic)
    if bert_params is not None:
        # tiny + pretrained checkpoint: tiny GAN, real encoder
        # architecture (the converter smoke-test path)
        tiny_kw.update(bert=bert_cfg, seq_len=args.seq_len)
    if args.stage == 1:
        s1_kw = {}
        if args.text_reuse_mis:
            s1_kw["text_reuse_mismatched"] = True
        cfg = (
            s1.Stage1Config.tiny(**tiny_kw, **s1_kw)
            if args.tiny
            else s1.Stage1Config(
                lr=args.lr, encoder_lr=args.encoder_lr, **common, **s1_kw
            )
        )
    else:
        cfg = (
            s2.Stage2Config.tiny(**tiny_kw)
            if args.tiny
            else s2.Stage2Config(lr=args.lr, **common)
        )

    store = open_store(args.data)
    host_count = jax.process_count()
    dataset = CocoCaptions(
        store,
        args.root,
        args.ann_file,
        image_size=cfg.resolution,
        host_index=jax.process_index(),
        host_count=host_count,
        image_dtype=args.image_dtype,
    )
    from imagegenerator_tpu.data.tokenizer import make_tokenizer

    tokenizer = make_tokenizer(args.tokenizer, args.seq_len, cfg)
    # Each process builds only its addressable share of the global batch;
    # the loader assembles the global array via
    # make_array_from_process_local_data (see data/pipeline.py).
    # batch_size is per DATA-parallel shard (the reference's per-core
    # batch); model-parallel ranks share their shard's batch.
    local_batch = args.batch_size * max(1, jax.local_device_count() // args.tp)
    loader = DataLoader(
        dataset, tokenizer, batch_size=local_batch, seed=args.seed, mesh=mesh
    )

    options = TrainerOptions(
        num_epochs=args.num_epochs,
        seed=args.seed,
        rng_impl=args.rng_impl,
        checkpoint_dir=f"{args.checkpoint_dir}/Stage{args.stage}",
        logdir=args.logdir,
        ema_decay=args.ema,
    )

    import contextlib

    from imagegenerator_tpu.utils.profiling import trace

    prof = trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()

    if args.stage == 1:
        system = s1.Stage1System(cfg)
        trainer = Stage1Trainer(system, loader, options, mesh=mesh)
        state, start_epoch = trainer.init_state(args.batch_size)
        if bert_params is not None and start_epoch == 0:
            # transplant the pretrained encoder (fresh runs only — a
            # resumed checkpoint already carries the fine-tuned weights)
            state = state.replace(
                params={**state.params, "encoder": bert_params}
            )
            if mesh is not None:
                state = (
                    s1.shard_state_2d(state, mesh)
                    if "model" in mesh.axis_names
                    else s1.replicate_state(state, mesh)
                )
        with prof:
            trainer.fit(state, start_epoch)
    else:
        system = s2.Stage2System(cfg)
        trainer = Stage2Trainer(system, loader, options, mesh=mesh)
        stage1_state = None
        if args.stage1_checkpoint:
            from imagegenerator_tpu.checkpoint import CheckpointManager

            s1_cfg = (
                s1.Stage1Config.tiny(**tiny_kw)
                if args.tiny
                else s1.Stage1Config(lr=args.lr, encoder_lr=args.encoder_lr, **common)
            )
            s1_sys = s1.Stage1System(s1_cfg)
            template = s1_sys.init(jax.random.key(0), args.batch_size)
            stage1_state, _ = CheckpointManager(
                args.stage1_checkpoint
            ).restore_latest(template)
        state, start_epoch = trainer.init_state(args.batch_size, stage1_state)
        if bert_params is not None and start_epoch == 0 and stage1_state is None:
            # no stage-1 checkpoint to inherit from: freeze the pretrained
            # encoder directly
            state = state.replace(
                frozen_params={**state.frozen_params, "encoder": bert_params}
            )
            if mesh is not None:
                state = s1.replicate_state(state, mesh)
        with prof:
            trainer.fit(state, start_epoch)


if __name__ == "__main__":
    main()
