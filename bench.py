"""Benchmark suite for the framework's headline workloads.

Default run (round 5 restructure — VERDICT.md round-4 next #1/#2): an
ORCHESTRATOR process runs each bench as its own watchdogged subprocess,
HEADLINES FIRST — stage2, stage1, v2, then the variants (stage1 golden/
fast/fast+reuse, v2 batched), host and e2e LAST. A bench that hangs or
dies is killed at its per-bench timeout and emits an explicit
``{"metric": <target>, "error": "timeout", ...}`` JSON line; the run
CONTINUES, so one sick bench can no longer starve the headline metrics
(round 4's e2e hang emptied ``BENCH_r04.json`` of every device number).
Every metric line carries cumulative ``elapsed_s`` so a truncated tail
is diagnosable on its own. The stage-2 headline is re-emitted as the
FINAL line (the driver's single-line parse reads the last line). The
subprocess-per-bench shape is the one the round-4 judge demonstrated
healthy: individual BENCH_TARGET runs completed in the same session
where the monolithic run hung. Children pass the measured session
roofline forward via BENCH_SESSION_ROOFLINE so only the first probes.
Children heartbeat phase starts to stderr and arm
``faulthandler.dump_traceback_later`` just under their timeout, so any
future hang names its stack in the driver log instead of dying silent.
Host-bound metrics carry host_spin_ms (the host-speed probe — e2e and
host-pipeline numbers scale with it). Every number is
the MEDIAN of BENCH_REPS timed windows with the min/max spread recorded
(VERDICT.md round-2: single-window best-case numbers did not reproduce).

Headline policy (VERDICT.md round-3 next #2): training headlines run
the FASTEST config whose function semantics are identical to the
HF/reference math — exact-erf GELU + fused Pallas attention + rbg step
keys + 16-bit dropout mask draws. Only the noise BITSTREAMS differ
from threefry/XLA (no JAX bitstream was ever faithful to the
reference's torch CPU-generator noise, so bitstream identity is a
goldens/test concern), plus the dropout keep-prob grid: 2^-16 instead
of nn.Dropout's 2^-24 (rate 0.100006 vs 0.1, rescale exact — the same
class of quantization any finite draw imposes). The pinned
threefry+XLA+32-bit config stays as the *_golden metrics.

Workloads (all reference-shaped):
  host    synthetic ~640px JPEGs decoded+resized+collated through the
          DataLoader (reference data_loader.py:97-106 + train.py:126-132)
  stage1  64px WGAN-GP train step, in-step fine-tuned BERT, n_critic=5
          (reference stage_1_train_fn.py)
  v2      VQGAN-CLIP latent-opt steps/sec, full-size f16-16384 VQGAN +
          ViT-B/32, 128px, 32 cutouts, display_freq iterations chained
          into ONE dispatch (reference generate.py:167-180); the
          batched variant packs 4 prompts per step (config 5)
  stage2  256px refinement train step (reference stage_2_train_fn.py)
  e2e     stage-2 training fed by the real DataLoader over in-memory
          JPEGs — decode in the loop

Env knobs:
  BENCH_TARGET (default all) all | stage2 | stage2_golden | stage1 |
               stage1_golden | stage1_fast | stage1_fast_reuse | v2 |
               v2_batched | host | e2e (stage1_fast = tanh GELU on top
               of the headline config, the recommended from-scratch
               training setting; stage1_fast_reuse adds the
               mismatched-embedding reuse). Comma-separated lists run
               in-process in the given order
  BENCH_SUBPROC (default 1) 1 = the default "all" run orchestrates one
               watchdogged subprocess per bench; 0 = legacy in-process
               sequential run (SIGALRM-guarded, best-effort)
  BENCH_BUDGET_S (default 840) total wall budget for the "all" run;
               benches that would not fit emit a skipped_budget line.
               Sized to self-terminate (rc 0, explicit skip/timeout
               lines) under the driver's external kill — round 4's
               artifact died rc 124 with zero device metrics; a
               truncated-but-explicit tail always beats an opaque kill
  BENCH_SUB_TIMEOUT override every per-bench watchdog timeout (seconds)
  BENCH_SESSION_ROOFLINE (set by the orchestrator) adopt this roofline
               instead of probing; BENCH_CHILD_TIMEOUT (ditto) arms the
               child's pre-kill faulthandler stack dump
  BENCH_BATCH  per-chip batch (stage2/e2e default 256 = measured best;
               stage1 default 128; v2 default 1, v2_batched default 4)
  BENCH_PRECOMPUTED (default 1) stage2 caption embeddings precomputed
               offline (the frozen-encoder production design; 0 times
               the in-step BERT forward instead)
  BENCH_STEPS  (default 8)  steps per timed window (stage1/stage2)
  BENCH_REPS   (default 5; variant targets default 3) timed windows
               per metric (median reported, min/max spread recorded)
  BENCH_CHAIN  (default 20) v2 iterations per dispatch (display_freq)
  BENCH_DTYPE  (default bf16) compute dtype: bf16 | f32
  BENCH_GELU   text-encoder GELU: exact (HF-faithful erf; golden
               default) | exact_outbwd (same bit-identical forward,
               backward recovers the CDF from the saved output instead
               of re-running erf — ops/gelu.py; headline default,
               +3.9% whole-step) | tanh (approximation, ~9% faster
               than exact; fastpath default)
  BENCH_RNG    step-key PRNG impl: threefry (golden default) | rbg
               (headline default; deterministic, different bitstream,
               measured faster mask/noise generation). The *_golden
               variants IGNORE BENCH_RNG/BENCH_GELU/BENCH_ATTN/BENCH_LN
               — their config is frozen by definition
  BENCH_LN     (default xla) text-encoder LayerNorm impl: xla | pallas
               (fused one-pass LayerNorm VJP kernel,
               ops/pallas/layernorm.py)
  BENCH_ATTN   text-encoder attention impl: xla (golden default) |
               pallas (headline default: fused QK^T+softmax+dropout+PV
               kernel with recompute backward, ops/pallas/attention.py)
  BENCH_DROPOUT_BITS mask-draw width for the text encoder's
               hidden-dropout sites: 32 (nn.Dropout; golden default) |
               16 (headline default since round 5, +3.5%) | 8 (fastpath
               default, +4.3%) — ops/dropout.py narrow-bits draw halves/
               quarters the non-fusible RngBitGenerator HBM traffic;
               unbiased, keep prob quantized to 2^-bits
  BENCH_TEXT_REUSE (default 0) 1 = stage-1 mismatched pairs reuse the
               matched embeddings (tem_mis = tem[perm]; halves the
               text-encoder cost; under dropout the mismatched pair
               shares its twin's dropout sample)
"""

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

_T0 = time.monotonic()


def _hb(msg: str):
    """Phase heartbeat to stderr (VERDICT.md round-4 next #2): a hang
    anywhere in a bench names its last-started phase in the driver log
    instead of producing 900 s of silence."""
    print(f"[bench hb {time.monotonic() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _fence(tree):
    # On the tunneled axon platform block_until_ready does not
    # synchronize; a host readback of a live scalar is the fence.
    import numpy as np

    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


# variant/e2e benches default to 3 timed windows (median+spread still
# recorded) so the whole default run fits the BENCH_BUDGET_S=840 window
# with margin; the three HEADLINES and host keep 5. BENCH_REPS overrides
# everything.
_SHORT_REPS_TARGETS = {
    "stage1_golden", "stage1_fast", "stage1_fast_reuse",
    "stage2_golden", "v2_batched",
}


def _reps() -> int:
    env = os.environ.get("BENCH_REPS")
    if env:
        return max(1, int(env))
    if os.environ.get("BENCH_TARGET") in _SHORT_REPS_TARGETS:
        return 3
    return 5


def _median_stats(per_step_samples: list) -> tuple:
    """Median seconds/step over the timed windows + spread extras."""
    med = statistics.median(per_step_samples)
    return med, {
        "windows": len(per_step_samples),
        "spread_per_step_ms": [
            round(s * 1e3, 3) for s in sorted(per_step_samples)
        ],
    }


def _emit(metric, value, unit, **extra):
    vs_baseline = 1.0
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")) as f:
            base = json.load(f)
        if base.get("metric") == metric and base.get("value"):
            vs_baseline = value / float(base["value"])
    except (OSError, ValueError):
        pass
    record = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 4),
        # cumulative process-elapsed seconds: any truncated tail is
        # diagnosable from the lines alone (the orchestrator rewrites
        # this with ITS cumulative clock when forwarding child lines)
        "elapsed_s": round(time.monotonic() - _T0, 1),
    }
    record.update(extra)
    _LAST_RECORDS[metric] = record
    print(json.dumps(record), flush=True)


# last record per metric name, for the in-process all-run's final
# stage-2 headline re-emit (the driver parses the LAST line)
_LAST_RECORDS: dict = {}


# bf16 matmul peak per chip, by device_kind substring (the roofline
# denominators for the MFU number; BENCH_PEAK_TFLOPS overrides).
_PEAK_TFLOPS = (
    ("v5 lite", 197.0),  # v5e
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v6", 918.0),  # Trillium
    ("v4", 275.0),
    ("v3", 123.0),
)


def _peak_flops() -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for sub, tf in _PEAK_TFLOPS:
        if sub in kind:
            return tf * 1e12
    return 0.0  # unknown device: mfu omitted


_ROOFLINE_CACHE = []


def _session_roofline() -> float:
    """Achievable bf16 GEMM TFLOP/s on THIS chip RIGHT NOW (chained
    8192^3 matmuls, readback-fenced), cached per process and emitted
    once as its own metric line.

    Why: the tunneled chip is shared; its deliverable rate varies by
    session (measured 121-190 TFLOP/s on the same nominal v5e across
    days). MFU against the 197 paper peak therefore conflates code
    quality with chip state. Each metric also records
    pct_of_session_roofline — the fraction of what the chip could
    actually deliver in the same session — which IS comparable across
    sessions. Skipped on CPU (mfu is meaningless there)."""
    if _ROOFLINE_CACHE:
        return _ROOFLINE_CACHE[0]
    env_roof = os.environ.get("BENCH_SESSION_ROOFLINE")
    if env_roof:
        # orchestrator passes the first child's measured roofline to the
        # rest: same session, one probe, one context line
        _ROOFLINE_CACHE.append(float(env_roof))
        return _ROOFLINE_CACHE[0]
    if jax.default_backend() == "cpu" or os.environ.get("BENCH_ROOFLINE") == "0":
        _ROOFLINE_CACHE.append(0.0)
        return 0.0
    import numpy as np

    _hb("roofline probe: first device dispatch + readback")
    n, reps = 8192, 10
    k = jax.random.key(0)
    a = jax.random.normal(k, (n, n), jnp.bfloat16)
    b = jax.random.normal(k, (n, n), jnp.bfloat16)
    f = jax.jit(lambda x, y, s: (x @ y) * s)
    _ = np.asarray(f(a, b, 1.0)[0, :8])  # warm + fence
    _hb("roofline probe: first readback done, timing")
    best = 0.0
    for _trial in range(2):
        t0 = time.perf_counter()
        c = a
        for i in range(reps):
            c = f(c, b, 1.0 + i * 1e-6)  # distinct scalar defeats caching
        _ = np.asarray(c[0, :8])
        dt = time.perf_counter() - t0
        best = max(best, 2 * n**3 * reps / dt / 1e12)
    _ROOFLINE_CACHE.append(best)
    peak = _peak_flops()
    _emit(
        "session_gemm_roofline_tflops",
        best,
        "TFLOP/s",
        **({"pct_of_paper_peak": round(100 * best * 1e12 / peak, 1)} if peak else {}),
    )
    return best


def _mfu_extras(compiled, per_exec_seconds: float, steps_per_exec: int = 1) -> dict:
    """MFU + achieved TFLOP/s from the compiled executable's own cost
    analysis (per-execution FLOPs of the optimized HLO — exact for the
    fully-unrolled critic loop / chained scan)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        return {}
    if flops <= 0:
        return {}
    achieved = flops / per_exec_seconds
    extras = {
        "flops_per_step": flops / steps_per_exec,
        "tflops_per_sec": round(achieved / 1e12, 2),
    }
    peak = _peak_flops()
    if peak > 0:
        extras["mfu"] = round(achieved / peak, 4)
    roof = _session_roofline()
    if roof > 0:
        extras["pct_of_session_roofline"] = round(achieved / 1e10 / roof, 1)
    return extras


def _v2_setup(batch, chain, rng_impl):
    """Build the BENCH_V2-shaped workload: full-size f16-16384 VQGAN +
    ViT-B/32 engine, ``batch`` prompt sets, ``chain`` iterations
    AOT-compiled as ONE dispatch. Shared by bench_v2 and
    tools/profile_opclass.py so the profile always traces exactly the
    workload the headline measures. Returns (engine, compiled, state,
    (vq_params, clip_params, embeds, weights, stops), key_fn)."""
    import numpy as np

    from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
    from imagegenerator_tpu.v2.engine import GenerateEngine
    from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel

    dtype = (
        jnp.bfloat16
        if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )

    def _key(i):
        return _bench_key(i, rng_impl)

    vq_cfg = VQGANConfig.imagenet_f16_16384()
    clip_cfg = CLIPConfig.vit_b32()
    # jitted inits: eager flax init of the full models is thousands of
    # small dispatches — minutes over a tunneled chip, one graph under jit
    vq_params = jax.jit(
        lambda k: VQModel(vq_cfg).init(k, jnp.zeros((1, 256, 256, 3)))[
            "params"
        ]
    )(jax.random.key(0))
    clip_params = jax.jit(
        lambda k: CLIP(clip_cfg).init(
            k,
            jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32),
        )["params"]
    )(jax.random.key(1))

    engine = GenerateEngine(
        vqgan_config=vq_cfg,
        clip_config=clip_cfg,
        vqgan_params=vq_params,
        clip_params=clip_params,
        cutn=32,
        step_size=0.1,
        compute_dtype=dtype,
    )
    h = w = 128 // vq_cfg.f
    z = engine.random_token_latent(_key(2), batch, h, w)
    state = engine.init_state(z)
    embeds = jnp.zeros((batch, 1, clip_cfg.embed_dim))
    weights = jnp.ones((batch, 1))
    stops = jnp.full((batch, 1), -np.inf)

    # AOT-compile the chained step for the executable-level FLOPs count
    chain_fn = type(engine)._chain_impl
    compiled = chain_fn.lower(
        engine, vq_params, clip_params, state, chain, _key(3),
        embeds, weights, stops,
    ).compile()
    return engine, compiled, state, (vq_params, clip_params, embeds, weights, stops), _key


def bench_v2(batched: bool = False):
    """VQGAN-CLIP latent-opt steps/sec: full-size f16-16384 VQGAN +
    ViT-B/32 (random-init weights — same FLOPs as published ckpts),
    128x128 image, 32 cutouts, Adam on z — the reference's default
    workload (arg_parser.py defaults). BENCH_CHAIN (= display_freq)
    iterations run as ONE dispatch via lax.scan, exactly like the
    production ``GenerateEngine.run`` driver: the ~12 ms single step was
    dispatch-latency-exposed over the tunnel, which is why the round-2
    single-step numbers didn't reproduce (VERDICT.md weak #1).

    ``batched=True`` (or BENCH_BATCH>1) runs B prompts in one step — the
    multi-prompt packing shape of BASELINE.json config 5 — and reports
    prompt-steps/sec under its own metric name, so the "packing is
    throughput-neutral" claim is driver-captured instead of prose
    (VERDICT.md round-3 next #6)."""
    chain = int(os.environ.get("BENCH_CHAIN", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "4" if batched else "1"))
    # typed keys carry their impl, so the run key's PRNG governs EVERY
    # in-step draw (cutout geometry, augmentation bits, per-pixel noise
    # normals); BENCH_RNG overrides (same semantics as the train benches).
    # rbg is the headline default, matching the training headline policy:
    # same math, different noise bitstream, measured ~1% faster
    rng_impl = _rng_impl("rbg")
    _, compiled, state, (vq_params, clip_params, embeds, weights, stops), _key = (
        _v2_setup(batch, chain, rng_impl)
    )

    state, losses = compiled(
        vq_params, clip_params, state, _key(3), embeds, weights, stops
    )
    _fence(losses)

    # Window = several back-to-back chain dispatches per fence: async
    # dispatch hides the tunnel round-trip behind device compute, exactly
    # like the production run() loop (which enqueues the next chain
    # before fetching checkin tensors).
    chains_per_window = int(os.environ.get("BENCH_V2_CHAINS", "3"))
    samples = []
    for r in range(_reps()):
        t0 = time.perf_counter()
        for w in range(chains_per_window):
            state, losses = compiled(
                vq_params, clip_params, state,
                jax.random.fold_in(_key(4), r * 131 + w),
                embeds, weights, stops,
            )
        _fence(losses)
        samples.append((time.perf_counter() - t0) / (chain * chains_per_window))
    med, stats = _median_stats(samples)
    # XLA's executable cost analysis counts a lax.scan (while-loop) BODY
    # once, not trip-count times — verified: the chain executable reports
    # the same ~719 GFLOP as one unchained step — so flops are already
    # per-iteration and pair with the per-step time. Under
    # IMAGEGEN_CHAIN_UNROLL>1 the counted flops hold ``unroll``
    # iterations PLUS the chain%unroll remainder lax.scan unrolls
    # outside the loop (and the whole chain when unroll >= chain);
    # steps_per_exec rescales by the actually-counted iterations.
    unroll = max(1, int(os.environ.get("IMAGEGEN_CHAIN_UNROLL", "1")))
    counted = chain if unroll >= chain else unroll + chain % unroll
    name = (
        "vqgan_clip_batched_steps_per_sec"
        if batch > 1
        else "vqgan_clip_latent_opt_steps_per_sec"
    )
    _emit(
        name,
        batch / med,
        "steps/sec" if batch == 1 else "prompt-steps/sec",
        chain=chain,
        batch=batch,
        **stats,
        **_mfu_extras(compiled, med * counted, steps_per_exec=counted),
    )


def _timed_step_windows(compiled, state, data, steps, rng_impl=None):
    """Median per-step seconds over BENCH_REPS windows of ``steps`` calls
    (async dispatch: only the final fence synchronizes each window)."""
    samples = []
    for r in range(_reps()):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = compiled(
                state, data, jax.random.fold_in(_bench_key(3 + r, rng_impl), i)
            )
        _fence(metrics)
        samples.append((time.perf_counter() - t0) / steps)
    return samples, state


def _bench_key(seed: int, impl: str | None = None):
    """Step key with an explicit PRNG impl ('rbg' is the fast
    deterministic alternative to threefry — the key array carries its
    impl, so the step lowers for whichever is passed). ``impl`` must be
    the ALREADY-RESOLVED value from ``_rng_impl`` (which applies the
    BENCH_RNG override exactly once); this function does not re-read the
    environment."""
    return jax.random.key(seed, impl=impl) if impl else jax.random.key(seed)


def _rng_impl(default: str | None) -> str | None:
    """Resolve the step-key PRNG impl: BENCH_RNG overrides the variant
    default; '' / 'threefry' mean the threefry default."""
    env = os.environ.get("BENCH_RNG")
    if env is not None:
        default = env
    return None if default in (None, "", "threefry") else default


def _bench_bert_cfg(gelu="exact", ln="xla", attn="xla", pinned=False,
                    dropout_bits=32):
    """Text-encoder config for the training benches, from per-variant
    defaults; BENCH_GELU / BENCH_LN / BENCH_ATTN override — UNLESS
    ``pinned=True`` (the *_golden variants), where the whole point of
    the metric is a frozen config: env overrides are ignored so a
    stray BENCH_* left set during a BENCH_TARGET=all run cannot emit a
    different config under the golden name and mask a regression in
    the actually-pinned path. gelu=tanh is the approximation (~9%
    faster stage-1 step, ~1e-3 from HF SpanBERT's exact erf —
    BertConfig.gelu_approximate); attn=pallas is the fused attention
    kernel (identical function semantics, different dropout bitstream —
    ops/pallas/attention.py)."""
    import dataclasses

    from imagegenerator_tpu.models.bert import BertConfig

    cfg = BertConfig()
    if not pinned:
        gelu = os.environ.get("BENCH_GELU", gelu)
        ln = os.environ.get("BENCH_LN", ln)
        attn = os.environ.get("BENCH_ATTN", attn)
        dropout_bits = int(
            os.environ.get("BENCH_DROPOUT_BITS", str(dropout_bits))
        )
    if gelu == "tanh":
        cfg = dataclasses.replace(cfg, gelu_approximate=True)
    elif gelu == "exact_outbwd":
        cfg = dataclasses.replace(cfg, gelu_output_bwd=True)
    if ln == "pallas":
        cfg = dataclasses.replace(cfg, fused_ln=True)
    if attn == "pallas":
        cfg = dataclasses.replace(cfg, fused_attention=True)
    if dropout_bits != 32:
        cfg = dataclasses.replace(cfg, dropout_bits=dropout_bits)
    return cfg


def _stage1_setup(batch, fastpath=False, reuse=False, golden=False):
    """Build + AOT-compile the stage-1 train step for a bench variant
    (headline / fastpath / reuse / golden — see bench_stage1). Shared
    with tools/profile_opclass.py so training profiles trace exactly the
    benched workloads. Returns (rng_impl, state, data, compiled)."""
    from imagegenerator_tpu.train.stage1 import (
        Stage1Config,
        Stage1System,
        make_train_step,
    )

    unroll = int(os.environ.get("BENCH_UNROLL", "5"))
    dtype = (
        jnp.bfloat16
        if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
        else jnp.float32
    )
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    if golden:
        # fully pinned: env overrides ignored, threefry keys always —
        # the golden series only means anything if its config is frozen
        bert_cfg = _bench_bert_cfg(gelu="exact", attn="xla", pinned=True)
        rng_impl = None
    else:
        # headline GELU = exact_outbwd: bit-identical exact-erf forward;
        # the backward recovers the CDF from the saved gelu output
        # instead of re-running the erf polynomial (ops/gelu.py) —
        # +3.9% whole-step, same-session A/B 618.3 -> 642.5 img/s.
        # headline dropout_bits = 16 (round 5, +3.5%: 649.4 -> 672.0
        # same-session): mask draws come from uint16 RngBitGenerator
        # output — half the non-fusible mask-bits HBM traffic — with the
        # keep prob quantized to 2^-16 (0.100006 vs 0.1) and the rescale
        # exact, the same class of rate quantization nn.Dropout's own
        # f32-uniform comparison applies at 2^-24. fastpath adds bits=8
        # (+4.3%: 676.9; rate 0.1016 — a 1.6% effective-rate nudge,
        # in keeping with that variant's tanh-GELU approximation).
        bert_cfg = _bench_bert_cfg(
            gelu="tanh" if fastpath else "exact_outbwd", attn="pallas",
            dropout_bits=8 if fastpath else 16,
        )
        rng_impl = _rng_impl("rbg")
    reuse_cfg = (
        True
        if reuse or os.environ.get("BENCH_TEXT_REUSE", "0") == "1"
        else None
    )
    cfg = Stage1Config(
        compute_dtype=dtype, unroll_critic=unroll, remat=remat,
        bert=bert_cfg, text_reuse_mismatched=reuse_cfg,
    )
    system = Stage1System(cfg)
    # jit the init: eager flax init of BERT-base is thousands of small
    # dispatches — minutes over a tunneled chip, one graph under jit.
    state = jax.jit(system.init, static_argnums=1)(jax.random.key(0), batch)
    kt, ki = jax.random.split(jax.random.key(1))
    data = {
        "input_ids": jax.random.randint(
            kt, (batch, cfg.seq_len), 0, cfg.bert.vocab_size
        ),
        "attention_mask": jnp.ones((batch, cfg.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki, (batch, 64, 64, 3), jnp.float32, minval=-1, maxval=1
        ),
    }
    step = make_train_step(system, donate=True)
    compiled = step.lower(state, data, _bench_key(2, rng_impl)).compile()
    return rng_impl, state, data, compiled


def bench_stage1(fastpath: bool = False, reuse: bool = False, golden: bool = False):
    """Stage-I 64px train step (BASELINE.json configs 1-2): full text
    encoder fine-tuning inside the GAN step, n_critic=5, images/sec/chip.

    Variants (VERDICT.md round-3 next #2 — the headline is the FASTEST
    config whose function semantics are identical to HF SpanBERT):

    * default (headline): exact-erf GELU (output-recovered backward,
      ops/gelu.py — forward bit-identical to exact; the backward is the
      same exact formula with the CDF term at the saved output's bf16
      precision) + fused Pallas attention + rbg step keys. Only the
      dropout/noise BITSTREAMS differ from threefry/XLA — and no JAX
      bitstream was ever faithful to the reference's torch
      CPU-generator noise (stage_1_train_fn.py:98-106), so bitstream
      identity is a regression-test concern, not a benchmark one.
    * ``golden=True``: exact GELU + XLA attention + threefry — the
      bitstream-pinned config the goldens/tests pin, kept as its own
      metric for regression tracking.
    * ``fastpath=True``: + tanh GELU (the approximation, ~1e-3 off) —
      the recommended from-scratch-training setting.
    * ``reuse=True``: + mismatched pairs share the matched-caption
      embeddings (tem_mis = tem[perm], halves the text-encoder FLOPs —
      semantics note in Stage1Config).
    """
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    rng_impl, state, data, compiled = _stage1_setup(
        batch, fastpath=fastpath, reuse=reuse, golden=golden
    )
    state, metrics = compiled(state, data, _bench_key(2, rng_impl))
    _fence(metrics)

    samples, state = _timed_step_windows(compiled, state, data, steps, rng_impl)
    med, stats = _median_stats(samples)
    # name derives from the EFFECTIVE config: BENCH_TEXT_REUSE=1 makes
    # reuse apply to any stage-1 target, and the metric name must say so
    # (a reuse-accelerated number under the faithful name would corrupt
    # baseline tracking)
    if fastpath:
        name = "stage1_64px_fastpath"
    elif golden:
        name = "stage1_64px_train_golden"
    else:
        name = "stage1_64px_train"
    if reuse or os.environ.get("BENCH_TEXT_REUSE", "0") == "1":
        name += "_reuse"
    name += "_images_per_sec_per_chip"
    _emit(
        name,
        batch / med,
        "images/sec/chip",
        **stats,
        **_mfu_extras(compiled, med),
    )


def _build_mem_jpeg_dataset(n: int, src_px: int = 640):
    """Synthetic COCO-like store: n JPEGs + caption annotations."""
    import io

    import numpy as np
    from PIL import Image

    from imagegenerator_tpu.data import open_store

    store = open_store("mem://bench-host")
    rng = np.random.default_rng(0)
    images, anns = [], []
    # photographic-like content (smooth upscaled low-freq), not raw
    # noise: noise JPEGs are unrealistically slow to decode AND the
    # fast-DCT parity caveat only applies to noise (data/coco.py)
    for i in range(n):
        small = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        img = np.asarray(
            Image.fromarray(small).resize((src_px, src_px), Image.BICUBIC)
        )
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        store.write_bytes(f"imgs/{i}.jpg", buf.getvalue())
        images.append({"id": i, "file_name": f"{i}.jpg"})
        anns.append({"image_id": i, "caption": f"a synthetic benchmark photo {i}"})
    store.write_text(
        "ann/captions.json",
        json.dumps({"images": images, "annotations": anns}),
    )
    return store


def _host_spin_ms() -> float:
    """Host-speed probe (the host analogue of the GEMM roofline probe):
    a fixed pure-Python spin, median of 3. This shared 1-vCPU VM's
    deliverable CPU rate varies ~1.6x between seconds (measured on a
    GC-free tight loop with zero steal/iowait reported), which is the
    true source of the host-bound metrics' spread — recorded so a slow
    number is attributable to the host, not the pipeline."""

    def _spin():
        t0 = time.perf_counter()
        x = 0
        for i in range(500_000):
            x += i * i
        return time.perf_counter() - t0

    return round(statistics.median(_spin() for _ in range(3)) * 1e3, 2)


def bench_host():
    """Host data-pipeline throughput: synthetic ~640px JPEGs (COCO-like)
    decoded + resized + tokenized + collated through the DataLoader's
    cross-batch pipeline — no device compute. This is the feed rate the
    device-side img/s headline must be sustained by
    (reference prefetch stack: data_loader.py:97-106 + train.py:126-132).
    Since round 4 the production loader ships resampled uint8 (normalize
    happens on-device), so this measures the u8 path: less host work per
    image AND 4x fewer bytes stacked/collated."""
    from imagegenerator_tpu.data import CocoCaptions, DataLoader, HashTokenizer

    n = int(os.environ.get("BENCH_HOST_IMAGES", "768"))
    res = int(os.environ.get("BENCH_HOST_RES", "256"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    workers = int(os.environ.get("BENCH_HOST_WORKERS", "16"))

    store = _build_mem_jpeg_dataset(n)
    ds = CocoCaptions(store, "imgs", "ann/captions.json", image_size=res)
    tok = HashTokenizer(max_length=128)
    loader = DataLoader(ds, tok, batch_size=batch, num_workers=workers)

    # warm one epoch (thread pools, PIL caches), then time epochs.
    # Full BENCH_REPS windows like every other metric, plus the load
    # average: on a 1-core host this metric is contention-dominated
    # (a judge re-run under concurrent load measured 118 vs 282 img/s
    # — VERDICT.md round-3 weak #3), and loadavg_at_start is the
    # context needed to interpret a low number.
    try:
        loadavg = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg = None
    spin_ms = _host_spin_ms()
    for _ in loader._host_batches():
        pass
    samples = []
    for _ in range(_reps()):
        t0 = time.perf_counter()
        count = 0
        for b in loader._host_batches():
            count += b["image"].shape[0]
        samples.append((time.perf_counter() - t0) / count)  # sec/img
    med, stats = _median_stats(samples)
    ncores = os.cpu_count() or 1
    _emit(
        "host_pipeline_images_per_sec",
        1.0 / med,
        "images/sec",
        host_cores=ncores,
        images_per_sec_per_core=round(1.0 / med / ncores, 2),
        host_spin_ms=spin_ms,
        **({"loadavg_at_start": loadavg} if loadavg is not None else {}),
        **stats,
    )


def _stage2_setup(
    batch, dtype, unroll, precomputed, rng_impl=None, golden=False,
    image_dtype=jnp.float32,
):
    from imagegenerator_tpu.train.stage2 import (
        Stage2Config,
        Stage2System,
        make_train_step,
    )

    # attn default pallas + output-recovered GELU backward (the
    # semantics-identical fast config) — only the token path
    # (precomputed=0) runs BERT in-step, so this is inert for the
    # precomputed headline; golden PINS exact + XLA attention (env
    # overrides ignored — see _bench_bert_cfg)
    bert_cfg = _bench_bert_cfg(
        gelu="exact" if golden else "exact_outbwd",
        attn="xla" if golden else "pallas",
        pinned=golden,
        dropout_bits=32 if golden else 16,
    )
    cfg = Stage2Config(
        compute_dtype=dtype, unroll_critic=unroll, bert=bert_cfg
    )
    system = Stage2System(cfg)
    state = jax.jit(system.init, static_argnums=1)(jax.random.key(0), batch)
    kt, ki = jax.random.split(jax.random.key(1))
    batch_data = {
        "input_ids": jax.random.randint(
            kt, (batch, cfg.seq_len), 0, cfg.bert.vocab_size
        ),
        "attention_mask": jnp.ones((batch, cfg.seq_len), jnp.int32),
        "image": (
            jax.random.randint(ki, (batch, 256, 256, 3), 0, 256, jnp.uint8)
            if image_dtype == jnp.uint8
            else jax.random.uniform(
                ki, (batch, 256, 256, 3), jnp.float32, minval=-1, maxval=1
            )
        ),
    }
    if precomputed:
        # offline-embedded captions (frozen encoder => per-caption
        # constants; see Stage2System.embed_texts)
        tem = system.embed_texts(
            state, batch_data["input_ids"], batch_data["attention_mask"]
        )
        batch_data = {"tem": tem, "image": batch_data["image"]}
    batch_data = jax.device_put(batch_data)
    step = make_train_step(system, donate=True)
    compiled = step.lower(state, batch_data, _bench_key(2, rng_impl)).compile()
    return system, state, batch_data, compiled


def bench_stage2(golden: bool = False):
    """Stage-II 256px train step, the headline metric. Batch 256 is the
    measured best single-chip operating point (round-2 sweep in
    BASELINE.md: the 256px convs want the big batch, 224 misaligns the
    tiling, and past 256 HBM pressure wins); critic-loop unroll lets XLA
    overlap G2 forwards with critic backwards.

    Headline step keys default to rbg (same semantics, different noise
    bitstream — threefry bit-generation was measured VPU cost in
    stage-1, PROFILE_stage1_r03.md); ``golden=True`` pins threefry +
    XLA attention for regression tracking (BENCH_TARGET=stage2_golden)."""
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    unroll = int(os.environ.get("BENCH_UNROLL", "5"))
    dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )
    precomputed = os.environ.get("BENCH_PRECOMPUTED", "1") == "1"
    # golden: threefry always (BENCH_RNG ignored — pinned config)
    rng_impl = None if golden else _rng_impl("rbg")
    _, state, batch_data, compiled = _stage2_setup(
        batch, dtype, unroll, precomputed, rng_impl, golden
    )

    state, metrics = compiled(state, batch_data, _bench_key(2, rng_impl))
    _fence(metrics)
    samples, state = _timed_step_windows(compiled, state, batch_data, steps, rng_impl)
    med, stats = _median_stats(samples)
    name = (
        "stage2_256px_train_golden_images_per_sec_per_chip"
        if golden
        else "stage2_256px_train_images_per_sec_per_chip"
    )
    _emit(
        name,
        batch / med,
        "images/sec/chip",
        precomputed_tem=precomputed,
        **stats,
        **_mfu_extras(compiled, med),
    )


def bench_e2e():
    """End-to-end stage-2 training: the DataLoader decodes real (in-
    memory) JPEGs and feeds sharded device batches while the train step
    runs — decode in the loop, the round-2 gap (VERDICT.md next #3).

    Timed like bench_host: BENCH_REPS whole-EPOCH windows, after one
    full warm epoch. A single-pass window (the round-3 shape) measured
    a startup transient, not the pipeline: the loader's host_prefetch
    submits every batch of the small dataset at iterator start, so the
    first timed batches carry the entire decode backlog on this 1-core
    host and the last ones measure pure device rate with decode already
    finished — the number swung 15.6-87 at EQUAL host speed depending
    on thread-scheduling luck. Per-epoch windows re-decode every image
    (the loader caches nothing), so each window is the genuine sustained
    overlap of decode+transfer+step.

    TUNNEL CEILING (round-4 root cause, measured): the axon tunnel has
    two modes. Before the first device->host read, H2D streams at
    1.2-1.9 GB/s but ``block_until_ready`` does NOT synchronize (fences
    are broken); the FIRST D2H read of any size (even one scalar) hangs
    10-300 s establishing the reverse channel, after which fences work
    and D2H reads are fast — but H2D is permanently degraded to ~45
    MB/s for the life of the process (no recovery after 60 s idle or
    sustained put bursts; reproduced with fresh numpy f32/bf16/uint8
    arrays, independent of pytree shape, dict nesting, GIL contention,
    or prior executions). Honest timing requires working fences, so
    this bench necessarily runs in the degraded mode: the per-image
    transfer bytes are part of what this metric measures, and since
    round 4 the default path ships uint8 images normalized ON-DEVICE
    (50 MB/batch instead of the f32 path's 201 — BENCH_IMAGE_DTYPE=f32
    restores host-normalize; real PCIe hosts don't have this cliff).
    host_spin_ms records the 1-core host's CPU contention as context."""
    import numpy as np

    from imagegenerator_tpu.data import CocoCaptions, DataLoader, HashTokenizer
    from imagegenerator_tpu.data.text_cache import (
        PrecomputedTextDataset,
        TemCollate,
        precompute_caption_embeddings,
    )

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    unroll = int(os.environ.get("BENCH_UNROLL", "5"))
    # 4 batches/epoch (was 6): e2e keeps FIVE timed windows — its
    # window-to-window spread is the tunnel/host state it measures, so
    # a median-of-3 was too grabby — and pays for them with a smaller
    # (still sustained: 1024 imgs re-decoded per window) epoch
    nbatches = int(os.environ.get("BENCH_E2E_BATCHES", "4"))
    workers = int(os.environ.get("BENCH_HOST_WORKERS", "16"))
    dtype = (
        jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    )
    n_imgs = batch * nbatches

    # uint8 transfer + on-device normalize (the round-4 lever the tunnel
    # root-cause pointed at: 50 MB/batch of image payload instead of
    # 201). BENCH_IMAGE_DTYPE=f32 restores the host-normalize path.
    image_dtype = (
        jnp.float32
        if os.environ.get("BENCH_IMAGE_DTYPE", "u8") == "f32"
        else jnp.uint8
    )
    rng_impl = _rng_impl("rbg")  # match the headline stage-2 config
    _hb("e2e: stage-2 step build + compile")
    system, state, _, compiled = _stage2_setup(
        batch, dtype, unroll, True, rng_impl, image_dtype=image_dtype
    )

    _hb("e2e: synthetic JPEG dataset build")
    store = _build_mem_jpeg_dataset(n_imgs)
    ds = CocoCaptions(
        store,
        "imgs",
        "ann/captions.json",
        image_size=256,
        image_dtype="uint8" if image_dtype == jnp.uint8 else "float32",
    )
    tok = HashTokenizer(max_length=system.config.seq_len)

    _hb("e2e: caption-embedding precompute")
    tems = precompute_caption_embeddings(
        system.embed_texts,
        tok,
        [e.caption for e in ds.entries],
        system.config.tem_size,
        batch_size=batch,
        params=state,
    )
    loader = DataLoader(
        PrecomputedTextDataset(ds, tems),
        TemCollate(dtype=np.asarray(jnp.zeros(0, dtype)).dtype),
        batch_size=batch,
        num_workers=workers,
    )

    # warm epoch: the full path once (step already compiled; thread
    # pools, PIL caches, first device_puts)
    _hb("e2e: warm epoch (loader + device_put + steps)")
    metrics = None
    for i, dev_batch in enumerate(iter(loader)):
        state, metrics = compiled(
            state, dev_batch, jax.random.fold_in(_bench_key(2, rng_impl), i)
        )
    _fence(metrics)
    _hb("e2e: timed epoch windows")
    samples = []
    for r in range(_reps()):
        t0 = time.perf_counter()
        count = 0
        for i, dev_batch in enumerate(iter(loader)):
            state, metrics = compiled(
                state,
                dev_batch,
                jax.random.fold_in(_bench_key(3 + r, rng_impl), i),
            )
            count += batch
        _fence(metrics)
        samples.append((time.perf_counter() - t0) / count)  # sec/img
        _hb(f"e2e: window {r + 1}/{_reps()} done")
    med, stats = _median_stats(samples)
    e2e = 1.0 / med
    extras = {}
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")) as f:
            headline = float(json.load(f).get("value", 0.0))
        if headline > 0:
            extras["pct_of_synthetic_headline"] = round(100 * e2e / headline, 1)
    except (OSError, ValueError):
        pass
    extras["host_cores"] = os.cpu_count() or 1
    extras["host_spin_ms"] = _host_spin_ms()
    extras["transfer_dtype"] = "uint8" if image_dtype == jnp.uint8 else "float32"
    extras.update(stats)
    _emit("stage2_e2e_from_loader_images_per_sec", e2e, "images/sec", **extras)


_TARGET_FNS = {
    "v2": bench_v2,
    "v2_batched": lambda: bench_v2(batched=True),
    "stage1": bench_stage1,
    "stage1_golden": lambda: bench_stage1(golden=True),
    "stage1_fast": lambda: bench_stage1(fastpath=True),
    "stage1_fast_reuse": lambda: bench_stage1(fastpath=True, reuse=True),
    "host": bench_host,
    "e2e": bench_e2e,
    "stage2": bench_stage2,
    "stage2_golden": lambda: bench_stage2(golden=True),
}

# Default-run order: the three HEADLINES first (a late hang can no
# longer starve them — round 4's e2e hang left BENCH_r04.json with zero
# device metrics), variants next, host-bound last. Seconds are per-bench
# watchdog timeouts (BENCH_SUB_TIMEOUT overrides all): generous enough
# for a cold-compile-cache child (warm children finish in tens of
# seconds; the stage-2 b256 cold compile is the ~10-min outlier the
# persistent .jax_cache exists to amortize).
_DEFAULT_ORDER = [
    ("stage2", 480),
    ("stage1", 360),
    ("v2", 360),
    ("stage1_golden", 240),
    ("stage2_golden", 240),
    ("stage1_fast", 240),
    ("stage1_fast_reuse", 240),
    ("v2_batched", 240),
    ("host", 180),
    ("e2e", 360),
]
_HEADLINES = ("stage2", "stage1", "v2")


def _emit_error(target: str, error: str, **extra):
    record = {
        "metric": target,
        "error": error,
        "elapsed_s": round(time.monotonic() - _T0, 1),
    }
    record.update(extra)
    print(json.dumps(record), flush=True)


def _watchdog_setup():
    """Child-process hang forensics: crash tracebacks always on, plus a
    one-shot all-thread stack dump just before the orchestrator's kill
    lands (BENCH_CHILD_TIMEOUT), so a hung child names its line in
    stderr instead of dying silent (round 4's e2e hang: 900 s, zero
    output, ~0% CPU — VERDICT.md round-4 next #2)."""
    import faulthandler

    faulthandler.enable()
    t = os.environ.get("BENCH_CHILD_TIMEOUT")
    if t:
        faulthandler.dump_traceback_later(
            max(10.0, float(t) - 8.0), exit=False
        )


class _AlarmTimeout(Exception):
    pass


def _run_targets(targets, reemit_headline=False):
    """In-process bench runner (child mode / BENCH_SUBPROC=0 fallback).
    Multi-target runs guard each bench with SIGALRM (best-effort: a
    C-level hang that never returns to the interpreter can outlive it —
    the subprocess orchestrator is the hard line of defense).
    ``reemit_headline`` (the BENCH_SUBPROC=0 all-run) re-prints the
    stage-2 headline as the final line, preserving the driver's
    last-line parse contract that the orchestrator honors."""
    import signal

    _watchdog_setup()
    from imagegenerator_tpu.utils.cache import setup_compilation_cache

    _hb("backend init (first jax.devices call)")
    kind = jax.devices()[0].device_kind
    _hb(f"backend ready: {kind} ({jax.default_backend()})")
    # persistent compilation cache: repeat bench runs (e.g. the driver's
    # round-end run) skip the ~10-minute b256 stage-2 compile entirely.
    # Machine-scoped so a cache written elsewhere can't poison this host.
    setup_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    _session_roofline()  # chip-state context line first (no-op on CPU)
    use_alarm = (
        len(targets) > 1
        and hasattr(signal, "SIGALRM")
        and os.environ.get("BENCH_ALARM", "1") == "1"
    )
    per_bench = int(float(os.environ.get("BENCH_SUB_TIMEOUT", "0")) or 0)
    for t in targets:
        fn = _TARGET_FNS[t]
        # per-target env so helpers keyed on BENCH_TARGET (the variant
        # 3-window reps default) see the right name in-process too, not
        # just in orchestrator children
        os.environ["BENCH_TARGET"] = t
        _hb(f"bench {t}: start")
        if not use_alarm:
            fn()
            _hb(f"bench {t}: done")
            continue
        tmo = per_bench or dict(_DEFAULT_ORDER).get(t, 360)

        def _on_alarm(signum, frame):
            raise _AlarmTimeout()

        prev = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(tmo)
        try:
            fn()
            _hb(f"bench {t}: done")
        except _AlarmTimeout:
            _emit_error(t, "timeout", timeout_s=tmo, watchdog="sigalrm")
            _hb(f"bench {t}: SIGALRM timeout after {tmo}s — continuing")
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)
    if reemit_headline:
        headline = _LAST_RECORDS.get(
            "stage2_256px_train_images_per_sec_per_chip"
        )
        if headline is not None:
            headline = dict(headline)
            headline["reemitted_headline"] = True
            headline["elapsed_s"] = round(time.monotonic() - _T0, 1)
            print(json.dumps(headline), flush=True)
        else:
            _emit_error("stage2", "headline_missing")


def _child_argv() -> list:
    """Command line for a bench child process (separated for tests:
    the orchestrator tests substitute a scripted fake child)."""
    return [sys.executable, os.path.abspath(__file__)]


def _orchestrate():
    """Parent mode for BENCH_TARGET=all: one subprocess per bench,
    headline-first, per-bench kill timeouts, explicit error/skip lines,
    one retry for failed headlines, stage-2 headline re-emitted last
    (the driver parses the final JSON line). The parent never touches
    the device — children own the (exclusive, tunneled) TPU serially."""
    import subprocess
    import threading

    budget = float(os.environ.get("BENCH_BUDGET_S", "840"))
    sub_tmo = float(os.environ.get("BENCH_SUB_TIMEOUT", "0") or 0)
    results = {}
    roofline = [None]

    def _elapsed():
        return time.monotonic() - _T0

    def run_one(target: str, timeout_s: float, attempt: int = 1) -> bool:
        env = dict(os.environ)
        env["BENCH_TARGET"] = target
        env["BENCH_SUBPROC"] = "0"
        env["BENCH_CHILD_TIMEOUT"] = str(int(timeout_s))
        if roofline[0]:
            env["BENCH_SESSION_ROOFLINE"] = repr(roofline[0])
        _hb(f"launch {target} (timeout {int(timeout_s)}s)")
        proc = subprocess.Popen(
            _child_argv(),
            stdout=subprocess.PIPE,
            env=env,
            text=True,
        )
        metric_lines = []

        def reader():
            for line in proc.stdout:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    # keep parent stdout strictly JSON metric lines
                    print(f"[bench child {target}] {line}",
                          file=sys.stderr, flush=True)
                    continue
                if rec.get("metric") == "session_gemm_roofline_tflops":
                    if roofline[0] is not None:
                        continue  # one context line per run
                    roofline[0] = float(rec["value"])
                else:
                    metric_lines.append(rec)
                rec["elapsed_s"] = round(_elapsed(), 1)
                if attempt > 1:
                    # a failed first attempt may already have forwarded
                    # a metric line (e.g. emit-then-teardown-crash);
                    # mark retry lines so duplicate metric names stay
                    # distinguishable to an all-lines consumer
                    rec["attempt"] = attempt
                print(json.dumps(rec), flush=True)

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            th.join(5)
            _emit_error(target, "timeout", timeout_s=int(timeout_s),
                        watchdog="subprocess_kill")
            return False
        th.join(10)
        if rc != 0:
            _emit_error(target, f"child_exit_{rc}")
            return False
        if not metric_lines:
            _emit_error(target, "no_metric_output")
            return False
        results[target] = metric_lines[-1]
        return True

    order = list(_DEFAULT_ORDER)
    if int(os.environ.get("BENCH_BATCH", "1")) > 1:
        # BENCH_BATCH>1 makes bench_v2 itself the batched shape — the
        # separate variant would emit the same metric name twice
        order = [(t, s) for t, s in order if t != "v2_batched"]
    failed_headlines = []
    for target, tmo in order:
        tmo = sub_tmo or tmo
        remaining = budget - _elapsed()
        if remaining < 45:
            _emit_error(target, "skipped_budget", budget_s=budget)
            continue
        ok = run_one(target, min(tmo, remaining - 10))
        if not ok and target in _HEADLINES:
            failed_headlines.append((target, tmo))
    for target, tmo in failed_headlines:
        remaining = budget - _elapsed()
        if remaining < 60:
            _emit_error(target, "retry_skipped_budget", budget_s=budget)
            continue
        _hb(f"retry failed headline {target}")
        run_one(target, min(tmo, remaining - 10), attempt=2)
    headline = results.get("stage2")
    if headline is not None:
        headline = dict(headline)
        headline["reemitted_headline"] = True
        headline["elapsed_s"] = round(_elapsed(), 1)
        print(json.dumps(headline), flush=True)
    else:
        _emit_error("stage2", "headline_missing")


def main():
    target = os.environ.get("BENCH_TARGET", "all")
    if target == "all":
        if os.environ.get("BENCH_SUBPROC", "1") == "1":
            _orchestrate()
        else:
            _run_targets([t for t, _ in _DEFAULT_ORDER]
                         if int(os.environ.get("BENCH_BATCH", "1")) == 1
                         else [t for t, _ in _DEFAULT_ORDER
                               if t != "v2_batched"],
                         reemit_headline=True)
        return
    _run_targets([t.strip() for t in target.split(",") if t.strip()])


if __name__ == "__main__":
    main()
