"""Op-CLASS accounting of a workload's device self-time (round 4).

VERDICT.md round-3 next #1 asks where the v2 step's "~65% long tail"
lives, op-class-by-op-class: a top-op table proves nothing when no
single op exceeds 1.5% — the question is how much of the step is
convolution/dot (healthy MXU work) vs elementwise fusion, convert,
reduce, copy/transpose and RNG (everything that is NOT riding the MXU).

Captures a trace of the production chained v2 dispatch (or stage-1 /
stage-2 train steps; or parses an existing ``--xplane`` dir), feeds the
xplane through xprof's ``framework_op_stats``, and groups device
self-time by the HLO category column, printing per-class totals, the
top ops inside each class, and the class's share of total device time.

Usage:
    python tools/profile_opclass.py --workload v2 [--rng_impl rbg]
    python tools/profile_opclass.py --workload stage1|stage1_fast|stage2
    python tools/profile_opclass.py --xplane /tmp/trace_dir
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_v2(out_dir: str, rng_impl: str | None, chain: int, batch: int):
    """Trace BENCH_V2-shaped chained dispatches (the production path).

    The workload is built by ``bench._v2_setup`` — the SAME builder the
    headline bench uses — so the profile cannot drift from what
    ``vqgan_clip_latent_opt_steps_per_sec`` measures."""
    import jax

    import bench

    _, compiled, state, (vq_params, clip_params, embeds, weights, stops), key = (
        bench._v2_setup(batch, chain, rng_impl)
    )
    state, losses = compiled(vq_params, clip_params, state, key(3),
                             embeds, weights, stops)
    jax.block_until_ready(losses)
    with jax.profiler.trace(out_dir):
        for i in range(3):
            state, losses = compiled(vq_params, clip_params, state, key(4 + i),
                                     embeds, weights, stops)
        jax.block_until_ready(losses)
    flops = compiled.cost_analysis().get("flops", 0.0)
    print(f"trace captured ({3 * chain} iterations; "
          f"{flops / 1e9:.1f} GFLOP/iteration per cost analysis)")
    return 3 * chain  # device executions of the step body


def capture_train(out_dir: str, workload: str, batch: int | None):
    """Trace the stage-1 / stage-2 train step exactly as benched
    (``bench._stage1_setup`` / ``bench._stage2_setup`` — the same
    builders the headline metrics use). Returns device executions of
    the traced program (steps; each holds n_critic critic iterations)."""
    import jax
    import jax.numpy as jnp

    import bench

    if workload.startswith("stage1"):
        batch = batch or int(os.environ.get("BENCH_BATCH", "128"))
        rng_impl, state, data, compiled = bench._stage1_setup(
            batch,
            fastpath="fast" in workload,
            reuse="reuse" in workload,
            golden="golden" in workload,
        )
    else:  # stage2 (precomputed-tem headline config)
        batch = batch or int(os.environ.get("BENCH_BATCH", "256"))
        unroll = int(os.environ.get("BENCH_UNROLL", "5"))
        # honor BENCH_DTYPE like the stage1 builder does — the contract
        # is that profiles trace exactly the benched workload
        dtype = (
            jnp.bfloat16
            if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
            else jnp.float32
        )
        rng_impl = bench._rng_impl("rbg")
        _, state, data, compiled = bench._stage2_setup(
            batch, dtype, unroll, True, rng_impl
        )

    def key(i):
        return bench._bench_key(i, rng_impl)

    state, metrics = compiled(state, data, key(2))
    jax.block_until_ready(metrics)
    with jax.profiler.trace(out_dir):
        for i in range(3):
            state, metrics = compiled(state, data, key(3 + i))
        jax.block_until_ready(metrics)
    flops = compiled.cost_analysis().get("flops", 0.0)
    print(f"trace captured (3 steps of b{batch}; "
          f"{flops / 1e9:.1f} GFLOP/step per cost analysis)")
    return 3


def parse_opstats(trace_dir: str):
    """xplane -> list of dict rows from xprof framework_op_stats."""
    from xprof.convert import raw_to_tool_data as rtd

    planes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not planes:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    data_bytes, _ = rtd.xspace_to_tool_data(planes, "framework_op_stats", {})
    tables = json.loads(
        data_bytes if isinstance(data_bytes, str) else data_bytes.decode()
    )
    if isinstance(tables, dict):  # single-table variant
        tables = [tables]
    rows = []
    # first table = include-IDLE view; both carry the same columns. Use
    # the first only (the second is the exclude-IDLE duplicate).
    gviz = tables[0]
    cols = [c["label"] or c["id"] for c in gviz["cols"]]
    for r in gviz.get("rows", []):
        rows.append({c: (v["v"] if v else None)
                     for c, v in zip(cols, r["c"])})
    return rows


# HLO category -> op class. Everything not named here falls through to
# the category string itself (so nothing is silently dropped).
CLASS_OF = {
    "convolution": "conv/dot (MXU)",
    "convolution fusion": "conv/dot (MXU)",
    "output fusion": "conv/dot (MXU)",   # dot + fused epilogue
    "matmul": "conv/dot (MXU)",
    "dot": "conv/dot (MXU)",
    "loop fusion": "elementwise fusion (VPU)",
    "input fusion": "reduce fusion",
    "reduce": "reduce fusion",
    "rng": "rng",
    "rng-bit-generator": "rng",
    "copy": "copy/transpose",
    "transpose": "copy/transpose",
    "copy fusion": "copy/transpose",
    "convert": "convert",
    "select-and-scatter": "scatter",
    "scatter": "scatter",
    "gather": "gather",
    "dynamic-update-slice": "loop bookkeeping",
    "dynamic-slice": "loop bookkeeping",
    "while": "loop bookkeeping",
    "tuple": "loop bookkeeping",
    "custom-call": "custom-call (pallas)",
    "non-fusion elementwise": "elementwise fusion (VPU)",
}


def classify(rows, executions: int | None):
    """Group DEVICE rows by op class on self-time."""

    def f(v):
        return float(v) if v not in (None, "") else 0.0

    # column names vary slightly across xprof versions; check BEFORE
    # filtering on the column (filtering first would just drop every
    # row and print an empty "0.00 ms" table instead of erroring)
    if rows and "Total self-time (us)" not in rows[0]:
        raise SystemExit(f"unexpected columns: {list(rows[0].keys())}")
    dev = [r for r in rows
           if str(r.get("Host/device", "")).lower() in ("device", "tpu")
           and f(r.get("Total self-time (us)")) > 0
           and (r.get("Operation Name") or "") != "IDLE"]
    total = sum(f(r["Total self-time (us)"]) for r in dev)
    by_class: dict[str, list] = {}
    for r in dev:
        cat = (r.get("Operation Type") or "?").lower()
        cls = CLASS_OF.get(cat, cat)
        by_class.setdefault(cls, []).append(r)
    print(f"\ntotal device self-time: {total / 1e3:.2f} ms"
          + (f" ({total / 1e3 / executions:.3f} ms/iteration)" if executions
             else ""))
    print(f"{'class':<28} {'ms':>9} {'%':>6}  top ops (self %)")
    out = []
    for cls, rs in sorted(
        by_class.items(),
        key=lambda kv: -sum(f(r["Total self-time (us)"]) for r in kv[1]),
    ):
        t = sum(f(r["Total self-time (us)"]) for r in rs)
        tops = sorted(rs, key=lambda r: -f(r["Total self-time (us)"]))[:4]
        top_str = ", ".join(
            f"{(r.get('Operation Name') or '?')[:40]}"
            f" {100 * f(r['Total self-time (us)']) / total:.1f}%"
            for r in tops
        )
        print(f"{cls:<28} {t / 1e3:>9.2f} {100 * t / total:>5.1f}%  {top_str}")
        out.append({"class": cls, "ms": t / 1e3, "pct": 100 * t / total})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--workload", default="v2",
        choices=["v2", "stage1", "stage1_fast", "stage1_fast_reuse",
                 "stage1_golden", "stage2"],
        help="which benched workload to trace (train workloads report "
             "ms/STEP; one step holds the full n_critic critic loop)")
    ap.add_argument("--xplane", default=None,
                    help="parse an existing trace dir instead of capturing")
    ap.add_argument("--rng_impl", default="rbg",
                    choices=["threefry", "rbg"],
                    help="PRNG impl for the step keys (v2 capture); "
                         "default rbg = the bench_v2 headline config, so "
                         "the default profile traces the same workload "
                         "the headline measures")
    ap.add_argument("--chain", type=int, default=20,
                    help="iterations per dispatch (v2 workload)")
    ap.add_argument("--batch", type=int, default=None,
                    help="batch size (default: the workload's bench "
                         "default — 1 v2 / 128 stage1 / 256 stage2)")
    ap.add_argument("--keep", default=None,
                    help="directory to keep the captured trace in")
    args = ap.parse_args()

    if args.xplane:
        classify(parse_opstats(args.xplane), None)
        return
    out_dir = args.keep or tempfile.mkdtemp(prefix="opclass_")
    if args.workload == "v2":
        rng_impl = None if args.rng_impl == "threefry" else args.rng_impl
        execs = capture_v2(out_dir, rng_impl, args.chain, args.batch or 1)
    else:
        execs = capture_train(out_dir, args.workload, args.batch)
    classify(parse_opstats(out_dir), execs)


if __name__ == "__main__":
    main()
