"""Pallas TPU kernel: fused multi-head self-attention (fwd + VJP).

Why: in the stage-1 BERT step the attention region is wildly
bandwidth-bound — the backward ``bhqk,bkhd`` einsum alone measures
~2.27 ms/layer for ~6.4 GFLOP (40x its roofline compute time,
benchmarks/PROFILE_stage1_r03.md) because XLA materializes the
(B, heads, T, T) f32 logits/probs tensors in HBM for every fwd/bwd op.
For BERT's T=128 the whole per-(batch, head) attention fits in VMEM, so
this kernel computes QK^T -> mask -> softmax -> dropout -> PV per batch
row with the (T, T) intermediates never leaving the chip, and the
backward recomputes them instead of reloading: HBM traffic falls from
O(B*heads*T^2) to O(B*T*hidden).

Dropout: the keep-mask is regenerated identically in forward and
backward from a scalar seed — on TPU via the hardware PRNG
(``pltpu.prng_random_bits``), in interpret mode (CPU tests) via an
in-kernel integer hash (xorshift finalizer) — so no mask tensor is ever
stored. Masks are ADDRESSED by (global batch row, global head): the
PRNG is (re)seeded per (row, head) with ``base + row*1000003 +
head*7919``, where the custom_partitioning lowering supplies each
shard's global row/head offsets. Consequences: forward and backward
replay bit-identically with no draw-order contract, and a GSPMD-sharded
run (any dp x head-group layout) draws the SAME masks as the unsharded
run (tests/test_tp.py::test_stage1_2d_mesh_fused_attention). The hw and
interpret bitstreams differ; each is deterministic per seed.

Reference semantics matched: HF BERT self-attention with attention-prob
dropout, as fine-tuned in-step by ``/root/reference/train.py:68`` /
``stage_1_train_fn.py:117-119``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Masked-logit fill. NOT -inf: the backward recomputes probs as
# exp(s - m) / l from the SAVED row max and sum, and a fully-masked row
# has m == _BIG_NEG — the fill must stay finite so exp(s - m) = exp(0)
# there (matching the forward's uniform distribution exactly) instead
# of producing inf - inf. 3e7 dominates any real logit (|q.k|*scale is
# bounded by ~1e4 for LayerNormed bf16 activations), so masked columns
# of partially-masked rows still underflow to exactly 0.
_BIG_NEG = -3e7


def supported(seq_len: int, hidden: int, num_heads: int) -> bool:
    hd = hidden // num_heads
    return (
        hidden % num_heads == 0
        and seq_len % 8 == 0
        and hd % 8 == 0
        and hd >= 8
    )


def _hash_bits(shape, salt):
    """Counter-based uint32 bits from (row, col) + salt — the interpret-
    mode stand-in for the TPU hardware PRNG (murmur3-style finalizer)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(0x9E3779B9) + c * jnp.uint32(0x85EBCA6B)
    x = x + salt.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _keep_mask(shape, rate, hw_prng, seed_ref, i, rows, g, h):
    """Keep-mask (f32 0/1) for attention-prob dropout, addressed by
    GLOBAL (batch row, head): seed_ref is (3,) int32 [base, row_offset,
    head_offset] (offsets are 0 in the unsharded trace; the
    custom_partitioning lowering writes each shard's). hw path: reseed
    the hardware PRNG per (row, head) — order-independent, so fwd/bwd
    replay needs no draw-order contract and sharded == unsharded.
    Interpret path: the same salt feeds the counter hash."""
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    row = seed_ref[1] + jnp.int32(i * rows + g)
    head = seed_ref[2] + jnp.int32(h)
    salt = seed_ref[0] + row * jnp.int32(1000003) + head * jnp.int32(7919)
    if hw_prng:
        pltpu.prng_seed(salt)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        bits = _hash_bits(shape, salt)
    return (bits >= thresh).astype(jnp.float32)


def _scores(q2, k2, mask_row, h, hd, scale):
    sl = slice(h * hd, (h + 1) * hd)
    s = jax.lax.dot_general(
        q2[:, sl], k2[:, sl],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask_row is not None:
        s = jnp.where(mask_row > 0, s, _BIG_NEG)
    return s


def _fwd_kernel(
    seed_ref, *refs, nh, hd, rate, scale, hw_prng, rows, has_mask,
):
    if has_mask:
        mask_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref = refs
        mask_ref = None
    i = pl.program_id(0)
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for g in range(rows):
        q2, k2, v2 = q_ref[g], k_ref[g], v_ref[g]
        # (1, T), broadcasts over query rows
        mask_row = mask_ref[g] if has_mask else None
        for h in range(nh):
            s = _scores(q2, k2, mask_row, h, hd, scale)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)  # unnormalized
            l = jnp.sum(p, axis=1, keepdims=True)
            # normalization folds into the (T, hd) context instead of
            # dividing the (T, T) probs; (m, l) are saved SEPARATELY —
            # not as lse = m + log l, which loses log(T) to f32
            # rounding when m is the masked fill — so the backward
            # recomputes probs with NO max/sum reductions, bit-matching
            # the forward even for fully-masked rows
            m_ref[g, h, :] = m[:, 0]
            l_ref[g, h, :] = l[:, 0]
            if rate > 0.0:
                p = p * (
                    _keep_mask(p.shape, rate, hw_prng, seed_ref, i, rows, g, h)
                    * inv
                )
            ctx = jax.lax.dot_general(
                p.astype(v2.dtype), v2[:, h * hd:(h + 1) * hd],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[g, :, h * hd:(h + 1) * hd] = (ctx / l).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, *refs, nh, hd, rate, scale, hw_prng, rows, has_mask,
):
    if has_mask:
        mask_ref, m_ref, l_ref, q_ref, k_ref, v_ref, do_ref = refs[:7]
        dq_ref, dk_ref, dv_ref = refs[7:]
    else:
        m_ref, l_ref, q_ref, k_ref, v_ref, do_ref = refs[:6]
        dq_ref, dk_ref, dv_ref = refs[6:]
        mask_ref = None
    i = pl.program_id(0)
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for g in range(rows):
        q2, k2, v2, do2 = q_ref[g], k_ref[g], v_ref[g], do_ref[g]
        # (1, T), broadcasts over query rows
        mask_row = mask_ref[g] if has_mask else None
        for h in range(nh):
            sl = slice(h * hd, (h + 1) * hd)
            # normalized probs from the saved (m, l) — no reductions here
            probs = jnp.exp(
                _scores(q2, k2, mask_row, h, hd, scale)
                - m_ref[g, h, :][:, None]
            ) * (1.0 / l_ref[g, h, :])[:, None]
            if rate > 0.0:
                keep = _keep_mask(
                    probs.shape, rate, hw_prng, seed_ref, i, rows, g, h
                ) * inv
                pd = probs * keep
            else:
                keep = None
                pd = probs
            do_h = do2[:, sl]
            v_h = v2[:, sl]
            # dv = pd^T @ do  (contract over query positions)
            dv = jax.lax.dot_general(
                pd.astype(do_h.dtype), do_h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dp = do @ v^T, through the dropout scaling
            dp = jax.lax.dot_general(
                do_h, v_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if keep is not None:
                dp = dp * keep
            # softmax VJP
            ds = probs * (dp - jnp.sum(dp * probs, axis=1, keepdims=True))
            if has_mask:
                # the mask-where VJP: probs of masked cols are ~0 for
                # partially-masked rows, but a FULLY-masked row has
                # uniform probs — AD would still route zero gradient to
                # its logits, so zero ds explicitly
                ds = jnp.where(mask_row > 0, ds, 0.0)
            ds = (ds * scale).astype(q2.dtype)
            dq = jax.lax.dot_general(
                ds, k2[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                ds, q2[:, sl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_ref[g, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[g, :, sl] = dv.astype(dv_ref.dtype)


def _specs(T, H, rows):
    row = pl.BlockSpec(
        (rows, T, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    # mask rides as (B, 1, T): a (rows, 1, T) block keeps the last two
    # dims equal to the array's (the TPU tiling rule for sub-8 dims)
    mask = pl.BlockSpec(
        (rows, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return row, seed, mask


def _rows_per_program(B: int) -> int:
    """Batch rows per grid program. Swept on hardware at the stage-1
    operating point (B=256 doubled batch): rows=1 679 img/s, rows=4 667
    (−1.7%), rows=8 no better — Mosaic already double-buffers block DMA
    across the sequential grid, and bigger blocks only coarsen that
    pipelining. One row per program stays the default;
    IMAGEGEN_ATTN_ROWS overrides for experiments."""
    import os

    env = os.environ.get("IMAGEGEN_ATTN_ROWS")
    if env:
        r = int(env)
        if r < 1 or B % r:
            raise ValueError(
                f"IMAGEGEN_ATTN_ROWS={env} must be a positive divisor of "
                f"the doubled batch (B={B})"
            )
        return r
    return 1


def _pallas_fwd(seed, *rest, nhH, rate, hw_prng, interpret, has_mask):
    """Shape-adaptive forward pallas_call: all tile geometry derives
    from the ARGUMENT shapes, so the same function serves the global
    trace and the per-shard lowering under custom_partitioning (where
    q arrives with the local batch and the local head group)."""
    if has_mask:
        mask, q, k, v = rest
        mask_args = (mask,)
    else:
        q, k, v = rest
        mask_args = ()
    nh_g, H_g = nhH
    B, T, H = q.shape
    nh = nh_g * H // H_g  # local heads under head-group (Megatron) sharding
    hd = H // nh
    rows = _rows_per_program(B)
    kw = dict(nh=nh, hd=hd, rate=rate, scale=1.0 / math.sqrt(hd),
              hw_prng=hw_prng, rows=rows, has_mask=has_mask)
    row, seed_spec, mask_spec = _specs(T, H, rows)
    stat_spec = pl.BlockSpec(
        (rows, nh, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    stat_shape = jax.ShapeDtypeStruct((B, nh, T), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid=(B // rows,),
        in_specs=[seed_spec, *((mask_spec,) if has_mask else ()), row, row, row],
        out_specs=[row, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), q.dtype), stat_shape, stat_shape,
        ],
        interpret=interpret,
    )(seed, *mask_args, q, k, v)


def _pallas_bwd(seed, *rest, nhH, rate, hw_prng, interpret, has_mask):
    """Shape-adaptive backward pallas_call (see _pallas_fwd)."""
    if has_mask:
        mask, m, l, q, k, v, do = rest
        mask_args = (mask,)
    else:
        m, l, q, k, v, do = rest
        mask_args = ()
    nh_g, H_g = nhH
    B, T, H = q.shape
    nh = nh_g * H // H_g
    hd = H // nh
    rows = _rows_per_program(B)
    kw = dict(nh=nh, hd=hd, rate=rate, scale=1.0 / math.sqrt(hd),
              hw_prng=hw_prng, rows=rows, has_mask=has_mask)
    row, seed_spec, mask_spec = _specs(T, H, rows)
    stat_spec = pl.BlockSpec(
        (rows, nh, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, **kw),
        grid=(B // rows,),
        in_specs=[
            seed_spec, *((mask_spec,) if has_mask else ()),
            stat_spec, stat_spec, row, row, row, row,
        ],
        out_specs=[row, row, row],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), q.dtype),
            jax.ShapeDtypeStruct((B, T, H), k.dtype),
            jax.ShapeDtypeStruct((B, T, H), v.dtype),
        ],
        interpret=interpret,
    )(seed, *mask_args, m, l, q, k, v, do)


def _make_partitioned(impl, rule, arg_kinds, res_kinds, nhH):
    """Wrap a shape-adaptive pallas caller in custom_partitioning so
    GSPMD/Shardy shards it instead of all-gathering the opaque custom
    call: batch rides any data axis, the packed-heads dim shards by head
    groups (the ``h`` factor of ``(h d)`` — exactly the Megatron column
    split of the qkv Dense kernels in parallel/tp.py), and T/head_dim
    are replication factors (each program needs whole rows). The
    per-shard lowering is ``impl`` itself — it rebuilds tile geometry
    from the shard shapes.

    ``arg_kinds``/``res_kinds`` name each operand/result's layout:
    'seed' (1,), 'mask' (B, 1, T), 'act' (B, T, H), 'stat' (B, nh, T).
    ``partition`` CANONICALIZES every sharding from those kinds — batch
    axis on dim 0 and head-group axis on the packed-H/heads dim, taken
    from the last operand (always an activation); T and head_dim are
    never sharded. Echoing the partitioner's proposed arg shardings
    verbatim could silently hand the kernel T-sharded rows (ADVICE.md
    round-3 medium).

    Dropout note: keep-masks are addressed by GLOBAL (batch row, head)
    — the lowering writes each shard's row/head offsets into elements
    1-2 of the (3,) seed operand, so a GSPMD-sharded run draws the SAME
    masks as the unsharded run under any dp x head-group layout
    (ADVICE.md round-3 low; the round-3 local-head salt also made
    head-sharded masks diverge). Under shard_map (manual mode — this
    wrapper is bypassed) replicas keep the reference's synchronized
    per-replica RNG (train.py:66, stage_1_train_fn.py:98-106)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    cp = custom_partitioning(impl)
    nh_g, H_g = nhH

    def _axes(arg_shapes):
        spec = arg_shapes[-1].sharding.spec  # last operand is 'act'
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[2] if len(spec) > 2 else None
        return b_ax, h_ax

    def _shardings(mesh, b_ax, h_ax, kinds):
        by_kind = {
            "seed": P(None),
            "mask": P(b_ax, None, None),
            "act": P(b_ax, None, h_ax),
            "stat": P(b_ax, h_ax, None),
        }
        return tuple(NamedSharding(mesh, by_kind[k]) for k in kinds)

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax = _axes(arg_shapes)

        def _idx(axes):
            idx = jnp.zeros((), jnp.int32)
            for ax in (axes,) if not isinstance(axes, tuple) else axes:
                if ax is not None:
                    idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
            return idx

        def lower(*args):
            if b_ax is not None or h_ax is not None:
                act = args[-1]  # per-shard (local) shapes
                row_off = jnp.int32(0)
                head_off = jnp.int32(0)
                if b_ax is not None:
                    row_off = _idx(b_ax) * act.shape[0]
                if h_ax is not None:
                    local_nh = nh_g * act.shape[2] // H_g
                    head_off = _idx(h_ax) * local_nh
                seed = args[0]
                seed = jnp.stack(
                    [seed[0], seed[1] + row_off, seed[2] + head_off]
                )
                args = (seed,) + args[1:]
            return impl(*args)

        return (
            mesh,
            lower,
            _shardings(mesh, b_ax, h_ax, res_kinds),
            _shardings(mesh, b_ax, h_ax, arg_kinds),
        )

    def infer(mesh, arg_shapes, result_shape):
        # the GSPMD (non-Shardy) propagation path: outputs get the
        # canonical kind shardings derived from the last operand
        b_ax, h_ax = _axes(arg_shapes)
        outs = _shardings(mesh, b_ax, h_ax, res_kinds)
        return outs if len(outs) > 1 else outs[0]

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return cp


def fused_attention(
    q, k, v, mask, seed,
    *, num_heads: int, dropout_rate: float = 0.0, interpret: bool = False,
):
    """Multi-head attention over packed heads.

    q/k/v: (B, T, H) with H = num_heads * head_dim (the raw Dense
    outputs — no reshape/transpose needed); mask: (B, T) int (1 = keep)
    or None; seed: (1,) int32 (ignored when dropout_rate == 0).
    Returns (B, T, H) context in q.dtype. Differentiable w.r.t. q, k, v.

    Composes with sharding two ways: under ``shard_map`` (the DP train
    step) it simply runs per shard, and under GSPMD jit (the 2-D dp x tp
    step) the custom_partitioning rules shard it by batch and by head
    group with zero collectives.
    """
    B, T, H = q.shape
    if not supported(T, H, num_heads):
        raise ValueError(
            f"fused_attention: unsupported shape T={T}, H={H}, "
            f"heads={num_heads} (need H % heads == 0, T % 8 == 0, "
            f"head_dim % 8 == 0) — use the XLA einsum path instead"
        )
    has_mask = mask is not None
    common = dict(
        nhH=(num_heads, H), rate=float(dropout_rate),
        hw_prng=not interpret, interpret=interpret, has_mask=has_mask,
    )
    # Shardy factor mappings: the packed H dim is the (h, d) compound —
    # h (head groups) is the shardable factor, d (head_dim) and t are
    # replication factors (each kernel program needs whole rows). d
    # appears only inside the compound, so its size is given explicitly.
    from jax.experimental.custom_partitioning import (
        CompoundFactor,
        SdyShardingRule,
    )

    act = ("b", "t", CompoundFactor("h", "d"))  # any (B, T, H) operand
    stat = ("b", "h", "t")
    seed_m = ("s",)
    mask_m = ("b", "u", "t")

    def _rule(operands, results):
        return SdyShardingRule(
            operand_mappings=tuple(operands),
            result_mappings=tuple(results),
            need_replication_factors=("t", "d"),
            d=H // num_heads,
        )

    if has_mask:
        mask_args = (mask.astype(jnp.int32).reshape(B, 1, T),)
        fwd_rule = _rule([seed_m, mask_m, act, act, act], [act, stat, stat])
        bwd_rule = _rule(
            [seed_m, mask_m, stat, stat, act, act, act, act],
            [act, act, act],
        )
        fwd_kinds = ["seed", "mask", "act", "act", "act"]
        bwd_kinds = ["seed", "mask", "stat", "stat", "act", "act", "act", "act"]
    else:
        mask_args = ()
        fwd_rule = _rule([seed_m, act, act, act], [act, stat, stat])
        bwd_rule = _rule(
            [seed_m, stat, stat, act, act, act, act], [act, act, act]
        )
        fwd_kinds = ["seed", "act", "act", "act"]
        bwd_kinds = ["seed", "stat", "stat", "act", "act", "act", "act"]
    # (3,) [base, row_offset, head_offset]: offsets stay 0 here and are
    # written per-shard by the custom_partitioning lowering
    seed = jnp.concatenate(
        [seed.astype(jnp.int32).reshape(1), jnp.zeros((2,), jnp.int32)]
    )

    # plain *args closures: custom_partitioning resolves every argument
    # positionally and rejects functools.partial-bound keywords
    def _fwd_impl(*args):
        return _pallas_fwd(*args, **common)

    def _bwd_impl(*args):
        return _pallas_bwd(*args, **common)

    fwd_cp = _make_partitioned(
        _fwd_impl, fwd_rule, fwd_kinds, ["act", "stat", "stat"], (num_heads, H)
    )
    bwd_cp = _make_partitioned(
        _bwd_impl, bwd_rule, bwd_kinds, ["act", "act", "act"], (num_heads, H)
    )

    # seed/mask are PRIMAL ARGS (float0 cotangents), not closure
    # captures: a closed-over tracer escapes its trace when the
    # custom_vjp is re-staged under jax.checkpoint (remat)
    def _f0(x):
        import numpy as np

        return np.zeros(x.shape, jax.dtypes.float0)

    if has_mask:

        @jax.custom_vjp
        def _attn(seed, mask3, q, k, v):
            out, _, _ = fwd_cp(seed, mask3, q, k, v)
            return out

        def _attn_fwd(seed, mask3, q, k, v):
            out, m, l = fwd_cp(seed, mask3, q, k, v)
            return out, (seed, mask3, q, k, v, m, l)

        def _attn_bwd(res, do):
            seed, mask3, q, k, v, m, l = res
            dq, dk, dv = bwd_cp(seed, mask3, m, l, q, k, v, do.astype(q.dtype))
            return _f0(seed), _f0(mask3), dq, dk, dv

        _attn.defvjp(_attn_fwd, _attn_bwd)
        return _attn(seed, mask_args[0], q, k, v)

    @jax.custom_vjp
    def _attn(seed, q, k, v):
        out, _, _ = fwd_cp(seed, q, k, v)
        return out

    def _attn_fwd(seed, q, k, v):
        out, m, l = fwd_cp(seed, q, k, v)
        return out, (seed, q, k, v, m, l)

    def _attn_bwd(res, do):
        seed, q, k, v, m, l = res
        dq, dk, dv = bwd_cp(seed, m, l, q, k, v, do.astype(q.dtype))
        return _f0(seed), dq, dk, dv

    _attn.defvjp(_attn_fwd, _attn_bwd)
    return _attn(seed, q, k, v)
