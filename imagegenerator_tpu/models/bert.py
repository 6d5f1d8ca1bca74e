"""Compact flax BERT encoder — the text-encoder role of the v1 pipeline.

The reference fine-tunes HF ``SpanBERT/spanbert-base-cased`` inside the GAN
step and takes the CLS hidden state (``/root/reference/train.py:68``,
``stage_1_train_fn.py:117-119``). SpanBERT is architecturally BERT-base
(cased vocab 28996, 12L/768H/12 heads), so we provide:

* ``BertConfig`` / ``BertEncoder`` — a from-scratch flax implementation
  whose attention/FFN matmuls are shaped for the MXU (768/3072 divide 128
  after padding; seq len 128 = one lane tile).
* ``convert_hf_bert_params`` — maps an HF *torch* ``state_dict`` (local
  file; this environment has no network egress) onto our param tree, so
  real SpanBERT weights slot in when available. Tests and smoke configs
  use small randomly-initialized configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 28996
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1
    # GELU flavor. False = exact erf GELU — what HF BERT/SpanBERT compute,
    # so checkpoint-faithful fine-tuning keeps it. True = tanh
    # approximation: ~9% faster whole-step on v5e (the erf fwd+bwd rides
    # fused into the FFN matmuls' epilogues and was ~2.1 ms/step of their
    # time at batch 128; benchmarks/PROFILE_stage1_r03.md), numerically
    # within ~1e-3 of exact. Set via --gelu tanh / BENCH_GELU=tanh.
    gelu_approximate: bool = False
    # Exact-erf GELU with the output-recovered backward (ops/gelu.py):
    # forward BIT-IDENTICAL to the exact path; the backward recovers
    # Phi(y) = h/y from the already-saved gelu output instead of
    # re-running XLA's erf polynomial (the recompute is fused into the
    # MLP backward dots and is most of the measured 21.5 ms/step
    # exact-vs-tanh premium, benchmarks/PROFILE_train_r04.md). The Phi
    # term carries the saved output's bf16 rounding — same order as the
    # gradient's own mixed-precision rounding (tests/test_gelu.py).
    # Ignored when gelu_approximate=True. Set via --gelu exact_outbwd /
    # BENCH_GELU=exact_outbwd.
    gelu_output_bwd: bool = False
    # LayerNorm implementation. True routes every LayerNorm through the
    # fused Pallas forward+VJP kernel (ops/pallas/layernorm.py): one HBM
    # pass computes dx+dgamma+dbeta instead of XLA's separate reduces.
    # Whole-step A/B (benchmarks/PROFILE_stage1_r03.md): +1.4% at the
    # faithful default config, −10.8% on the tanh+rbg fast path — the 25
    # pallas fusion barriers break XLA's surrounding fusions for more
    # than the one-pass VJP saves, so this stays OPT-IN. Same
    # f32-statistics numerics as nn.LayerNorm (parity-tested); falls
    # back to the plain formula off-TPU (interpret mode) and for hidden
    # sizes not divisible by 128. Set via --fused_ln / BENCH_LN=pallas.
    fused_ln: bool = False
    # Attention implementation. True fuses QK^T -> mask -> softmax ->
    # dropout -> PV into one Pallas kernel per direction
    # (ops/pallas/attention.py): the (B, heads, T, T) logits/probs live
    # only in VMEM and the backward recomputes them, removing the
    # bandwidth-bound HBM round-trips XLA takes (bwd attention einsum
    # alone ~2.27 ms/layer at batch 128 — PROFILE_stage1_r03.md).
    # Dropout keep-masks are regenerated from the step seed by the TPU
    # hardware PRNG (a different deterministic bitstream than
    # nn.Dropout's threefry). Set via --fused_attn / BENCH_ATTN=pallas.
    fused_attention: bool = False
    # Mask-draw width for the hidden/embedding dropout sites. 32 =
    # nn.Dropout (f32-uniform compare; goldens default). 16/8 route
    # through ops/dropout.py: the keep decision is drawn as uint16/uint8
    # bits, halving/quartering the non-fusible RngBitGenerator HBM
    # traffic that the profile attributes ~4.7 ms/step to
    # (benchmarks/PROFILE_train_r04.md "lt + jit(_uniform)"). Unbiased —
    # kept values rescale by the exact quantized keep prob; rate
    # quantization is 2^-bits vs nn.Dropout's 2^-24 uniform grid. Set
    # via --dropout_bits / BENCH_DROPOUT_BITS.
    dropout_bits: int = 32

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "BertConfig":
        return cls(
            vocab_size=vocab_size,
            hidden_size=16,
            num_layers=1,
            num_heads=2,
            intermediate_size=32,
            max_position_embeddings=64,
        )


class _FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same param names/shapes/init) that
    dispatches to the fused Pallas kernel on TPU. Off-TPU or at
    unsupported widths it computes the identical f32 formula inline, so
    checkpoints and param trees are interchangeable with the XLA build."""

    epsilon: float

    @nn.compact
    def __call__(self, x):
        from imagegenerator_tpu.ops.pallas import layernorm as _lnk

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        on_tpu = jax.default_backend() == "tpu"
        if _lnk.supported(d):
            return _lnk.fused_layernorm(x, scale, bias, self.epsilon, not on_tpu)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def _make_ln(cfg: "BertConfig", name: str):
    if cfg.fused_ln:
        return _FusedLayerNorm(cfg.layer_norm_eps, name=name)
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name)


def _dropout(cfg: "BertConfig", x, deterministic: bool):
    """Hidden/embedding dropout site: nn.Dropout at the 32-bit default,
    ops/dropout.py narrow-bits draw at dropout_bits 16/8 (both use the
    "dropout" RNG collection; neither has params)."""
    if cfg.dropout_bits != 32:
        from imagegenerator_tpu.ops.dropout import BitsDropout

        return BitsDropout(cfg.dropout_rate, cfg.dropout_bits)(
            x, deterministic=deterministic
        )
    return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)


class _SelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        cfg = self.config
        h, nh = cfg.hidden_size, cfg.num_heads
        hd = h // nh
        dense = lambda name: nn.Dense(h, dtype=self.dtype, name=name)
        if cfg.fused_attention:
            from imagegenerator_tpu.ops.pallas import attention as _fattn

            if _fattn.supported(x.shape[1], h, nh):
                rate = 0.0 if deterministic else cfg.dropout_rate
                if rate > 0.0:
                    # explicit uint32: under jax_enable_x64 default bits
                    # are uint64 and the bitcast would yield (1, 2),
                    # breaking the kernel's (1,) int32 seed contract
                    bits = jax.random.bits(
                        self.make_rng("dropout"), (1,), dtype=jnp.uint32
                    )
                    seed = jax.lax.bitcast_convert_type(bits, jnp.int32)
                else:
                    seed = jnp.zeros((1,), jnp.int32)
                ctx = _fattn.fused_attention(
                    dense("query")(x), dense("key")(x), dense("value")(x),
                    mask, seed,
                    num_heads=nh, dropout_rate=rate,
                    interpret=jax.default_backend() != "tpu",
                )
                return nn.Dense(h, dtype=self.dtype, name="out")(ctx)
        q = dense("query")(x).reshape(*x.shape[:2], nh, hd)
        k = dense("key")(x).reshape(*x.shape[:2], nh, hd)
        v = dense("value")(x).reshape(*x.shape[:2], nh, hd)
        # (B, nh, T, T)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        if mask is not None:
            big_neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(mask[:, None, None, :] > 0, logits, big_neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        probs = _dropout(cfg, probs, deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(*x.shape[:2], h)
        return nn.Dense(h, dtype=self.dtype, name="out")(ctx)


class _Layer(nn.Module):
    config: BertConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        cfg = self.config
        attn = _SelfAttention(cfg, self.dtype, name="attention")(
            x, mask, deterministic
        )
        attn = _dropout(cfg, attn, deterministic)
        x = _make_ln(cfg, "attention_ln")(x + attn)
        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        if cfg.gelu_output_bwd and not cfg.gelu_approximate:
            from imagegenerator_tpu.ops.gelu import gelu_exact_output_bwd

            y = gelu_exact_output_bwd(y)
        else:
            y = jax.nn.gelu(y, approximate=cfg.gelu_approximate)
        y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(y)
        y = _dropout(cfg, y, deterministic)
        return _make_ln(cfg, "output_ln")(x + y)


class BertEncoder(nn.Module):
    """Returns the full last hidden state; CLS = ``out[:, 0, :]``."""

    config: BertConfig
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic: bool = True,
    ):
        cfg = self.config
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(
            input_ids
        )
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings"
        )(jnp.arange(T)[None, :])
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings")(
            token_type_ids
        )
        x = word + pos + typ
        x = _make_ln(cfg, "embeddings_ln")(x)
        x = _dropout(cfg, x, deterministic)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i in range(cfg.num_layers):
            x = _Layer(cfg, self.dtype, name=f"layer_{i}")(
                x, attention_mask, deterministic
            )
        return x


def convert_hf_bert_params(state_dict: dict, config: BertConfig) -> dict:
    """Map an HF torch BERT ``state_dict`` onto ``BertEncoder`` params.

    Accepts tensors or numpy arrays; prefix-insensitive (handles both
    ``bert.encoder...`` and ``encoder...`` key styles).
    """

    def get(name):
        for k in (name, f"bert.{name}"):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        raise KeyError(name)

    def dense(name):
        return {
            "kernel": get(f"{name}.weight").T,
            "bias": get(f"{name}.bias"),
        }

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    params = {
        "word_embeddings": {"embedding": get("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": get("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": get("embeddings.token_type_embeddings.weight")
        },
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
                "out": dense(f"{p}.attention.output.dense"),
            },
            "attention_ln": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_ln": ln(f"{p}.output.LayerNorm"),
        }
    return jax.tree.map(jnp.asarray, params)


def config_from_state_dict(state_dict: dict) -> BertConfig:
    """Infer a ``BertConfig`` from an HF BERT torch ``state_dict`` (shape
    inspection only — the reference relies on HF doing this from
    config.json; we have only the weights file)."""

    def shape(name):
        for k in (name, f"bert.{name}"):
            if k in state_dict:
                return tuple(state_dict[k].shape)
        raise KeyError(name)

    vocab, hidden = shape("embeddings.word_embeddings.weight")
    max_pos = shape("embeddings.position_embeddings.weight")[0]
    type_vocab = shape("embeddings.token_type_embeddings.weight")[0]
    inter = shape("encoder.layer.0.intermediate.dense.weight")[0]
    layers = 0
    while any(
        f"{pfx}encoder.layer.{layers}.intermediate.dense.weight" in state_dict
        for pfx in ("", "bert.")
    ):
        layers += 1
    # head count is not recoverable from shapes (hd*nh == hidden for any
    # factorization); BERT-base family uses hidden/64 heads.
    return BertConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        num_layers=layers,
        num_heads=max(1, hidden // 64),
        intermediate_size=inter,
        max_position_embeddings=max_pos,
        type_vocab_size=type_vocab,
    )


def load_bert_checkpoint(path: str, config: BertConfig | None = None):
    """Load a local HF torch checkpoint (``pytorch_model.bin`` /
    ``.pt`` state_dict) and convert to ``BertEncoder`` params — the
    pretrained-SpanBERT entry point of ``/root/reference/train.py:68``.
    Returns ``(params, config)``."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if config is None:
        config = config_from_state_dict(state_dict)
    return convert_hf_bert_params(state_dict, config), config
