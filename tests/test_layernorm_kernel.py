"""Parity tests for the fused Pallas LayerNorm VJP
(`ops/pallas/layernorm.py`) against flax's nn.LayerNorm oracle —
forward values AND all three gradients (dx, dgamma, dbeta). Run in
interpret mode so they hold on CPU; the kernel itself targets TPU
(stage-1's in-step BERT, benchmarks/PROFILE_stage1_r03.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from imagegenerator_tpu.ops.pallas.layernorm import fused_layernorm, supported

EPS = 1e-12


def _oracle(x, scale, bias):
    ln = nn.LayerNorm(epsilon=EPS)
    return ln.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 7, 128), (513, 256)])
def test_forward_matches_flax(dtype, shape):
    d = shape[-1]
    assert supported(d)
    kx, ks, kb = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, shape, dtype) * 3 + 1
    scale = jax.random.normal(ks, (d,), jnp.float32)
    bias = jax.random.normal(kb, (d,), jnp.float32)

    got = fused_layernorm(x, scale, bias, EPS, True)
    want = _oracle(x, scale, bias)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_vjp_matches_flax(dtype):
    shape, d = (3, 70, 128), 128
    kx, ks, kb, kc = jax.random.split(jax.random.key(1), 4)
    x = (jax.random.normal(kx, shape, jnp.float32) * 2 - 0.5).astype(dtype)
    scale = jax.random.normal(ks, (d,), jnp.float32)
    bias = jax.random.normal(kb, (d,), jnp.float32)
    ct = jax.random.normal(kc, shape, jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_layernorm(x, s, b, EPS, True) * ct)

    def loss_oracle(x, s, b):
        return jnp.sum(_oracle(x, s, b) * ct)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, scale, bias)
    for got, want, name in zip(g_fused, g_oracle, ("dx", "dgamma", "dbeta")):
        assert got.dtype == want.dtype, name
        tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol, err_msg=name,
        )


def test_row_padding_exact():
    """N not divisible by the 512-row tile: padded rows must not leak
    into dgamma/dbeta."""
    d = 128
    x = jax.random.normal(jax.random.key(2), (5, d), jnp.float32)
    scale = jnp.ones((d,)) * 1.5
    bias = jnp.zeros((d,))

    def f(x, s, b):
        return jnp.sum(fused_layernorm(x, s, b, EPS, True) ** 2)

    def g(x, s, b):
        return jnp.sum(_oracle(x, s, b) ** 2)

    gf = jax.grad(f, argnums=(1, 2))(x, scale, bias)
    gg = jax.grad(g, argnums=(1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6)


def test_bert_fused_ln_matches_xla():
    """BertEncoder with fused_ln=True (interpret on CPU) must match the
    nn.LayerNorm build to float tolerance on the same params."""
    import dataclasses

    from imagegenerator_tpu.models.bert import BertConfig, BertEncoder

    cfg = BertConfig.tiny(vocab_size=64)
    cfg = dataclasses.replace(cfg, hidden_size=128, num_heads=2,
                              intermediate_size=256)
    enc = BertEncoder(cfg)
    ids = (jnp.arange(24, dtype=jnp.int32)[None, :] * 7) % cfg.vocab_size
    params = enc.init(jax.random.key(0), ids)["params"]

    enc_fused = BertEncoder(dataclasses.replace(cfg, fused_ln=True))
    out_ref = enc.apply({"params": params}, ids)
    out_fused = enc_fused.apply({"params": params}, ids)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


def test_mixed_param_dtypes_cotangent_contract():
    """scale f32 + bias bf16: custom_vjp must return each cotangent in
    its OWN param's dtype (round-3 code-review finding: dbeta was cast
    to scale.dtype)."""
    d = 128
    x = jax.random.normal(jax.random.key(5), (16, d), jnp.float32)
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.bfloat16)

    def f(s, b):
        return jnp.sum(fused_layernorm(x, s, b, EPS, True))

    ds, db = jax.grad(f, argnums=(0, 1))(scale, bias)
    assert ds.dtype == jnp.float32
    assert db.dtype == jnp.bfloat16
