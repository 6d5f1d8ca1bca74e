"""Narrow-bits dropout (ops/dropout.py): semantics vs nn.Dropout.

The 16/8-bit mask draw must keep nn.Dropout's contract — unbiased
(exact rescale by the quantized keep prob), rate-accurate to 2^-bits,
deterministic per key — while drawing narrower RngBitGenerator output
(the whole point: benchmarks/PROFILE_train_r04.md's ~4.7 ms/step of
mask-bits HBM traffic in stage 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.ops.dropout import BitsDropout, bits_dropout


def test_deterministic_and_zero_rate_are_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    mod = BitsDropout(0.1, 16)
    out = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = BitsDropout(0.0, 16).apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)}
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_values_are_zero_or_exact_rescale(bits):
    rate = 0.1
    n = 1 << bits
    keep_prob = 1.0 - round(rate * n) / n
    x = jnp.full((64, 64), 3.0)
    out = np.asarray(bits_dropout(x, jax.random.key(1), rate, bits))
    vals = np.unique(out)
    expected = np.unique(np.asarray([0.0, 3.0 / np.float32(keep_prob)],
                                    np.float32))
    np.testing.assert_allclose(vals, expected, rtol=0, atol=0)


@pytest.mark.parametrize("bits", [8, 16])
def test_drop_fraction_matches_quantized_rate(bits):
    rate = 0.1
    n = 1 << bits
    drop_prob = round(rate * n) / n
    x = jnp.ones((512, 512))
    out = np.asarray(bits_dropout(x, jax.random.key(2), rate, bits))
    frac = float((out == 0).mean())
    # 512*512 Bernoulli draws: 5 sigma ~ 0.003
    assert abs(frac - drop_prob) < 0.005, (frac, drop_prob)


def test_unbiased_expectation():
    # E[dropout(x)] == x with the EXACT quantized keep prob rescale:
    # the empirical mean of kept-mass equals keep_prob * (1/keep_prob)
    rate = 0.1
    x = jnp.ones((2048, 512))
    out = np.asarray(bits_dropout(x, jax.random.key(3), rate, 16))
    assert abs(out.mean() - 1.0) < 2e-3


def test_quantization_edge_rates_raise():
    """Rates whose threshold quantizes to 0 (silent no-op) or 2**bits
    (keep prob 0 + draw-dtype overflow) are errors, not silent behavior
    changes (ADVICE round 4)."""
    x = jnp.ones((4, 4))
    with pytest.raises(ValueError, match="quantizes to 0"):
        bits_dropout(x, jax.random.key(0), 0.001, 8)
    with pytest.raises(ValueError, match="keep probability 0"):
        bits_dropout(x, jax.random.key(0), 0.999, 8)
    # the same rates are fine at a wider draw
    bits_dropout(x, jax.random.key(0), 0.001, 16)
    bits_dropout(x, jax.random.key(0), 0.999, 16)
    # rate exactly 0 is still the documented identity, not an error
    out = bits_dropout(x, jax.random.key(0), 0.0, 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_deterministic_per_key():
    x = jnp.ones((32, 32))
    a = bits_dropout(x, jax.random.key(7), 0.1, 16)
    b = bits_dropout(x, jax.random.key(7), 0.1, 16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = bits_dropout(x, jax.random.key(8), 0.1, 16)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_bert_encoder_with_narrow_dropout_trains():
    """BertEncoder(dropout_bits=16): same param tree as the default,
    gradients flow, and the train-mode forward differs from the 32-bit
    path only in the mask bitstream (both drop ~rate of activations)."""
    import dataclasses

    from imagegenerator_tpu.models.bert import BertConfig, BertEncoder

    cfg = BertConfig.tiny()
    ids = jnp.zeros((2, 8), jnp.int32)
    enc32 = BertEncoder(cfg)
    enc16 = BertEncoder(dataclasses.replace(cfg, dropout_bits=16))
    params = enc32.init(jax.random.key(0), ids)["params"]
    # identical param trees (BitsDropout has no params)
    p16 = enc16.init(jax.random.key(0), ids)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(p16)

    def loss(p, enc):
        out = enc.apply(
            {"params": p}, ids, deterministic=False,
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.sum(out[:, 0, :] ** 2)

    g16 = jax.grad(lambda p: loss(p, enc16))(params)
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(g16)
    )
    # eval mode is bit-identical regardless of dropout_bits
    e32 = enc32.apply({"params": params}, ids, deterministic=True)
    e16 = enc16.apply({"params": params}, ids, deterministic=True)
    np.testing.assert_array_equal(np.asarray(e32), np.asarray(e16))
