"""ops/gelu.py: exact-erf GELU with the output-recovered backward.

The contract (module docstring there): forward BIT-IDENTICAL to
``jax.nn.gelu(approximate=False)``; backward algebraically the exact
formula with the Phi term at the saved output's precision — deviation
from the erf-recompute backward bounded by ~one ulp of the gradient at
the input dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.ops.gelu import gelu_exact_output_bwd


def _exact_vjp(y, ct):
    return jax.vjp(lambda u: jax.nn.gelu(u, approximate=False), y)[1](ct)[0]


def _fast_vjp(y, ct):
    return jax.vjp(gelu_exact_output_bwd, y)[1](ct)[0]


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_forward_bit_identical(dtype):
    y = (jnp.linspace(-12.0, 12.0, 4097)).astype(dtype)
    a = np.asarray(jax.jit(gelu_exact_output_bwd)(y), np.float32)
    b = np.asarray(
        jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(y), np.float32
    )
    np.testing.assert_array_equal(a, b)


def test_backward_matches_recompute_bf16():
    # all bf16 values the training path sees: normal-ish activations plus
    # the tails where gelu saturates to x / underflows to 0
    y = (jax.random.normal(jax.random.key(0), (1 << 15,)) * 4.0).astype(
        jnp.bfloat16
    )
    ct = jnp.ones_like(y)
    g_fast = np.asarray(jax.jit(_fast_vjp)(y, ct), np.float32)
    g_ref = np.asarray(jax.jit(_exact_vjp)(y, ct), np.float32)
    # one bf16 ulp at the gradient's ~[0, 1.13] range is 2^-7 = 0.0078
    assert np.max(np.abs(g_fast - g_ref)) <= 0.0078126
    assert np.isfinite(g_fast).all()


def test_backward_f32_accuracy():
    y = jnp.linspace(-9.0, 9.0, 8193, dtype=jnp.float32)
    ct = jnp.ones_like(y)
    g_fast = np.asarray(jax.jit(_fast_vjp)(y, ct))
    g_ref = np.asarray(jax.jit(_exact_vjp)(y, ct))
    # f32 h carries ~2^-24 relative error into Phi = h/y
    assert np.max(np.abs(g_fast - g_ref)) < 5e-6


def test_backward_near_zero_branch():
    # the |y| < 1/32 series branch, including y == 0 exactly (0/0 guard)
    y = jnp.array(
        [0.0, -0.0, 1e-8, -1e-8, 0.03, -0.03, 0.03125, -0.03125],
        jnp.float32,
    )
    ct = jnp.ones_like(y)
    g_fast = np.asarray(jax.jit(_fast_vjp)(y, ct))
    g_ref = np.asarray(jax.jit(_exact_vjp)(y, ct))
    assert np.isfinite(g_fast).all()
    np.testing.assert_allclose(g_fast, g_ref, atol=1e-5)


def test_grad_through_dense_stack():
    # the production fusion shape: dot -> gelu -> dot, grads w.r.t. both
    # kernels stay close to the recompute path at bf16
    k1 = (jax.random.normal(jax.random.key(1), (64, 256)) * 0.05).astype(
        jnp.bfloat16
    )
    k2 = (jax.random.normal(jax.random.key(2), (256, 64)) * 0.05).astype(
        jnp.bfloat16
    )
    x = jax.random.normal(jax.random.key(3), (32, 64)).astype(jnp.bfloat16)

    def loss(ks, act):
        a, b = ks
        return jnp.sum(act(x @ a) @ b)

    g_fast = jax.jit(jax.grad(lambda ks: loss(ks, gelu_exact_output_bwd)))(
        (k1, k2)
    )
    g_ref = jax.jit(
        jax.grad(lambda ks: loss(ks, lambda v: jax.nn.gelu(v, approximate=False)))
    )((k1, k2))
    # the meaningful claim: against the f32-exact gradient, the fast
    # backward is as accurate as the erf-recompute backward — both are
    # bf16-rounded pipelines whose mutual deviation is a few ulps
    g_true = jax.jit(
        jax.grad(
            lambda ks: loss(
                tuple(k.astype(jnp.float32) for k in ks),
                lambda v: jax.nn.gelu(v, approximate=False),
            )
        )
    )((k1, k2))
    for gf, gr, gt in zip(g_fast, g_ref, g_true):
        gf = np.asarray(gf, np.float32)
        gr = np.asarray(gr, np.float32)
        gt = np.asarray(gt, np.float32)
        denom = np.maximum(np.abs(gt), 1.0)
        # RMS, not max: single-element ulp flips make worst-case ratios
        # of two equally-rounded pipelines a coin toss
        err_fast = np.sqrt(np.mean(((gf - gt) / denom) ** 2))
        err_ref = np.sqrt(np.mean(((gr - gt) / denom) ** 2))
        assert err_fast <= err_ref * 1.3 + 1e-4, (err_fast, err_ref)


def test_stage1_step_losses_bit_identical():
    # the flag's integration contract: the FORWARD is bit-identical, so
    # a full train step's loss metrics (all forward-derived) must match
    # the default exact-GELU step EXACTLY — only post-update params may
    # differ by gradient ulps
    import dataclasses

    from imagegenerator_tpu.train.stage1 import (
        Stage1Config,
        Stage1System,
        make_train_step,
    )

    def run(output_bwd):
        cfg = Stage1Config.tiny(n_critic=1)
        cfg = dataclasses.replace(
            cfg, bert=dataclasses.replace(cfg.bert, gelu_output_bwd=output_bwd)
        )
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), 4)
        kt, ki = jax.random.split(jax.random.key(1))
        batch = {
            "input_ids": jax.random.randint(
                kt, (4, cfg.seq_len), 0, cfg.bert.vocab_size
            ),
            "attention_mask": jnp.ones((4, cfg.seq_len), jnp.int32),
            "image": jax.random.uniform(
                ki, (4, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
            ),
        }
        _, metrics = make_train_step(system, donate=False)(
            state, batch, jax.random.key(2)
        )
        return {k: float(v) for k, v in metrics.items()}

    ref, fast = run(False), run(True)
    assert ref == fast, (ref, fast)
