"""Stage-I train step: runs under jit, is deterministic, updates params,
and the DP (shard_map) step agrees with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.train.stage1 import (
    Stage1Config,
    Stage1System,
    make_train_step,
    replicate_state,
    shard_batch,
)

B = 4


def _make_batch(key, cfg, batch=B):
    kt, ki = jax.random.split(key)
    return {
        "input_ids": jax.random.randint(
            kt, (batch, cfg.seq_len), 0, cfg.bert.vocab_size
        ),
        "attention_mask": jnp.ones((batch, cfg.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki, (batch, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
        ),
    }


@pytest.fixture(scope="module")
def system():
    return Stage1System(Stage1Config.tiny(n_critic=2))


def test_train_step_runs_and_updates(system):
    state = system.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), system.config)
    step = make_train_step(system, donate=False)

    new_state, metrics = step(state, batch, jax.random.key(2))
    assert int(new_state.step) == 1
    for name in ("loss_critic", "loss_gen", "gp", "kl"):
        assert np.isfinite(float(metrics[name])), name

    # every module's params must have changed
    for mod in ("encoder", "projection", "con_augment", "generator", "critic"):
        before = jax.tree.leaves(state.params[mod])
        after = jax.tree.leaves(new_state.params[mod])
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed, f"{mod} params did not update"


def test_train_step_deterministic(system):
    state = system.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), system.config)
    step = make_train_step(system, donate=False)

    _, m1 = step(state, batch, jax.random.key(7))
    state2 = system.init(jax.random.key(0), B)
    _, m2 = step(state2, batch, jax.random.key(7))
    assert float(m1["loss_gen"]) == float(m2["loss_gen"])
    assert float(m1["loss_critic"]) == float(m2["loss_critic"])


def test_dp_step_matches_single_device(system):
    """With the batch replicated per shard (each shard sees identical
    data), pmean(grads) == single-device grads, so DP and single-device
    steps must produce identical params."""
    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = jax.sharding.Mesh(devices, ("data",))

    cfg = system.config
    state = system.init(jax.random.key(0), B)
    local_batch = _make_batch(jax.random.key(1), cfg, batch=B)

    # single-device step on the local batch
    single = make_train_step(system, donate=False)
    ref_state, ref_metrics = single(state, local_batch, jax.random.key(3))

    # DP: global batch = local batch 4x (4-device mesh) (each shard = same data)
    global_batch = jax.tree.map(lambda x: jnp.tile(x, (4,) + (1,) * (x.ndim - 1)), local_batch)
    dp_state = replicate_state(system.init(jax.random.key(0), B), mesh)
    dp_batch = shard_batch(global_batch, mesh)
    dp_step = make_train_step(system, mesh=mesh)
    out_state, dp_metrics = dp_step(dp_state, dp_batch, jax.random.key(3))

    np.testing.assert_allclose(
        float(dp_metrics["loss_critic"]), float(ref_metrics["loss_critic"]),
        rtol=2e-4,
    )
    for mod in ("generator", "critic"):
        for a, b in zip(
            jax.tree.leaves(out_state.params[mod]),
            jax.tree.leaves(ref_state.params[mod]),
        ):
            # atol > lr: Adam normalizes reduction-order float noise on
            # near-zero gradients into O(lr) update differences.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3
            )


def test_kl_modes_differ():
    sys_f = Stage1System(Stage1Config.tiny(n_critic=1, kl_mode="faithful"))
    sys_c = Stage1System(Stage1Config.tiny(n_critic=1, kl_mode="correct"))
    state_f = sys_f.init(jax.random.key(0), B)
    state_c = sys_c.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), sys_f.config)
    _, mf = make_train_step(sys_f, donate=False)(state_f, batch, jax.random.key(2))
    _, mc = make_train_step(sys_c, donate=False)(state_c, batch, jax.random.key(2))
    assert float(mf["kl"]) == pytest.approx(-float(mc["kl"]), rel=1e-5)
