"""Stage-II train step: runs, updates only the trained modules, keeps the
frozen stage-1 stack untouched, and accepts a Stage-I handoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.train.stage1 import Stage1System
from imagegenerator_tpu.train.stage2 import (
    Stage2Config,
    Stage2System,
    make_train_step,
)

B = 4


def _make_batch(key, cfg):
    kt, ki = jax.random.split(key)
    return {
        "input_ids": jax.random.randint(kt, (B, cfg.seq_len), 0, cfg.bert.vocab_size),
        "attention_mask": jnp.ones((B, cfg.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki, (B, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
        ),
    }


@pytest.fixture(scope="module")
def system():
    return Stage2System(Stage2Config.tiny(n_critic=2))


def test_stage2_step_runs_and_freezes(system):
    state = system.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), system.config)
    step = make_train_step(system, donate=False)

    new_state, metrics = step(state, batch, jax.random.key(2))
    for name in ("loss_critic", "loss_gen", "gp", "kl"):
        assert np.isfinite(float(metrics[name])), name

    # frozen stack must be bit-identical
    for a, b in zip(
        jax.tree.leaves(state.frozen_params), jax.tree.leaves(new_state.frozen_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # trained modules must have changed
    for mod in ("con_augment_2", "generator", "critic"):
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params[mod]),
                jax.tree.leaves(new_state.params[mod]),
            )
        )
        assert changed, f"{mod} params did not update"


def test_stage1_handoff(system):
    """load_stage1 transplants the trained stage-1 stack (the reference's
    stage-1 checkpoint load, stage_2_train_fn.py:65-72, with its undefined-
    blob crash fixed)."""
    s1 = Stage1System(system.config.stage1_config(n_critic=1))
    s1_state = s1.init(jax.random.key(5), B)
    s2_state = system.init(jax.random.key(0), B)

    handed = system.load_stage1(s2_state, s1_state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(handed.frozen_params["gen_1"])[0]),
        np.asarray(jax.tree.leaves(s1_state.params["generator"])[0]),
    )


def test_sample_shape(system):
    state = system.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), system.config)
    out = system.sample(state, batch, jax.random.key(3))
    r = system.config.resolution
    assert out.shape == (B, r, r, 3)
    assert np.asarray(out).min() >= -1.0 and np.asarray(out).max() <= 1.0


def test_uint8_batch_matches_host_normalized(system):
    """uint8 transfer path: feeding resampled bytes and normalizing
    on-device must match feeding the host-normalized f32 of the same
    bytes — same formula (u8 * 2/255 - 1), so only WHERE the multiply
    runs changes. XLA fuses the multiply-subtract into an FMA while
    numpy rounds between them, so the normalized pixels can differ by
    one f32 ULP; losses must agree to that rounding, nothing more."""
    state = system.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), system.config)
    img_u8 = jax.random.randint(
        jax.random.key(7),
        (B, system.config.resolution, system.config.resolution, 3),
        0,
        256,
        jnp.uint8,
    )
    step = make_train_step(system, donate=False)

    batch_u8 = dict(batch, image=img_u8)
    _, m_u8 = step(state, batch_u8, jax.random.key(2))

    norm = np.asarray(img_u8).astype(np.float32) * (2.0 / 255.0) - 1.0
    state2 = system.init(jax.random.key(0), B)
    batch_f32 = dict(batch, image=jnp.asarray(norm))
    _, m_f32 = step(state2, batch_f32, jax.random.key(2))

    for k in ("loss_critic", "loss_gen", "gp", "kl"):
        np.testing.assert_allclose(
            np.asarray(m_u8[k]), np.asarray(m_f32[k]), rtol=1e-5, err_msg=k
        )


def test_precomputed_tem_matches_tokens(system):
    """Feeding batch['tem'] (precomputed via embed_texts) must produce the
    SAME step as the token path — the frozen encoder makes them equal."""
    import jax.numpy as jnp

    state = system.init(jax.random.key(0), B)
    batch = _make_batch(jax.random.key(1), system.config)
    step = make_train_step(system, donate=False)
    _, m_tok = step(state, batch, jax.random.key(2))

    tem = system.embed_texts(state, batch["input_ids"], batch["attention_mask"])
    batch_pre = {"tem": tem, "image": batch["image"]}
    state2 = system.init(jax.random.key(0), B)
    _, m_pre = step(state2, batch_pre, jax.random.key(2))

    # doubled-batch vs separate-batch encoder forwards differ by float
    # association; 5 Adam updates amplify it slightly
    for k in ("loss_critic", "loss_gen", "gp", "kl"):
        np.testing.assert_allclose(
            float(m_pre[k]), float(m_tok[k]), rtol=1e-3, err_msg=k
        )
