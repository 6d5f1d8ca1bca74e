"""Regenerate the fixed-seed golden outputs (tests/goldens/*.npz).

Run from the repo root on the CPU backend:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tests/make_goldens.py
The goldens pin the PRNG-determinism contract (BASELINE.json:
'bit-comparable samples at fixed seed'): any change to model math,
init, or key-threading shows up as a golden mismatch.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def stage1_golden():
    from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System, make_train_step

    system = Stage1System(Stage1Config.tiny(n_critic=2))
    state = system.init(jax.random.key(0), 4)
    kt, ki = jax.random.split(jax.random.key(1))
    batch = {
        "input_ids": jax.random.randint(kt, (4, system.config.seq_len), 0, 128),
        "attention_mask": jnp.ones((4, system.config.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki,
            (4, system.config.resolution, system.config.resolution, 3),
            minval=-1,
            maxval=1,
        ),
    }
    step = make_train_step(system, donate=False)
    _, metrics = step(state, batch, jax.random.key(2))
    return {k: np.asarray(v) for k, v in metrics.items()}


def stage2_golden():
    """Stage-2 train-step metrics at a fixed seed — pins the 256px
    path's bitstream (frozen 64px stack -> CA2/G2/critic2 WGAN-GP)
    the way stage1_step.npz pins stage 1's (round-5 gap: stage 2 had
    sample goldens but no train-step golden)."""
    from imagegenerator_tpu.train.stage2 import (
        Stage2Config,
        Stage2System,
        make_train_step,
    )

    system = Stage2System(Stage2Config.tiny(n_critic=2))
    state = system.init(jax.random.key(3), 4)
    kt, ki = jax.random.split(jax.random.key(4))
    batch = {
        "input_ids": jax.random.randint(kt, (4, system.config.seq_len), 0, 128),
        "attention_mask": jnp.ones((4, system.config.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki,
            (4, system.config.resolution, system.config.resolution, 3),
            minval=-1,
            maxval=1,
        ),
    }
    step = make_train_step(system, donate=False)
    _, metrics = step(state, batch, jax.random.key(5))
    return {k: np.asarray(v) for k, v in metrics.items()}


def v2_golden():
    from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
    from imagegenerator_tpu.v2.engine import GenerateEngine
    from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel

    vq_cfg, clip_cfg = VQGANConfig.tiny(), CLIPConfig.tiny()
    vq_params = VQModel(vq_cfg).init(
        jax.random.key(0), jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3))
    )["params"]
    clip_params = CLIP(clip_cfg).init(
        jax.random.key(1),
        jnp.zeros((1, clip_cfg.image_resolution, clip_cfg.image_resolution, 3)),
        jnp.zeros((1, clip_cfg.context_length), jnp.int32),
    )["params"]
    engine = GenerateEngine(
        vqgan_config=vq_cfg, clip_config=clip_cfg,
        vqgan_params=vq_params, clip_params=clip_params,
        cutn=4, step_size=0.1,
    )
    z = engine.random_token_latent(jax.random.key(2), 1, 2, 2)
    state = engine.init_state(z)
    embeds = jnp.ones((1, 1, clip_cfg.embed_dim)) * 0.1
    w = jnp.ones((1, 1))
    s = jnp.full((1, 1), -np.inf)
    for i in range(2):
        state, losses = engine.step(
            state, jax.random.fold_in(jax.random.key(3), i), embeds, w, s
        )
    return {"z": np.asarray(state.z), "losses": np.asarray(losses)}


def stage1_sample_golden():
    """Eval-path golden (VERDICT.md round-4 next #5): pins the
    Stage1System.sample inference surface — eval-mode BN running stats,
    deterministic text encode, CA + z noise keys — which the behavior
    tests of the sampling CLI alone would let silently drift."""
    from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System

    system = Stage1System(Stage1Config.tiny(n_critic=1))
    state = system.init(jax.random.key(10), 4)
    kt = jax.random.key(11)
    batch = {
        "input_ids": jax.random.randint(kt, (4, system.config.seq_len), 0, 128),
        "attention_mask": jnp.ones((4, system.config.seq_len), jnp.int32),
    }
    imgs = system.sample(state, batch, jax.random.key(12))
    # precomputed-tem route must agree with the token route given the
    # same key (the CLI uses tokens; the trainer grid can use tems)
    tem = system.encode_text(
        state.params["encoder"], state.params["projection"],
        batch["input_ids"], batch["attention_mask"], dropout_key=None,
    )
    imgs_tem = system.sample(state, {"tem": tem}, jax.random.key(12))
    np.testing.assert_allclose(
        np.asarray(imgs), np.asarray(imgs_tem), rtol=1e-5, atol=1e-6
    )
    return {"images": np.asarray(imgs)}


def stage2_sample_golden():
    """256px (tiny-config) eval path: frozen stage-1 stack -> CA2 -> G2
    in eval mode — the reference's fixed-noise TensorBoard image
    contract (stage_2_train_fn.py:181-208, seed 456)."""
    from imagegenerator_tpu.train.stage2 import Stage2Config, Stage2System

    system = Stage2System(Stage2Config.tiny(n_critic=1))
    state = system.init(jax.random.key(20), 4)
    kt = jax.random.key(21)
    batch = {
        "input_ids": jax.random.randint(kt, (4, system.config.seq_len), 0, 128),
        "attention_mask": jnp.ones((4, system.config.seq_len), jnp.int32),
    }
    imgs = system.sample(state, batch, jax.random.key(456))
    return {"images": np.asarray(imgs)}


def models_golden():
    from imagegenerator_tpu.models import StageIGenerator

    g = StageIGenerator(c_dim=16, z_dim=12)
    x = jax.random.normal(jax.random.key(4), (2, 28))
    variables = g.init(jax.random.key(5), x, train=False)
    out = g.apply(variables, x, train=False)
    return {"g1_out": np.asarray(out)}


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez(os.path.join(GOLDEN_DIR, "stage1_step.npz"), **stage1_golden())
    np.savez(os.path.join(GOLDEN_DIR, "stage2_step.npz"), **stage2_golden())
    np.savez(os.path.join(GOLDEN_DIR, "v2_engine.npz"), **v2_golden())
    np.savez(os.path.join(GOLDEN_DIR, "models.npz"), **models_golden())
    np.savez(
        os.path.join(GOLDEN_DIR, "sample_stage1.npz"), **stage1_sample_golden()
    )
    np.savez(
        os.path.join(GOLDEN_DIR, "sample_stage2.npz"), **stage2_sample_golden()
    )
    print("goldens written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
