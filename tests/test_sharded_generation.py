"""Batched multi-prompt generation sharded data-parallel over a device
mesh (BASELINE.json config 5): sharded execution must produce the same
latents as unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.parallel import make_mesh, shard_batch
from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
from imagegenerator_tpu.v2.engine import GenerateEngine
from imagegenerator_tpu.v2.tokenizer import FallbackTokenizer
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel


@pytest.fixture(scope="module")
def engine():
    vq_cfg = VQGANConfig.tiny()
    clip_cfg = CLIPConfig.tiny()
    vq = VQModel(vq_cfg)
    vq_params = vq.init(
        jax.random.key(0), jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3))
    )["params"]
    cl = CLIP(clip_cfg)
    clip_params = cl.init(
        jax.random.key(1),
        jnp.zeros((1, clip_cfg.image_resolution, clip_cfg.image_resolution, 3)),
        jnp.zeros((1, clip_cfg.context_length), jnp.int32),
    )["params"]
    return GenerateEngine(
        vqgan_config=vq_cfg,
        clip_config=clip_cfg,
        vqgan_params=vq_params,
        clip_params=clip_params,
        cutn=2,
        step_size=0.1,
    )


def test_sharded_matches_unsharded(engine):
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)

    B = n_dev
    z0 = engine.random_token_latent(jax.random.key(2), B, 2, 2)
    z0_np = np.asarray(z0)
    tok = FallbackTokenizer(
        context_length=engine.clip_config.context_length,
        vocab_size=engine.clip_config.vocab_size,
    )
    prompts = [f"prompt number {i}" for i in range(B)]
    embeds = np.stack(
        [np.asarray(engine.encode_text(tok([p])))[0][None] for p in prompts]
    )  # (B, 1, D)
    w = jnp.ones((B, 1))
    s = jnp.full((B, 1), -np.inf)

    # unsharded
    state = engine.init_state(jnp.asarray(z0_np))
    state, losses_ref = engine.step(
        state, jax.random.key(3), jnp.asarray(embeds), w, s
    )
    z_ref = np.asarray(state.z)

    # sharded over the data axis: every input's batch dim split across
    # devices; jit partitions the step with zero collectives
    state_sh = engine.init_state(shard_batch(jnp.asarray(z0_np), mesh))
    emb_sh = shard_batch(jnp.asarray(embeds), mesh)
    w_sh, s_sh = shard_batch(w, mesh), shard_batch(s, mesh)
    state_sh, losses_sh = engine.step(state_sh, jax.random.key(3), emb_sh, w_sh, s_sh)

    np.testing.assert_allclose(
        np.asarray(losses_sh), np.asarray(losses_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(state_sh.z), z_ref, rtol=1e-4, atol=1e-5)
