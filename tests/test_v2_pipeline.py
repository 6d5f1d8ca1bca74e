"""v2 pipeline pieces: prompts, tokenizer, cutouts, augment, engine e2e."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagegenerator_tpu.v2.cutouts import MakeCutouts
from imagegenerator_tpu.v2.engine import GenerateEngine, pad_prompt_specs
from imagegenerator_tpu.v2.init_image import random_gradient_image, random_noise_image
from imagegenerator_tpu.v2.prompts import PromptSpec, prompt_loss, split_prompt
from imagegenerator_tpu.v2.tokenizer import FallbackTokenizer
from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel


def test_split_prompt():
    assert split_prompt("a cat") == ("a cat", 1.0, float("-inf"))
    assert split_prompt("a cat:0.5") == ("a cat", 0.5, float("-inf"))
    assert split_prompt("a cat:0.5:-2") == ("a cat", 0.5, -2.0)
    assert split_prompt("a:b:c:2:3") == ("a:b:c", 2.0, 3.0)


def test_prompt_loss_sign_and_weight():
    img = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    emb = jnp.array([[1.0, 0.0]])
    # aligned prompt, weight 1: first cutout distance 0
    spec = PromptSpec(emb, jnp.asarray(1.0), jnp.asarray(-jnp.inf))
    loss = prompt_loss(img, spec)
    assert float(loss) > 0
    # negative prompt flips sign
    spec_neg = PromptSpec(emb, jnp.asarray(-1.0), jnp.asarray(-jnp.inf))
    assert float(prompt_loss(img, spec_neg)) == pytest.approx(-float(loss))
    # doubling the weight doubles the loss
    spec2 = PromptSpec(emb, jnp.asarray(2.0), jnp.asarray(-jnp.inf))
    assert float(prompt_loss(img, spec2)) == pytest.approx(2 * float(loss), rel=1e-5)


def test_fallback_tokenizer_framing():
    tok = FallbackTokenizer(context_length=12, vocab_size=256)
    out = tok(["hello world", ""])
    assert out.shape == (2, 12)
    assert out[0, 0] == tok.sot and out[0, 3] == tok.eot
    assert out[1, 0] == tok.sot and out[1, 1] == tok.eot
    assert out.max() < 256
    np.testing.assert_array_equal(out, tok(["hello world", ""]))


def test_cutouts_shapes_and_determinism():
    mc = MakeCutouts(cut_size=16, cutn=8, augment=True)
    imgs = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    out = jax.jit(mc.__call__)(jax.random.key(1), imgs)
    assert out.shape == (16, 16, 16, 3)
    out2 = jax.jit(mc.__call__)(jax.random.key(1), imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert np.isfinite(np.asarray(out)).all()


def test_cutouts_differentiable():
    mc = MakeCutouts(cut_size=8, cutn=4, augment=False, noise_fac=0.0)
    imgs = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    g = jax.grad(lambda im: jnp.sum(mc(jax.random.key(1), im) ** 2))(imgs)
    assert np.abs(np.asarray(g)).sum() > 0


def test_init_images():
    rng = np.random.default_rng(0)
    a = random_noise_image(32, 24, rng)
    assert a.shape == (24, 32, 3) and a.min() >= 0 and a.max() <= 1
    b = random_gradient_image(32, 24, rng)
    assert b.shape == (24, 32, 3) and b.min() >= 0 and b.max() <= 1


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
        cutn=4,
        step_size=0.1,
    )


def test_engine_end_to_end(engine):
    """Few optimization iterations on tiny random models: z moves, stays
    inside codebook bounds, losses finite, deterministic under the key."""
    z0 = engine.random_token_latent(jax.random.key(2), 1, 2, 2)
    z0_np = np.asarray(z0)  # engine.step donates the state buffers
    state = engine.init_state(z0)

    tok = FallbackTokenizer(
        context_length=engine.clip_config.context_length,
        vocab_size=engine.clip_config.vocab_size,
    )
    emb = np.asarray(engine.encode_text(tok(["a photo of a cat"])))[0]
    embeds, w, s = pad_prompt_specs([emb], [1.0], [float("-inf")])
    embeds, w, s = jnp.asarray(embeds), jnp.asarray(w), jnp.asarray(s)

    losses_seen = []
    for i in range(3):
        state, losses = engine.step(
            state, jax.random.fold_in(jax.random.key(3), i), embeds, w, s
        )
        losses_seen.append(np.asarray(losses))

    assert all(np.isfinite(l).all() for l in losses_seen)
    z = np.asarray(state.z)
    assert not np.array_equal(z, z0_np)
    assert (z >= np.asarray(engine.z_min) - 1e-6).all()
    assert (z <= np.asarray(engine.z_max) + 1e-6).all()

    # determinism (rebuild z0 — the first run's buffers were donated)
    state2 = engine.init_state(jnp.asarray(z0_np))
    for i in range(3):
        state2, losses2 = engine.step(
            state2, jax.random.fold_in(jax.random.key(3), i), embeds, w, s
        )
    np.testing.assert_array_equal(np.asarray(state2.z), z)


def test_chain_matches_stepwise(engine):
    """chain(n) (the one-dispatch lax.scan over display_freq iterations,
    VERDICT.md round-2 next #1) follows the same per-iteration key
    schedule as n single steps — fold_in(key, step) — so results agree
    to float-reassociation tolerance (the scan body and the standalone
    jit compile to differently-fused programs), and chain itself is
    bit-deterministic."""
    z0 = engine.random_token_latent(jax.random.key(7), 1, 2, 2)
    z0_np = np.asarray(z0)
    tok = FallbackTokenizer(
        context_length=engine.clip_config.context_length,
        vocab_size=engine.clip_config.vocab_size,
    )
    emb = np.asarray(engine.encode_text(tok(["a chained run"])))[0]
    embeds, w, s = pad_prompt_specs([emb], [1.0], [float("-inf")])
    embeds, w, s = jnp.asarray(embeds), jnp.asarray(w), jnp.asarray(s)
    key = jax.random.key(8)

    state_a = engine.init_state(jnp.asarray(z0_np))
    stepwise_losses = []
    for i in range(4):
        state_a, li = engine.step(
            state_a, jax.random.fold_in(key, i), embeds, w, s
        )
        stepwise_losses.append(np.asarray(li))
    z_a = np.asarray(state_a.z)

    state_b = engine.init_state(jnp.asarray(z0_np))
    state_b, losses_b = engine.chain(state_b, 4, key, embeds, w, s)
    z_b = np.asarray(state_b.z)
    np.testing.assert_allclose(z_b, z_a, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(losses_b), np.stack(stepwise_losses), rtol=2e-5, atol=2e-6
    )
    assert int(state_b.step) == 4

    # chain is bit-deterministic under the same key
    state_b2 = engine.init_state(jnp.asarray(z0_np))
    state_b2, _ = engine.chain(state_b2, 4, key, embeds, w, s)
    np.testing.assert_array_equal(np.asarray(state_b2.z), z_b)

    # split chains continue the key schedule seamlessly (run()'s windows)
    state_c = engine.init_state(jnp.asarray(z0_np))
    state_c, _ = engine.chain(state_c, 2, key, embeds, w, s)
    state_c, _ = engine.chain(state_c, 2, key, embeds, w, s)
    np.testing.assert_allclose(np.asarray(state_c.z), z_b, rtol=2e-5, atol=2e-6)


def test_engine_synth_range(engine):
    z = engine.random_token_latent(jax.random.key(4), 2, 2, 2)
    out = engine.synth(z)
    assert out.shape[0] == 2
    arr = np.asarray(out)
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_engine_batched_prompts(engine):
    """Two latents, each with its own prompt set, optimize independently."""
    z0 = engine.random_token_latent(jax.random.key(5), 2, 2, 2)
    state = engine.init_state(z0)
    tok = FallbackTokenizer(
        context_length=engine.clip_config.context_length,
        vocab_size=engine.clip_config.vocab_size,
    )
    e1 = np.asarray(engine.encode_text(tok(["a dog"])))[0]
    e2 = np.asarray(engine.encode_text(tok(["a spaceship"])))[0]
    embeds = jnp.asarray(np.stack([e1[None], e2[None]]))  # (2, 1, D)
    w = jnp.ones((2, 1))
    s = jnp.full((2, 1), -np.inf)
    state, losses = engine.step(state, jax.random.key(6), embeds, w, s)
    assert losses.shape == (2, 1)
    assert np.isfinite(np.asarray(losses)).all()


def test_cutout_path_selection_by_geometry():
    """Magnifying geometries (source <= cut_size) take the composed
    single-warp path; minifying ones (source > cut_size) keep the
    antialiased lanczos resample. Both must produce in-range, correctly
    shaped cutouts from the same key."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagegenerator_tpu.v2.cutouts import MakeCutouts

    key = jax.random.key(7)
    for H, cut in ((24, 32), (64, 32)):  # magnify, minify
        mc = MakeCutouts(cut_size=cut, cutn=4, augment=True, noise_fac=0.0)
        img = jax.random.uniform(jax.random.key(1), (2, H, H, 3))
        out = mc(key, img)
        assert out.shape == (2 * 4, cut, cut, 3)
        a = np.asarray(out)
        assert np.isfinite(a).all()
        assert a.min() >= -1e-6 and a.max() <= 1.0 + 1e-6
