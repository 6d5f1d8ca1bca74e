"""v2 state save/resume (round-5 extension — the reference's v2 path
checkpoints nothing; output images are its only artifact,
generate.py:184-195). Contract: an interrupted run relaunched with the
same command and seed continues the EXACT per-iteration key schedule —
keys fold the saved step counter, so split and unbroken runs agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
from imagegenerator_tpu.v2.engine import (
    GenerateEngine,
    load_latent_state,
    pad_prompt_specs,
    save_latent_state,
)
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel


@pytest.fixture(scope="module")
def engine():
    vq_cfg = VQGANConfig.tiny()
    clip_cfg = CLIPConfig.tiny()
    vq_params = VQModel(vq_cfg).init(
        jax.random.key(0), jnp.zeros((1, vq_cfg.resolution, vq_cfg.resolution, 3))
    )["params"]
    clip_params = CLIP(clip_cfg).init(
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


def _prompt_arrays(engine):
    embeds = jnp.full((1, 1, engine.clip_config.embed_dim), 0.1)
    w = jnp.ones((1, 1))
    s = jnp.full((1, 1), -np.inf)
    return embeds, w, s


def test_split_run_matches_unbroken_run(engine, tmp_path):
    """4 iterations + save + load + 4 more == 8 unbroken iterations:
    the per-iteration keys fold state.step, so the schedule cannot
    drift across the save/load boundary."""
    embeds, w, s = _prompt_arrays(engine)
    key = jax.random.key(9)
    path = str(tmp_path / "state.npz")

    z0 = engine.random_token_latent(jax.random.key(2), 1, 2, 2)
    z0_np = np.asarray(z0)  # chain donates the state buffers

    unbroken = engine.init_state(jnp.asarray(z0_np))
    unbroken, _ = engine.chain(unbroken, 8, key, embeds, w, s)
    z_unbroken = np.asarray(unbroken.z)

    first = engine.init_state(jnp.asarray(z0_np))
    first, _ = engine.chain(first, 4, key, embeds, w, s)
    save_latent_state(path, 4, first)

    template = engine.init_state(jnp.asarray(z0_np))
    iters_done, resumed = load_latent_state(path, template)
    assert iters_done == 4
    assert int(resumed.step) == 4
    resumed, _ = engine.chain(resumed, 4, key, embeds, w, s)

    np.testing.assert_allclose(
        np.asarray(resumed.z), z_unbroken, rtol=1e-6, atol=1e-7
    )


def test_load_rejects_mismatched_geometry(engine, tmp_path):
    path = str(tmp_path / "state.npz")
    z = engine.random_token_latent(jax.random.key(3), 1, 2, 2)
    save_latent_state(path, 7, engine.init_state(z))
    z_bigger = engine.random_token_latent(jax.random.key(3), 1, 4, 4)
    with pytest.raises(ValueError, match="shape"):
        load_latent_state(path, engine.init_state(z_bigger))


def test_run_state_callback_cadence(engine, tmp_path):
    """run() invokes state_callback at the checkin cadence AND with the
    final state; the snapshot survives the chain's buffer donation."""
    embeds, w, s = _prompt_arrays(engine)
    z = engine.random_token_latent(jax.random.key(4), 1, 2, 2)
    state = engine.init_state(z)
    calls = []

    engine.run(
        state,
        jax.random.key(5),
        embeds, w, s,
        iterations=5,
        display_freq=2,
        state_callback=lambda i, st: calls.append((i, int(st.step))),
    )
    # snapshots at 0, 2, 4 plus the final state at 5
    assert [c[0] for c in calls] == [0, 2, 4, 5]
    assert [c[1] for c in calls] == [0, 2, 4, 5]


def test_generate_cli_resume_batched(tmp_path, capsys):
    """--state composes with --prompts_file: the snapshot carries the
    BATCHED latent/optimizer state (and its shardings), and a relaunch
    resumes all prompt sets at once."""
    from imagegenerator_tpu.v2.generate import main

    pf = tmp_path / "prompts.txt"
    pf.write_text("a red bus\na snowy street\n")
    out = tmp_path / "out.png"
    statef = tmp_path / "state_b.npz"
    argv = [
        "--prompts_file", str(pf),
        "-i", "3",
        "-se", "3",
        "-s", "32", "32",
        "-sd", "12",
        "-o", str(out),
        "--state", str(statef),
        "-conf", str(tmp_path / "missing.yaml"),
        "-ckpt", str(tmp_path / "missing.ckpt"),
    ]
    main(argv)
    assert statef.exists()
    with np.load(statef) as d:
        assert int(d["iters_done"]) == 3
        # the snapshot's latent/optimizer leaves carry the batch dim
        assert any(
            d[k].ndim >= 3 and d[k].shape[0] == 2
            for k in d.files
            if k.startswith("leaf_")
        )
    capsys.readouterr()
    main(argv)
    captured = capsys.readouterr()
    assert "Resumed state at iteration 3" in captured.out
    assert (tmp_path / "out_0.png").exists()
    assert (tmp_path / "out_1.png").exists()


def test_generate_cli_resume(tmp_path, capsys):
    """CLI: --state writes a snapshot; a relaunch resumes and finishes
    the remaining iterations (here zero), still writing the PNG."""
    from imagegenerator_tpu.v2.generate import main

    out = tmp_path / "out.png"
    statef = tmp_path / "state.npz"
    argv = [
        "-p", "resumable prompt",
        "-i", "4",
        "-se", "2",
        "-s", "32", "32",
        "-sd", "11",
        "-o", str(out),
        "--state", str(statef),
        "-conf", str(tmp_path / "missing.yaml"),
        "-ckpt", str(tmp_path / "missing.ckpt"),
    ]
    main(argv)
    assert statef.exists()
    with np.load(statef) as d:
        assert int(d["iters_done"]) == 4
    capsys.readouterr()

    out.unlink()
    main(argv)
    captured = capsys.readouterr()
    assert "Resumed state at iteration 4" in captured.out
    # nothing left to optimize, but the output is still produced
    assert out.exists()
