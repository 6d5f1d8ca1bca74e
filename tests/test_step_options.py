"""Config options of the train steps: text hoisting, remat, faithful KL."""

import jax
import jax.numpy as jnp
import numpy as np

from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1System, make_train_step

B = 4


def _batch(cfg):
    kt, ki = jax.random.split(jax.random.key(1))
    return {
        "input_ids": jax.random.randint(kt, (B, cfg.seq_len), 0, cfg.bert.vocab_size),
        "attention_mask": jnp.ones((B, cfg.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki, (B, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
        ),
    }


def test_hoisted_text_forward_runs():
    """text_dropout=False hoists the encoder out of the critic scan; the
    step still runs and produces finite losses."""
    system = Stage1System(Stage1Config.tiny(n_critic=2, text_dropout=False))
    state = system.init(jax.random.key(0), B)
    step = make_train_step(system, donate=False)
    _, metrics = step(state, _batch(system.config), jax.random.key(2))
    assert np.isfinite(float(metrics["loss_critic"]))
    assert np.isfinite(float(metrics["loss_gen"]))


def test_remat_matches_no_remat():
    """jax.checkpoint must not change the math — identical metrics."""
    cfg_plain = Stage1Config.tiny(n_critic=1, remat=False)
    cfg_remat = Stage1Config.tiny(n_critic=1, remat=True)
    batch = _batch(cfg_plain)

    outs = []
    for cfg in (cfg_plain, cfg_remat):
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        _, metrics = step(state, batch, jax.random.key(2))
        outs.append({k: float(v) for k, v in metrics.items()})

    for k in outs[0]:
        np.testing.assert_allclose(outs[0][k], outs[1][k], rtol=1e-5, err_msg=k)


def test_per_iter_text_resampling_mode():
    """text_resample_per_iter=True restores the reference's semantics
    (fresh dropout per critic-loop text forward, gen-step re-forward).
    The faithful path must run, produce finite losses, and — because the
    dropout key schedule differs — diverge from the hoisted default."""
    cfg_hoist = Stage1Config.tiny(n_critic=2)
    cfg_faithful = Stage1Config.tiny(n_critic=2, text_resample_per_iter=True)

    results = []
    for cfg in (cfg_hoist, cfg_faithful):
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        _, metrics = step(state, _batch(cfg), jax.random.key(2))
        assert np.isfinite(float(metrics["loss_gen"]))
        results.append(float(metrics["loss_gen"]))
    assert results[0] != results[1]


def test_per_iter_equals_hoisted_without_dropout():
    """Gradient-equivalence oracle for the hoisted-vjp text plumbing
    (the concatenated-zero cotangent routed through text_vjp): with
    dropout OFF, per_iter=True re-forwards the encoder inside the
    generator loss (straightforward jax.grad formulation) while
    per_iter=False routes encoder/projection grads through the saved
    vjp — mathematically identical, so metrics AND the updated
    encoder/projection parameters must agree. (ADVICE.md round-2: the
    old dispatch sent both flag values down the hoisted branch, making
    this comparison vacuous; stage1 now honors per_iter unconditionally.)
    """
    import optax

    from imagegenerator_tpu.train.stage1 import MODULES

    # reuse pinned OFF so both paths run the same doubled-batch text
    # forward and the comparison isolates the vjp cotangent plumbing
    # (the reuse path has its own parity test below)
    base = dict(n_critic=1, text_dropout=False, text_reuse_mismatched=False)
    metrics_out, deltas_out = [], []
    for per_iter in (False, True):
        cfg = Stage1Config.tiny(**base, text_resample_per_iter=per_iter)
        system = Stage1System(cfg)
        # plain SGD(1.0): param delta == -gradient exactly, so the grad
        # comparison below is direct (Adam would amplify float noise at
        # near-zero-grad coords into +-lr sign flips)
        system.tx = {m: optax.sgd(1.0) for m in MODULES}
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        new_state, metrics = step(state, _batch(cfg), jax.random.key(2))
        metrics_out.append({k: float(v) for k, v in metrics.items()})
        deltas_out.append(
            jax.tree.map(
                lambda n, o: np.asarray(n) - np.asarray(o),
                new_state.params,
                state.params,
            )
        )
    for k in metrics_out[0]:
        np.testing.assert_allclose(
            metrics_out[0][k], metrics_out[1][k], rtol=1e-5, err_msg=k
        )
    # the vjp-routed encoder/projection gradients must equal the inline
    # re-forward formulation's jax.grad
    for mod in ("encoder", "projection"):
        for x, y in zip(
            jax.tree.leaves(deltas_out[0][mod]), jax.tree.leaves(deltas_out[1][mod])
        ):
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-7, err_msg=mod)


def test_fused_attention_step_matches_xla_without_dropout():
    """The fused Pallas attention kernel inside the FULL stage-1 train
    step (forward + gradients through the custom VJP into encoder
    updates): with text dropout off the kernel's math is deterministic
    and identical to the einsum build, so every metric must agree."""
    import dataclasses

    base = Stage1Config.tiny(n_critic=1, text_dropout=False)
    cfg_fused = dataclasses.replace(
        base, bert=dataclasses.replace(base.bert, fused_attention=True)
    )

    outs = []
    for cfg in (base, cfg_fused):
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        _, metrics = step(state, _batch(cfg), jax.random.key(2))
        outs.append({k: float(v) for k, v in metrics.items()})
    for k in outs[0]:
        np.testing.assert_allclose(outs[0][k], outs[1][k], rtol=2e-4, err_msg=k)


def test_fused_attention_step_with_dropout_runs():
    """With text dropout ON the kernel draws its own keep-masks (a
    different bitstream than nn.Dropout): the step must run, stay
    finite, and actually differ from the XLA build."""
    import dataclasses

    base = Stage1Config.tiny(n_critic=1, text_dropout=True)
    cfg_fused = dataclasses.replace(
        base, bert=dataclasses.replace(base.bert, fused_attention=True)
    )
    outs = []
    for cfg in (base, cfg_fused):
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        _, metrics = step(state, _batch(cfg), jax.random.key(2))
        assert np.isfinite(float(metrics["loss_gen"]))
        outs.append(float(metrics["loss_gen"]))
    assert outs[0] != outs[1]


def test_fused_attention_composes_with_remat():
    """jax.checkpoint over the custom-VJP attention kernel: remat treats
    it atomically and must not change the math."""
    import dataclasses

    base = Stage1Config.tiny(n_critic=1, text_dropout=False)
    outs = []
    for remat in (False, True):
        cfg = dataclasses.replace(
            base, remat=remat,
            bert=dataclasses.replace(base.bert, fused_attention=True),
        )
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        _, metrics = step(state, _batch(cfg), jax.random.key(2))
        outs.append({k: float(v) for k, v in metrics.items()})
    for k in outs[0]:
        np.testing.assert_allclose(outs[0][k], outs[1][k], rtol=1e-5, err_msg=k)


def test_text_reuse_mismatched_exact_without_dropout():
    """AUTO reuse (tem_mis = tem[perm], on when text dropout is off) must
    match the doubled-batch forward: the permuted rows compute identical
    embeddings. Tolerances: the B-row vs 2B-row forward differs by
    ~1.6e-7 (batch-tiling float noise — verified directly), and the
    critic-update feedback loop amplifies that into ~1e-3-scale
    differences in individual encoder-grad coordinates, so metrics are
    tight and per-coordinate grads loose; a plumbing bug would be O(1)
    wrong, far outside these bounds."""
    import dataclasses

    import optax

    from imagegenerator_tpu.train.stage1 import MODULES

    metrics_out, deltas_out = [], []
    for reuse in (False, True):
        cfg = Stage1Config.tiny(
            n_critic=1, text_dropout=False, text_reuse_mismatched=reuse
        )
        system = Stage1System(cfg)
        system.tx = {m: optax.sgd(1.0) for m in MODULES}
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        new_state, metrics = step(state, _batch(cfg), jax.random.key(2))
        metrics_out.append({k: float(v) for k, v in metrics.items()})
        deltas_out.append(
            jax.tree.map(
                lambda n, o: np.asarray(n) - np.asarray(o),
                new_state.params,
                state.params,
            )
        )
    for k in metrics_out[0]:
        np.testing.assert_allclose(
            metrics_out[0][k], metrics_out[1][k], rtol=1e-4, err_msg=k
        )
    for mod in ("encoder", "projection"):
        for x, y in zip(
            jax.tree.leaves(deltas_out[0][mod]),
            jax.tree.leaves(deltas_out[1][mod]),
        ):
            np.testing.assert_allclose(x, y, rtol=5e-2, atol=2e-3, err_msg=mod)


def test_text_reuse_mismatched_with_dropout_runs_and_differs():
    """Opt-in reuse under dropout: the mismatched pair shares its matched
    twin's dropout sample (a different noise structure than the
    reference's fresh draw) — the step must run, stay finite, and differ
    from the default."""
    import dataclasses

    outs = []
    for reuse in (False, True):
        cfg = Stage1Config.tiny(
            n_critic=1, text_dropout=True, text_reuse_mismatched=reuse
        )
        system = Stage1System(cfg)
        state = system.init(jax.random.key(0), B)
        step = make_train_step(system, donate=False)
        _, metrics = step(state, _batch(cfg), jax.random.key(2))
        assert np.isfinite(float(metrics["loss_gen"]))
        outs.append(float(metrics["loss_critic"]))
    assert outs[0] != outs[1]
