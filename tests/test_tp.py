"""Tensor parallelism: CLIP towers sharded Megatron-style over a 2-D
(data, model) mesh must reproduce the replicated numerics, with the qkv /
MLP kernels actually distributed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from imagegenerator_tpu.parallel.tp import (
    make_tp_mesh,
    shard_params,
    transformer_param_specs,
)
from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig


@pytest.fixture(scope="module")
def clip_setup():
    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    imgs = jax.random.uniform(
        jax.random.key(0), (4, cfg.image_resolution, cfg.image_resolution, 3)
    )
    toks = jnp.zeros((4, cfg.context_length), jnp.int32).at[:, 0].set(5).at[:, 3].set(
        cfg.vocab_size - 1
    )
    params = model.init(jax.random.key(1), imgs, toks)["params"]
    return cfg, model, params, imgs, toks


def test_specs_follow_megatron_rules(clip_setup):
    _, _, params, _, _ = clip_setup
    specs = transformer_param_specs(params)
    blk = specs["visual"]["block_0"]
    assert blk["in_proj"]["kernel"] == P(None, "model")
    assert blk["in_proj"]["bias"] == P("model")
    assert blk["out_proj"]["kernel"] == P("model", None)
    assert blk["out_proj"]["bias"] == P()
    assert blk["mlp_fc"]["kernel"] == P(None, "model")
    assert blk["mlp_proj"]["kernel"] == P("model", None)
    assert specs["visual"]["ln_pre"]["scale"] == P()
    assert specs["text"]["token_embedding"]["embedding"] == P()


def test_tp_matches_replicated(clip_setup):
    cfg, model, params, imgs, toks = clip_setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_tp_mesh(data=2, model=4)

    # replicated reference
    ie_ref, te_ref = model.apply({"params": params}, imgs, toks)

    sharded = shard_params(params, mesh)
    imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P("data")))
    toks_sh = jax.device_put(toks, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, im, tk):
        return model.apply({"params": p}, im, tk)

    ie, te = fwd(sharded, imgs_sh, toks_sh)

    np.testing.assert_allclose(np.asarray(ie), np.asarray(ie_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(te), np.asarray(te_ref), rtol=2e-4, atol=2e-5)

    # the big kernels must actually be distributed over the model axis
    k = sharded["visual"]["block_0"]["in_proj"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert all(sh[1] == k.shape[1] // 4 for sh in shard_shapes)


def test_stage1_2d_mesh_bert_tp():
    """Stage-1 train step on a 2-D ('data', 'model') mesh via GSPMD with
    the in-step BERT Megatron-sharded (stage1.make_train_step_2d).

    At data=1 the GSPMD step must reproduce the meshless step's numerics
    exactly-ish: the only parallelism is TP, whose collectives are
    mathematically the identity, and the BatchNorm-stats difference
    between the shard_map path (per-shard) and GSPMD (global) vanishes
    with a single data shard. A (4, 2) step then checks NUMERICS parity
    at dp>=2 against the single-device step on the same full batch —
    GSPMD BN is sync-BN over the logical batch, so the two must agree
    (VERDICT.md round-3 next #3)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from imagegenerator_tpu.train.stage1 import (
        Stage1Config,
        Stage1System,
        make_train_step,
        make_train_step_2d,
        shard_state_2d,
        state_tp_specs,
    )

    cfg = Stage1Config.tiny(n_critic=1)
    system = Stage1System(cfg)
    state = system.init(jax.random.key(0), 4)
    kt, ki = jax.random.split(jax.random.key(1))
    batch = {
        "input_ids": jax.random.randint(kt, (4, cfg.seq_len), 0, cfg.bert.vocab_size),
        "attention_mask": jnp.ones((4, cfg.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki, (4, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
        ),
    }

    ref_state, ref_metrics = make_train_step(system, donate=False)(
        state, batch, jax.random.key(3)
    )

    # the encoder's attention/MLP kernels must actually be distributed
    specs = state_tp_specs(state)
    enc = specs.params["encoder"]["layer_0"]
    assert enc["attention"]["query"]["kernel"] == P(None, "model")
    assert enc["attention"]["out"]["kernel"] == P("model", None)
    assert enc["intermediate"]["kernel"] == P(None, "model")
    assert enc["output"]["kernel"] == P("model", None)
    assert specs.params["generator"] is not None  # replicated leaves exist
    adam_mu = specs.opt_state["encoder"][0].mu
    assert adam_mu["layer_0"]["attention"]["query"]["kernel"] == P(None, "model")

    mesh = make_tp_mesh(data=1, model=2)
    st_tp = shard_state_2d(state, mesh)
    step_tp = make_train_step_2d(system, mesh, donate=False)
    out_state, metrics = step_tp(
        st_tp, jax.device_put(batch, NamedSharding(mesh, P("data"))), jax.random.key(3)
    )
    for k in ref_metrics:
        np.testing.assert_allclose(
            np.asarray(metrics[k]), np.asarray(ref_metrics[k]),
            rtol=5e-4, atol=5e-4, err_msg=k,
        )
    # updated params agree too (spot-check a sharded and a replicated leaf)
    np.testing.assert_allclose(
        np.asarray(out_state.params["encoder"]["layer_0"]["intermediate"]["kernel"]),
        np.asarray(ref_state.params["encoder"]["layer_0"]["intermediate"]["kernel"]),
        rtol=5e-4, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.params["projection"]["kernel"]),
        np.asarray(ref_state.params["projection"]["kernel"]),
        rtol=5e-4, atol=5e-4,
    )

    # dp=4 x tp=2 NUMERICS parity (VERDICT.md round-3 next #3): GSPMD is
    # a partitioning of the same logical program — BatchNorm reduces over
    # the logical batch (sync-BN) and threefry bits are
    # partitioning-invariant, so the dp>=2 step must reproduce the
    # single-device step on the SAME full batch (dropout on is fine)
    # within float-reassociation tolerance.
    mesh42 = make_tp_mesh(data=4, model=2)
    batch8 = jax.tree.map(lambda x: jnp.concatenate([x, x]), batch)
    ref8_state, ref8_metrics = make_train_step(system, donate=False)(
        state, batch8, jax.random.key(3)
    )
    st2 = shard_state_2d(state, mesh42)
    out2, m2 = make_train_step_2d(system, mesh42, donate=False)(
        st2, jax.device_put(batch8, NamedSharding(mesh42, P("data"))), jax.random.key(3)
    )
    for k in ref8_metrics:
        np.testing.assert_allclose(
            np.asarray(m2[k]), np.asarray(ref8_metrics[k]),
            rtol=5e-4, atol=5e-4, err_msg=f"dp4xtp2 {k}",
        )
    np.testing.assert_allclose(
        np.asarray(out2.params["encoder"]["layer_0"]["intermediate"]["kernel"]),
        np.asarray(ref8_state.params["encoder"]["layer_0"]["intermediate"]["kernel"]),
        rtol=5e-4, atol=5e-4,
    )
    # sync-BN: the running stats must match the full-batch estimator too
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out2.batch_stats)[0]),
        np.asarray(jax.tree.leaves(ref8_state.batch_stats)[0]),
        rtol=5e-4, atol=5e-4,
    )
    assert int(out2.step) == int(state.step) + 1


def test_stage1_2d_mesh_fused_attention():
    """The fused Pallas attention kernel under the GSPMD 2-D step: the
    custom_partitioning rules shard it by batch ('data') and by head
    group ('model' — the Megatron column split of the qkv kernels), so
    the kernel body runs per-shard with the LOCAL head count instead of
    being all-gathered. At data=1/tp=2 with text dropout off it must
    reproduce the meshless fused step exactly-ish (TP collectives are
    the identity); a (2, 2) run with dropout ON must ALSO reproduce the
    meshless step, because the partition lowering addresses dropout
    keep-masks by global batch row (seed offset per data shard)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from imagegenerator_tpu.train.stage1 import (
        Stage1Config,
        Stage1System,
        make_train_step,
        make_train_step_2d,
        shard_state_2d,
    )

    base = Stage1Config.tiny(n_critic=1, text_dropout=False)
    cfg = dataclasses.replace(
        base, bert=dataclasses.replace(base.bert, fused_attention=True)
    )
    system = Stage1System(cfg)
    state = system.init(jax.random.key(0), 4)
    kt, ki = jax.random.split(jax.random.key(1))
    batch = {
        "input_ids": jax.random.randint(kt, (4, cfg.seq_len), 0, cfg.bert.vocab_size),
        "attention_mask": jnp.ones((4, cfg.seq_len), jnp.int32),
        "image": jax.random.uniform(
            ki, (4, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
        ),
    }
    _, ref_metrics = make_train_step(system, donate=False)(
        state, batch, jax.random.key(3)
    )

    mesh = make_tp_mesh(data=1, model=2)
    st_tp = shard_state_2d(state, mesh)
    step_tp = make_train_step_2d(system, mesh, donate=False)
    _, metrics = step_tp(
        st_tp, jax.device_put(batch, NamedSharding(mesh, P("data"))),
        jax.random.key(3),
    )
    for k in ref_metrics:
        np.testing.assert_allclose(
            np.asarray(metrics[k]), np.asarray(ref_metrics[k]),
            rtol=5e-4, atol=5e-4, err_msg=k,
        )

    # dp=2 x tp=2 NUMERICS parity, dropout ACTIVE (VERDICT.md round-3
    # next #3): the kernel's custom_partitioning folds each data shard's
    # global batch offset into the dropout seed (ADVICE.md round-3), so
    # keep-masks are addressed by GLOBAL row and the sharded step
    # reproduces the meshless fused-attention step even under dropout;
    # threefry nn.Dropout masks elsewhere are partitioning-invariant.
    cfg_do = dataclasses.replace(
        Stage1Config.tiny(n_critic=1),
        bert=dataclasses.replace(Stage1Config.tiny().bert, fused_attention=True),
    )
    sys_do = Stage1System(cfg_do)
    st = sys_do.init(jax.random.key(5), 4)
    ref_do_state, ref_do_metrics = make_train_step(sys_do, donate=False)(
        st, batch, jax.random.key(6)
    )
    mesh22 = make_tp_mesh(data=2, model=2)
    st22 = shard_state_2d(st, mesh22)
    out22, m22 = make_train_step_2d(sys_do, mesh22, donate=False)(
        st22, jax.device_put(batch, NamedSharding(mesh22, P("data"))),
        jax.random.key(6),
    )
    for k in ref_do_metrics:
        np.testing.assert_allclose(
            np.asarray(m22[k]), np.asarray(ref_do_metrics[k]),
            rtol=5e-4, atol=5e-4, err_msg=f"dp2xtp2 dropout {k}",
        )
    np.testing.assert_allclose(
        np.asarray(out22.params["encoder"]["layer_0"]["attention"]["query"]["kernel"]),
        np.asarray(ref_do_state.params["encoder"]["layer_0"]["attention"]["query"]["kernel"]),
        rtol=5e-4, atol=5e-4,
    )


def test_stage1_2d_mesh_gelu_output_bwd():
    """The output-recovered GELU backward (ops/gelu.py, a custom_vjp)
    under the GSPMD 2-D step: elementwise custom_vjp calls must
    partition transparently, so a dp=2 x tp=2 step with
    gelu_output_bwd=True reproduces the meshless step with the same
    flag (and, since the forward is bit-identical, its loss metrics
    also match the plain exact-GELU meshless step)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from imagegenerator_tpu.train.stage1 import (
        Stage1Config,
        Stage1System,
        make_train_step,
        make_train_step_2d,
        shard_state_2d,
    )

    base = Stage1Config.tiny(n_critic=1, text_dropout=False)
    cfg = dataclasses.replace(
        base, bert=dataclasses.replace(base.bert, gelu_output_bwd=True)
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
    _, ref_metrics = make_train_step(system, donate=False)(
        state, batch, jax.random.key(3)
    )

    mesh = make_tp_mesh(data=2, model=2)
    st = shard_state_2d(state, mesh)
    out, metrics = make_train_step_2d(system, mesh, donate=False)(
        st, jax.device_put(batch, NamedSharding(mesh, P("data"))),
        jax.random.key(3),
    )
    for k in ref_metrics:
        np.testing.assert_allclose(
            np.asarray(metrics[k]), np.asarray(ref_metrics[k]),
            rtol=5e-4, atol=5e-4, err_msg=k,
        )
    assert int(out.step) == int(state.step) + 1
