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
