"""Tensor parallelism via sharding annotations (GSPMD).

The JAX-idiomatic TP recipe: build a 2-D mesh ``('data', 'model')``,
place params with Megatron-style ``NamedSharding``s, shard the batch over
``data``, and let the XLA partitioner insert the all-reduces. No model
code changes — the same jitted step runs SPMD.

Rules for transformer blocks (CLIP towers, BERT):

  * qkv / first-MLP kernels ``(D, H)``  -> column-parallel ``P(None, 'model')``
  * their biases ``(H,)``               -> ``P('model')``
  * attn-out / second-MLP kernels       -> row-parallel ``P('model', None)``
  * everything else (embeddings, layernorms, convs, small heads)
                                        -> replicated ``P()``

This goes beyond the reference, which is DP-only (SURVEY.md §2
'TP/PP/SP/EP: ABSENT'); it exists so the v2 engine's CLIP scoring and
the text encoder can scale past one chip's HBM/FLOPs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, kind) -> spec builders. Column-parallel output dim for
# fused qkv and MLP-in; row-parallel input dim for projections back.
_COLUMN_KERNELS = ("in_proj", "mlp_fc", "query", "key", "value", "intermediate")
_ROW_KERNELS = ("out_proj", "mlp_proj", "out", "output")


def make_tp_mesh(data: int, model: int) -> Mesh:
    devices = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devices, ("data", "model"))


def _spec_for(path: tuple[str, ...]) -> P:
    if len(path) < 2:
        return P()
    parent, leaf = path[-2], path[-1]
    if leaf == "kernel" and parent in _COLUMN_KERNELS:
        return P(None, "model")
    if leaf == "bias" and parent in _COLUMN_KERNELS:
        return P("model")
    if leaf == "kernel" and parent in _ROW_KERNELS:
        return P("model", None)
    # row-parallel bias is added after the all-reduce -> replicated
    return P()


def transformer_param_specs(params) -> dict:
    """PartitionSpec pytree for a transformer param tree (CLIP tower /
    BERT encoder) under Megatron column/row rules."""

    def spec(path, _leaf):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return _spec_for(names)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, specs=None):
    """device_put a param tree with TP specs (default: transformer rules)."""
    if specs is None:
        specs = transformer_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate_params(params, mesh: Mesh):
    return jax.device_put(params, NamedSharding(mesh, P()))
