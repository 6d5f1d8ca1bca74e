"""Exponential moving average of generator-side parameters.

A standard GAN-training practice the reference never implemented
(its sampling surfaces read the live training weights —
``/root/reference/stage_2_train_fn.py:181-208``): maintain
``ema = d * ema + (1 - d) * params`` per step over the modules the
sampling path uses, and sample from the average for smoother, more
stable outputs.

TPU-native shape: the EMA tree lives OUTSIDE the train state — the
jitted train step is untouched (same executable, same donation), and
the update is one extra tiny fused multiply-add dispatch per step
(generator-side params are a few MB; the EMA buffer is donated so no
allocation churn). Checkpoints with EMA enabled store
``{"state": ..., "aux": {"ema": ...}}`` via
``CheckpointManager.save_with_aux``; ``restore_latest_with_aux``
upgrades plain (pre-EMA) checkpoints by returning ``aux=None`` so the
caller can seed the average from the restored parameters.
"""

from __future__ import annotations

import functools

import jax

# modules averaged per stage: exactly the TRAINED modules the sampling
# path reads (stage-1 sample: encoder -> projection -> CA -> G,
# stage1.GEN_SIDE; stage-2 sample: frozen stack + CA2 -> G2, of which
# only CA2/G2 train — stage2.TRAINED minus the critic)
STAGE1_MODULES = ("encoder", "projection", "con_augment", "generator")
STAGE2_MODULES = ("con_augment_2", "generator")


def modules_for_stage(stage: int) -> tuple:
    return STAGE1_MODULES if stage == 1 else STAGE2_MODULES


def init_ema(params: dict, modules: tuple) -> dict:
    """Fresh EMA tree = a COPY of the tracked module subtrees (a real
    buffer copy, not an alias: the live params are donated into the
    next train step, and the EMA buffer itself is donated into its
    update — aliasing either would delete arrays out from under the
    other)."""
    import jax.numpy as jnp

    return jax.tree.map(jnp.array, {m: params[m] for m in modules})


def make_ema_update(decay: float):
    """Jitted ``ema = decay * ema + (1 - decay) * params`` over the
    tracked subset; the old EMA buffer is donated."""

    @functools.partial(jax.jit, donate_argnums=0)
    def update(ema, sub_params):
        return jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            ema,
            sub_params,
        )

    return update


def tracked(params: dict, ema: dict) -> dict:
    """The subset of ``params`` the EMA tree tracks (same structure)."""
    return {m: params[m] for m in ema}


def swap_in(state, ema: dict):
    """State with the EMA averages substituted for the tracked modules
    (for sampling; the returned state must not be trained further)."""
    return state.replace(params={**state.params, **ema})
