"""Optax equivalents of the reference's optimizer/scheduler stack.

Reference (``/root/reference/train.py:88-113``): Adam(lr=1e-3, betas
(0.9, 0.999)) for all GAN modules, AdamW(lr=5e-5) for the text encoder,
each wrapped in ``StepLR(step_size=100, gamma=0.5)``.

The reference steps its schedulers once per *batch* and only on the master
replica (stage_1_train_fn.py:187-192) — master-only stepping is a bug
(replica LR divergence); we step per global optimizer step on every
replica, which is what the master-replica behavior would have been had it
been synced.
"""

from __future__ import annotations

import optax


def step_lr(base_lr: float, step_size: int = 100, gamma: float = 0.5):
    """StepLR: lr * gamma^(floor(step / step_size))."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )


def adam_with_steplr(lr: float = 1e-3, step_size: int = 100, gamma: float = 0.5):
    """Adam(0.9, 0.999) + StepLR — the reference's GAN-module optimizer."""
    return optax.adam(step_lr(lr, step_size, gamma), b1=0.9, b2=0.999, eps=1e-8)


def adamw_with_steplr(lr: float = 5e-5, step_size: int = 100, gamma: float = 0.5):
    """AdamW (torch default weight_decay=0.01) + StepLR — the text-encoder
    optimizer (train.py:88)."""
    return optax.adamw(
        step_lr(lr, step_size, gamma), b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
    )
