"""Prompt parsing and the CLIP spherical-distance prompt loss.

Reference semantics:

* ``split_prompt`` parses ``"text:weight:stop"`` with defaults
  (1, -inf) (``/root/reference/v2_implementation/utils.py:4-7``).
* ``Prompt`` loss (``generate.py:53-68``): squared spherical distance
  between normalized image and text embeddings,
  ``(||u - v|| / 2).arcsin()^2 * 2``, sign-flipped by the weight's sign
  (negative prompts push away), floored at ``stop`` via replace_grad
  (gradients vanish once the distance passes the stop threshold), then
  scaled by |weight| and averaged over cutouts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from imagegenerator_tpu.ops.grad_utils import replace_grad


def split_prompt(prompt: str) -> tuple[str, float, float]:
    """'text:weight:stop' -> (text, weight, stop); missing fields default
    to weight=1, stop=-inf."""
    parts = prompt.rsplit(":", 2)
    text = parts[0]
    weight = float(parts[1]) if len(parts) > 1 and parts[1] else 1.0
    stop = float(parts[2]) if len(parts) > 2 and parts[2] else float("-inf")
    return text, weight, stop


class PromptSpec(NamedTuple):
    embed: jnp.ndarray  # (1, D) CLIP text embedding (unnormalized)
    weight: jnp.ndarray  # scalar
    stop: jnp.ndarray  # scalar


def spherical_dist(u, v):
    """Squared spherical distance between L2-normalized rows of u (N, D)
    and v (M, D) -> (N, M). The arcsin argument is clamped to [0, 1]:
    for near-antipodal embeddings float error can push ||diff||/2 past
    1.0, which would NaN both the value and the gradient."""
    un = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    vn = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    diff = un[:, None, :] - vn[None, :, :]
    # eps inside the sqrt keeps the norm's gradient finite at diff == 0;
    # the upper clamp stays strictly below 1 so arcsin' stays finite.
    norm = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)
    half = jnp.clip(norm / 2.0, 0.0, 1.0 - 1e-7)
    return jnp.square(jnp.arcsin(half)) * 2.0


def prompt_loss(image_embeds: jnp.ndarray, spec: PromptSpec) -> jnp.ndarray:
    """image_embeds: (N_cutouts, D). Returns the scalar prompt loss."""
    dists = spherical_dist(image_embeds, spec.embed)  # (N, 1)
    dists = dists * jnp.sign(spec.weight)
    floored = replace_grad(dists, jnp.maximum(dists, spec.stop))
    return jnp.abs(spec.weight) * floored.mean()
