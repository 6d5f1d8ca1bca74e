"""Narrow-bits dropout: ``nn.Dropout`` semantics with a 16-bit mask draw.

Motivation (``benchmarks/PROFILE_train_r04.md``): the stage-1 step's 25
hidden-dropout sites cost ~4.7 ms/step (2.4% — the ``lt + jit(_uniform)``
op class). Under the ``rbg`` PRNG the mask bits come from XLA's
``RngBitGenerator``, a *non-fusible* HLO that materializes its output
buffer to HBM: ``nn.Dropout`` draws 32 bits per element, so a
``(256, 128, 768)`` activation costs ~100 MB written + re-read per site.
Drawing ``uint16`` bits halves that traffic for the same decision.

Semantics: identical unbiased dropout, different keep-probability
quantization. The keep decision is ``bits >= round(rate * 2**16)`` and
kept values are rescaled by the EXACT quantized keep probability
(rate 0.1 -> drop 6554/65536 = 0.10000610..., rescale by
1/(1 - 6554/65536)), so ``E[dropout(x)] == x`` holds exactly — the same
contract as ``nn.Dropout``, whose own f32-uniform comparison quantizes
the rate to the 2^-24 uniform grid. The mask BITSTREAM differs from
``nn.Dropout``'s, which is already the headline policy for training
benches (no JAX bitstream was ever faithful to the reference's torch
CPU-generator noise, ``/root/reference/stage_1_train_fn.py:98-106``);
the threefry+32-bit path stays the goldens default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["bits_dropout", "BitsDropout"]


def bits_dropout(x, key, rate: float, bits: int = 16):
    """Apply unbiased dropout with a ``bits``-wide mask draw.

    ``bits`` must be 8, 16, or 32. The effective drop probability is
    ``round(rate * 2**bits) / 2**bits`` (exact-rate at bits=32 up to the
    same rounding any finite bitstream imposes); kept values are scaled
    by the exact quantized keep probability.

    Quantization edge cases are errors, not silent behavior changes:
    a positive rate below ``0.5 / 2**bits`` would quantize to thr == 0
    (dropout silently OFF), and a rate within ``1 / 2**bits`` of 1.0
    would quantize to thr == 2**bits (keep probability exactly 0, and
    the threshold overflows the draw dtype) — both raise ValueError
    telling the caller to widen ``bits``.
    """
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0, 1), got {rate}")
    dtype = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}[bits]
    n = 1 << bits
    thr = int(round(rate * n))
    if rate > 0.0 and thr == 0:
        raise ValueError(
            f"rate={rate} quantizes to 0 at bits={bits} (dropout would be"
            " silently disabled); use more bits for rates this small"
        )
    if thr >= n:
        raise ValueError(
            f"rate={rate} quantizes to keep probability 0 at bits={bits};"
            " use more bits for rates this close to 1"
        )
    if thr == 0:
        return x
    keep_prob = 1.0 - thr / n
    draw = jax.random.bits(key, x.shape, dtype=dtype)
    keep = draw >= jnp.asarray(thr, dtype)
    return jnp.where(keep, x / jnp.asarray(keep_prob, x.dtype), 0)


class BitsDropout(nn.Module):
    """Drop-in for ``nn.Dropout(rate)`` using :func:`bits_dropout`.

    Same ``"dropout"`` RNG collection and ``deterministic`` contract as
    ``nn.Dropout``; no params, so module trees are interchangeable.
    """

    rate: float
    bits: int = 16

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        return bits_dropout(x, self.make_rng("dropout"), self.rate, self.bits)
