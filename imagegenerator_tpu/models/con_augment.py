"""Conditioning Augmentation (StackGAN).

VAE-style reparameterized conditioning on the text embedding
(reference ``/root/reference/con_augment.py:6-22``):

    tem (tem_size) -> relu(Linear(h_dim)) -> mu, sigma (c_dim each)
    c_hat = mu + sigma * eps,  eps ~ N(0, I)

The PRNG key is threaded explicitly (no hidden RNG state): callers pass
the key via flax's ``rngs={'noise': key}``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagegenerator_tpu.ops.layers import Dense


class ConditioningAugmentation(nn.Module):
    h_dim: int = 256
    c_dim: int = 128
    param_dtype: Any = jnp.float32

    def setup(self):
        self.h = Dense(self.h_dim, param_dtype=self.param_dtype)
        self.mu = Dense(self.c_dim, param_dtype=self.param_dtype)
        self.sigma = Dense(self.c_dim, param_dtype=self.param_dtype)

    def encode(self, tem):
        h = jax.nn.relu(self.h(tem))
        return self.mu(h), self.sigma(h)

    def __call__(self, tem):
        mu, sigma = self.encode(tem)
        eps = jax.random.normal(self.make_rng("noise"), sigma.shape, sigma.dtype)
        c_hat = mu + sigma * eps
        return c_hat, mu, sigma
