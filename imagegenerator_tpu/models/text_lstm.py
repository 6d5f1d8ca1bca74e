"""Legacy bidirectional-LSTM text encoder.

Capability match for ``/root/reference/textEmbed.py:5-26``: frozen
pretrained embedding -> bidirectional LSTM (batch-first) -> sum over
timesteps -> Linear(2*hidden, tem_size).

TPU-native formulation: the recurrence runs under ``lax.scan`` (via
flax's ``nn.RNN``) so the whole sequence compiles to one XLA while-loop
with static shapes, and the two directions share one scan each.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from imagegenerator_tpu.ops.layers import Dense


class TextEmbeddingLSTM(nn.Module):
    vocab_size: int
    embed_size: int = 300
    hidden_size: int = 256
    num_layers: int = 1
    tem_size: int = 512
    freeze_embedding: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        # tokens: (B, T) int32
        emb = nn.Embed(
            self.vocab_size, self.embed_size, param_dtype=self.param_dtype
        )(tokens)
        if self.freeze_embedding:
            # The reference loads frozen GloVe vectors (utils.py:3-5);
            # freezing = stop-gradient on the embedding output.
            emb = jax.lax.stop_gradient(emb)
        x = emb
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.LSTMCell(self.hidden_size), name=f"lstm_fwd_{layer}")
            bwd = nn.RNN(
                nn.LSTMCell(self.hidden_size),
                reverse=True,
                keep_order=True,
                name=f"lstm_bwd_{layer}",
            )
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        h_sum = jnp.sum(x, axis=1)  # sum over timesteps (textEmbed.py:24)
        return Dense(self.tem_size, param_dtype=self.param_dtype)(h_sum)
