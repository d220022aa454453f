"""Bi-LSTM mask estimator.

The reference's roadmap names an RNN-BLSTM mask model as the next model
family (TODO:10 "Try different types of models. RNN-BLSTM ..."), and
BASELINE.json's north star includes a "U-Net/Bi-LSTM mask predictor".
This is that family, TPU-first: frames are the scan axis (lax.scan under
flax.linen.RNN), each frame's (F x C) features are projected to a hidden
vector, two stacked bidirectional LSTM layers model temporal context, and
a per-frame dense head emits the (F,) sigmoid mask.

Unlike the conv U-Nets this model is causal-splittable: ``unidirectional``
drops the backward pass for a streaming-capable variant with frame-level
latency (pairs with azoom.stream.online).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["BLSTMMaskNet"]


class BLSTMMaskNet(nn.Module):
    """(B, F, T, C) features -> (B, F, T) mask."""

    hidden: int = 256
    n_layers: int = 2
    unidirectional: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # train kept for API parity
        B, F, T, C = x.shape
        h = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, F * C).astype(self.dtype)
        # Input conditioning: raw log-magnitude spans ~[-16, 0] which stalls
        # tanh/LSTM gates (the conv models get this from their BatchNorms).
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        h = nn.tanh(h)

        for i in range(self.n_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                name=f"lstm_fwd_{i}",
            )(h)
            if self.unidirectional:
                h = fwd
            else:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                    reverse=True, keep_order=True, name=f"lstm_bwd_{i}",
                )(h)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            h = nn.Dense(self.hidden, dtype=self.dtype)(h)
            h = nn.tanh(h)

        mask = nn.Dense(F, dtype=jnp.float32)(h.astype(jnp.float32))  # (B, T, F)
        return nn.sigmoid(jnp.transpose(mask, (0, 2, 1)))
