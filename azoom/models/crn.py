"""CRN — convolutional recurrent mask estimator.

The plain BLSTM (azoom.models.blstm) bottlenecks all 513 frequency bins
through one dense projection and learns poorly; the standard fix in the
speech-enhancement literature is the CRN shape: a frequency-strided conv
encoder compresses each frame to an embedding, LSTMs model time, and a
mirrored transposed-conv decoder (with skip connections) restores full
frequency resolution. Causal when ``unidirectional`` — the conv stack only
touches the frequency axis (kernel 1 in time), so total algorithmic
latency stays one STFT hop, pairing with azoom.stream.online /
pipelines.online_learned like the plain BLSTM.

This is the reference roadmap's "RNN-BLSTM / CNN" family (TODO:10) done
properly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["CRNMaskNet"]


class _FreqDown(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, F, T, C) -> (B, F/2, T, features); time axis untouched.
        x = nn.Conv(self.features, (5, 1), strides=(2, 1), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.elu(x)


class _FreqUp(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features, (5, 1), strides=(2, 1),
                             padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.elu(x)


class CRNMaskNet(nn.Module):
    """(B, F, T, C) -> (B, F, T) mask. F must satisfy F % 8 in {0, 1}
    (513 works: odd sizes are padded/cropped around the conv stack).

    Streaming: every conv has time-kernel 1, so the ONLY time state is the
    LSTM carries. Pass ``carries`` (from :meth:`initial_carries`) and
    ``return_carries=True`` to process a block of frames (e.g. T=1, one
    hop) and get the carry forward — exact hop-granularity streaming with
    no approximation (used by azoom.stream.lowlat). Requires
    ``unidirectional=True``.
    """

    base: int = 16
    hidden: int = 128
    n_lstm: int = 2
    unidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    def initial_carries(self, batch: int = 1):
        """Zero LSTM carries ((c, h) per layer) for a fresh stream."""
        z = lambda: (
            jnp.zeros((batch, self.hidden), self.dtype),
            jnp.zeros((batch, self.hidden), self.dtype),
        )
        return tuple(z() for _ in range(self.n_lstm))

    @nn.compact
    def __call__(self, x, train: bool = False, carries=None,
                 return_carries: bool = False):
        if carries is not None and not self.unidirectional:
            raise ValueError("streaming carries require unidirectional=True")
        B, F, T, C = x.shape
        d = self.dtype
        pad_f = (-F) % 8
        h = jnp.pad(x, ((0, 0), (0, pad_f), (0, 0), (0, 0))).astype(d)

        e1 = _FreqDown(self.base, d)(h, train)        # F/2
        e2 = _FreqDown(self.base * 2, d)(e1, train)   # F/4
        e3 = _FreqDown(self.base * 4, d)(e2, train)   # F/8

        Bf, Fr, Tr, Cr = e3.shape
        seq = jnp.transpose(e3, (0, 2, 1, 3)).reshape(Bf, Tr, Fr * Cr)
        seq = nn.Dense(self.hidden, dtype=d)(seq)
        out_carries = []
        for i in range(self.n_lstm):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=d),
                         name=f"lstm_fwd_{i}")
            if carries is not None:
                carry, fwd = rnn(seq, initial_carry=carries[i],
                                 return_carry=True)
                out_carries.append(carry)
            else:
                fwd = rnn(seq)
            if self.unidirectional:
                seq = fwd
            else:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=d),
                             reverse=True, keep_order=True,
                             name=f"lstm_bwd_{i}")(seq)
                seq = jnp.concatenate([fwd, bwd], axis=-1)
        seq = nn.Dense(Fr * Cr, dtype=d)(seq)
        bott = jnp.transpose(seq.reshape(Bf, Tr, Fr, Cr), (0, 2, 1, 3))

        u3 = _FreqUp(self.base * 2, d)(
            jnp.concatenate([bott, e3], -1), train)  # F/4
        u2 = _FreqUp(self.base, d)(
            jnp.concatenate([u3, e2], -1), train)    # F/2
        u1 = _FreqUp(self.base, d)(
            jnp.concatenate([u2, e1], -1), train)    # F

        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(u1.astype(jnp.float32))
        mask = nn.sigmoid(out[:, :F, :, 0])
        if return_carries:
            return mask, tuple(out_carries)
        return mask
