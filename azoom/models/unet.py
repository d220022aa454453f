"""Frequency-preserving U-Net mask estimators (Flax).

TPU-native re-designs of the reference's three mask-estimator generations:

  * ``FreqPreservingUNet`` — 3-level U-Net whose pooling/upsampling touch
    ONLY the time axis so frequency resolution is never lost
    (full_audio_generating_pipeline/model_training.py:95-136).
  * ``DeepFPU`` — the same skeleton deepened with residual blocks: 4
    encoder levels + 512-channel bottleneck with two ResBlocks
    (resnet_model_mvdr/inference.py:38-137; Keras twin
    tf_lite_version/model_neural.py:97-152).

Design differences from the reference (deliberate, TPU-first):
  * channels-LAST (B, F, T, C) layout — XLA's native TPU conv layout; the
    torch originals are NCHW.
  * ``dtype`` parameter for bfloat16 activations (params stay float32) —
    convs land on the MXU at full throughput.
  * ``quant=True`` switches every 3x3 conv to int8 x int8 -> int32 MXU
    compute (``QConv``): weights are quantized per-output-channel and
    activations per-tensor on the fly, so the parameter tree (and thus
    every bundled checkpoint) is unchanged. v5e's int8 MXU path runs the
    large conv layers ~1.7x faster than bf16 (measured, see RESULTS.md);
    the reference's analogue is the dynamic-range-quantized TFLite
    interpreter (tf_lite_version/model_neural.py:180-187).
  * inputs are padded to a multiple of 2^depth time frames by the caller
    (``pad_frames``) so every shape is static under jit; the reference
    instead patches mismatches with nearest interpolation at runtime
    (``_match``, model_training.py:119-122).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "FreqPreservingUNet", "DeepFPU", "TPUFPU", "QConv", "FreqAttention",
    "pad_frames", "time_pool_factor", "fold_freq", "unfold_freq",
    "fold_time", "unfold_time",
]


def fold_freq(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """Space-to-depth on the frequency axis: (..., F, T, C) ->
    (..., ceil(F/fold), T, fold*C), zero-padding F up to a multiple of
    ``fold``. Bin k of the input lands in folded row k//fold, channel
    group k%fold — :func:`unfold_freq` is the exact inverse per lane."""
    F = x.shape[-3]
    pad_f = (-F) % fold
    if pad_f:
        widths = [(0, 0)] * (x.ndim - 3) + [(0, pad_f), (0, 0), (0, 0)]
        x = jnp.pad(x, widths)
    shape = x.shape
    Fp = shape[-3] // fold
    x = x.reshape(shape[:-3] + (Fp, fold, shape[-2], shape[-1]))
    x = jnp.moveaxis(x, -3, -2)  # (..., Fp, T, fold, C)
    return x.reshape(shape[:-3] + (Fp, shape[-2], fold * shape[-1]))


def unfold_freq(y: jnp.ndarray, fold: int, n_freqs: int) -> jnp.ndarray:
    """Depth-to-space inverse of :func:`fold_freq` for one lane per
    folded bin: (..., Fp, T, fold) -> (..., n_freqs, T)."""
    y = jnp.moveaxis(y, -1, -2)  # (..., Fp, fold, T)
    y = y.reshape(y.shape[:-3] + (y.shape[-3] * fold, y.shape[-1]))
    return y[..., :n_freqs, :]


def fold_time(x: jnp.ndarray, tfold: int) -> jnp.ndarray:
    """Space-to-depth on the time axis: (..., T, C) ->
    (..., ceil(T/tfold), tfold*C), zero-padding T up to a multiple of
    ``tfold``. Frame t of the input lands in folded row t//tfold,
    channel group t%tfold — :func:`unfold_time` is the exact inverse."""
    t = x.shape[-2]
    pad_t = (-t) % tfold
    if pad_t:
        widths = [(0, 0)] * x.ndim
        widths[-2] = (0, pad_t)
        x = jnp.pad(x, widths)
    shape = x.shape
    tp = shape[-2] // tfold
    x = x.reshape(shape[:-2] + (tp, tfold, shape[-1]))
    return x.reshape(shape[:-2] + (tp, tfold * shape[-1]))


def unfold_time(y: jnp.ndarray, tfold: int, n_frames: int) -> jnp.ndarray:
    """Depth-to-space inverse of :func:`fold_time`:
    (..., Tp, tfold*C) -> (..., min(Tp*tfold, n_frames), C)."""
    tp, ch = y.shape[-2], y.shape[-1]
    c = ch // tfold
    y = y.reshape(y.shape[:-1] + (tfold, c))
    y = y.reshape(y.shape[:-3] + (tp * tfold, c))
    return y[..., :n_frames, :]


class QConv(nn.Module):
    """Drop-in ``nn.Conv`` replacement computing int8 x int8 -> int32 on
    the MXU (v5e: 2x the bf16 macs/cycle). Same parameter tree as nn.Conv
    ("kernel" (kh, kw, cin, cout) float32 + "bias"), so bundled float
    checkpoints load unchanged; quantization happens inside the graph:
    per-output-channel symmetric weight scales, per-tensor activation
    scale, dequantized into ``dtype`` after the conv.

    Activation scale, three modes:
      * default — dynamic (max-abs of the tensor, computed per call);
      * calibration — ``apply(..., mutable=["quant_stats"])`` records the
        running 99.9th percentile of |x| into a ``quant_stats/act_scale``
        variable (:func:`azoom.models.quantize.calibrate_act_scales`).
        Percentile, not max: post-ReLU activations are heavy-tailed, and
        measured SIR is *better* when the rare outliers clip than when
        the whole tensor is coded at outlier resolution (max-abs
        calibration cost ~6 dB blind SIR; percentile matches the float
        path — RESULTS.md);
      * serving — when the variables carry that ``quant_stats``
        collection, the stored static scale is used, removing the
        full-tensor reduction from the hot path (measured 1.27x
        end-to-end on v5e, see RESULTS.md).
    The collection is never created at ``init``, so the parameter tree —
    and thus every bundled checkpoint — is unchanged.

    SERVING ONLY: ``jnp.round`` has zero gradient, so a ``quant=True``
    model cannot learn (no straight-through estimator by design — train
    float, serve int8; the parameter-tree compatibility above is exactly
    what makes that free).
    """

    _CALIB_PCT = 99.9  # |x| percentile recorded during calibration

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_size + (cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(jnp.float32)
        w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
        w_scale = jnp.where(w_scale == 0, 1.0, w_scale)
        w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        calibrating = (
            not self.is_initializing()
            and self.is_mutable_collection("quant_stats")
        )
        if calibrating:
            pct = jnp.percentile(jnp.abs(xf), self._CALIB_PCT) / 127.0 + 1e-30
            obs = self.variable(
                "quant_stats", "act_scale",
                lambda: jnp.zeros((), jnp.float32),
            )
            obs.value = jnp.maximum(obs.value, pct)
            # Forward-propagate with the same percentile scale being
            # recorded, so deeper layers calibrate on the activation
            # distribution they will actually see at serving time.
            x_scale = pct
        elif self.has_variable("quant_stats", "act_scale"):
            x_scale = self.get_variable("quant_stats", "act_scale")
        else:
            x_scale = jnp.max(jnp.abs(xf)) / 127.0 + 1e-30
        x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)

        if not self.is_initializing() and self.is_mutable_collection("quant_debug"):
            # Ablation instrumentation (not on any serving path): fraction
            # of activations the static scale clips, and how far past the
            # code range the worst one lands — apply(...,
            # mutable=["quant_debug"]) to read per-layer saturation.
            dbg = self.variable(
                "quant_debug", "clip_frac", lambda: jnp.zeros((), jnp.float32)
            )
            dbg.value = jnp.mean((jnp.abs(xf) > 127.0 * x_scale).astype(jnp.float32))
            over = self.variable(
                "quant_debug", "overshoot", lambda: jnp.zeros((), jnp.float32)
            )
            over.value = jnp.max(jnp.abs(xf)) / (127.0 * x_scale)

        dn = jax.lax.conv_dimension_numbers(
            x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x_q, w_q, (1, 1), self.padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (x_scale * w_scale) + bias
        return y.astype(self.dtype)


def time_pool_factor(depth: int) -> int:
    """Total time-axis downsampling of a depth-level U-Net."""
    return 2**depth


def pad_frames(x: jnp.ndarray, multiple: int, axis: int = -2) -> tuple[jnp.ndarray, int]:
    """Zero-pad the time axis (default: axis -2 of (..., F, T, C)) to a
    multiple; returns (padded, original_length)."""
    t = x.shape[axis]
    pad = (-t) % multiple
    if pad == 0:
        return x, t
    widths = [(0, 0)] * x.ndim
    widths[axis % x.ndim] = (0, pad)
    return jnp.pad(x, widths), t


def _conv3x3(features, dtype, quant, name):
    """nn.Conv or its int8 twin, pinned to the nn.Conv auto-name so the
    parameter tree is identical either way (checkpoint-compatible)."""
    if quant:
        return QConv(features, (3, 3), padding="SAME", dtype=dtype, name=name)
    return nn.Conv(features, (3, 3), padding="SAME", dtype=dtype, name=name)


class ConvBNRelu(nn.Module):
    """Conv 3x3 -> BatchNorm -> ReLU (the reference's basic cell)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv3x3(self.features, self.dtype, self.quant, "Conv_0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """Two ConvBNRelu cells (model_training.py:113-117 ``_conv``)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.features, self.dtype, self.quant)(x, train)
        return ConvBNRelu(self.features, self.dtype, self.quant)(x, train)


class ResBlock(nn.Module):
    """Residual block: x + BN(Conv(ReLU(BN(Conv(x))))), then ReLU
    (resnet_model_mvdr/inference.py:38-51)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv3x3(self.features, self.dtype, self.quant, "Conv_0")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _conv3x3(self.features, self.dtype, self.quant, "Conv_1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        return nn.relu(x + h)


class FreqAttention(nn.Module):
    """Frequency-axis transformer block for the TPUFPU bottleneck.

    A 3x3 conv stack at fold=4 sees only a ~dozen-bin neighborhood per
    level, so the bottleneck's receptive field covers a fraction of the
    513-bin band — but speech masks have GLOBAL frequency structure
    (harmonic stacks of one f0 light up together, and the IPD cue is
    coherent across the whole band for one bearing). This block gives
    every bottleneck position one global look along frequency: pre-LN
    multi-head self-attention over the folded-frequency axis (tokens =
    Fp subband rows, batch = B x T_bottleneck) plus a 2x-expansion MLP,
    both residual. All compute is dense matmuls (MXU) in ``dtype``; at
    nano-bottleneck shapes it adds ~1.5 % of the net's MACs.

    TPU-native addition; the closest reference artifact is the roadmap
    item "Add model usage options (RNN-BLSTM, CNN, ...)" (TODO:7) — the
    reference's model zoo itself is conv-only
    (resnet_model_mvdr/inference.py:53-137).
    """

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, Fp, T, C)
        c = x.shape[-1]
        fp = x.shape[-3]
        h = x.astype(self.dtype).swapaxes(-3, -2)  # (B, T, Fp, C)
        # Learned frequency-position embedding: attention is permutation-
        # invariant, but subband identity (absolute frequency) matters.
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (fp, c), jnp.float32
        )
        attn_in = nn.LayerNorm(dtype=self.dtype)(h) + pos.astype(self.dtype)
        h = h + nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, deterministic=True
        )(attn_in, attn_in)
        mlp_in = nn.LayerNorm(dtype=self.dtype)(h)
        m = nn.Dense(2 * c, dtype=self.dtype)(mlp_in)
        m = nn.Dense(c, dtype=self.dtype)(nn.gelu(m))
        return (h + m).swapaxes(-3, -2)  # back to (B, Fp, T, C)


def _pool_time(x):
    """MaxPool (1, 2): halve the time axis only."""
    return nn.max_pool(x, window_shape=(1, 2), strides=(1, 2))


def _up_time(x, features, dtype):
    """ConvTranspose (1, 2) stride (1, 2): double the time axis only."""
    return nn.ConvTranspose(features, (1, 2), strides=(1, 2), dtype=dtype)(x)


class FreqPreservingUNet(nn.Module):
    """3-level frequency-preserving U-Net -> sigmoid mask.

    Input (B, F, T, C) with T % 8 == 0; output (B, F, T).
    """

    base: int = 32
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, q = self.dtype, self.quant
        x = x.astype(d)
        e1 = DoubleConv(self.base, d, q)(x, train)
        e2 = DoubleConv(self.base * 2, d, q)(_pool_time(e1), train)
        e3 = DoubleConv(self.base * 4, d, q)(_pool_time(e2), train)
        b = DoubleConv(self.base * 8, d, q)(_pool_time(e3), train)

        u3 = _up_time(b, self.base * 4, d)
        d3 = DoubleConv(self.base * 4, d, q)(jnp.concatenate([u3, e3], -1), train)
        u2 = _up_time(d3, self.base * 2, d)
        d2 = DoubleConv(self.base * 2, d, q)(jnp.concatenate([u2, e2], -1), train)
        u1 = _up_time(d2, self.base, d)
        d1 = DoubleConv(self.base, d, q)(jnp.concatenate([u1, e1], -1), train)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(d1.astype(jnp.float32))
        return nn.sigmoid(out)[..., 0]


class DeepFPU(nn.Module):
    """4-level residual frequency-preserving U-Net -> sigmoid mask.

    Input (B, F, T, C) with T % 16 == 0; output (B, F, T). ``in_channels``
    is inferred from the input; use C=2 (gen 3) or C=4 physics-aware (gen 4).
    """

    base: int = 32
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, q = self.dtype, self.quant
        x = x.astype(d)

        def enc_level(h, feats, first=False):
            if first:
                return DoubleConv(feats, d, q)(h, train)
            h = ConvBNRelu(feats, d, q)(h, train)
            return ResBlock(feats, d, q)(h, train)

        e1 = enc_level(x, self.base, first=True)
        e2 = enc_level(_pool_time(e1), self.base * 2)
        e3 = enc_level(_pool_time(e2), self.base * 4)
        e4 = enc_level(_pool_time(e3), self.base * 8)

        b = ConvBNRelu(self.base * 16, d, q)(_pool_time(e4), train)
        b = ResBlock(self.base * 16, d, q)(b, train)
        b = ResBlock(self.base * 16, d, q)(b, train)

        def dec_level(h, skip, feats, last=False):
            h = _up_time(h, feats, d)
            h = jnp.concatenate([h, skip], -1)
            if last:
                return DoubleConv(feats, d, q)(h, train)
            h = ConvBNRelu(feats, d, q)(h, train)
            return ResBlock(feats, d, q)(h, train)

        h = dec_level(b, e4, self.base * 8)
        h = dec_level(h, e3, self.base * 4)
        h = dec_level(h, e2, self.base * 2)
        h = dec_level(h, e1, self.base, last=True)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(h.astype(jnp.float32))
        return nn.sigmoid(out)[..., 0]


class TPUFPU(nn.Module):
    """MXU-shaped deep FPU: frequency space-to-depth stem -> residual
    U-Net -> per-subband mask head.

    The reference nets (and their azoom twins above) start with 32-64
    channel convs over the full 513-bin frequency axis; the v5e MXU is
    128 lanes wide, so those early levels run at 25-50 % lane utilization
    and dominate the step. TPUFPU folds ``fold`` adjacent frequency bins
    into channels at the stem ((B, F, T, C) -> (B, F/fold, T, fold*C)),
    so every conv level runs at >= ``base`` channels on fold-x fewer
    spatial rows, then unfolds at the head (a conv predicting ``fold``
    mask lanes per subband position). Frequency resolution of the *mask*
    is fully preserved — only the conv grid is coarser. External contract:
    (B, F, T, C) with T % 8 == 0 -> (B, F, T) (the default pad_frames
    multiple of 16 works unchanged).

    No reference counterpart (a TPU-native addition; the reference's
    model zoo is the FPU/DeepFPU family, resnet_model_mvdr/inference.py:
    53-137).

    ``bneck`` scales the bottleneck width (channels = base * bneck).
    The default 8 matches the DeepFPU ratio and every bundled artifact;
    the round-3 speed-of-light study showed the net runs at the chip's
    int8 ceiling, so further speed must come from FLOPs — the bottleneck
    level (5 convs at base*8 on T/8 frames) is 44 % of the net's MACs,
    and the round-2 capacity ablation (base=96: +0.003 acc) says
    capacity is saturated. bneck=4 cuts total MACs ~32 %.

    ``dec_div`` divides the width of the non-final decoder levels (the
    skip connections carry the full-width detail to the head, so the
    decoder is a refiner, not the representation). After bneck=4 the MAC
    center of gravity moves to the decoder (d3 31 % + d2 19 % of the
    slim net); dec_div=2 runs d3 at 128 and d2 at 64 channels (every
    conv still >= 64 lanes) and cuts the slim net's MACs a further 34 %.
    Default 1 = every bundled artifact's tree.

    ``enc_div`` divides the width of the non-first encoder levels (e2,
    e3) the same way — after bneck=4 + dec_div=2 they are the remaining
    MAC mass (~37 %). Unlike the decoder these ARE the representation
    (and the skip sources), so this knob is the riskiest cut; enc_div=2
    keeps every conv >= 64 lanes (e2 64, e3 128 channels).
    Default 1 = every bundled artifact's tree.

    ``tfold`` space-to-depths the TIME axis at the stem the same way
    ``fold`` does frequency ((..., Fp, T, C) -> (..., Fp, T/tfold,
    tfold*C)); the head predicts ``fold*tfold`` fresh mask lanes per grid
    position, so mask resolution on BOTH axes is fully preserved — only
    the conv grid is coarser. After the width knobs above, the remaining
    MAC mass is roughly uniform across levels, so tfold=2 halves every
    level's rows (~1.8x MAC cut; the stem conv is cin-compensated).
    Masks are far smoother in time (phoneme rate, ~50-100 ms) than in
    frequency (harmonic structure — where fold=8 cost 1.45 dB), so time
    is the cheaper axis to coarsen: at hop=512 a tfold=2 grid cell is
    64 ms. Contract with tfold=2: T % 16 == 0, which the universal
    pad_frames multiple of 16 already guarantees.
    Default 1 = every bundled artifact's tree through tpufpu_nano.

    ``fattn`` (number of heads; 0 = off) inserts a :class:`FreqAttention`
    transformer block after the bottleneck ResBlocks — one global look
    along the frequency axis per bottleneck frame, where the conv tree's
    receptive field is only a local band. Attention/MLP matmuls run in
    ``dtype`` (bf16 on TPU) regardless of ``quant`` (they are ~1.5 % of
    the MACs; int8 would buy nothing). Default 0 = every bundled
    artifact's tree through tpufpu_nano.
    """

    base: int = 64
    fold: int = 4
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    bneck: int = 8
    dec_div: int = 1
    enc_div: int = 1
    tfold: int = 1
    fattn: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, q, fold = self.dtype, self.quant, self.fold
        F = x.shape[-3]
        T = x.shape[-2]
        x = fold_freq(x, fold).astype(d)
        if self.tfold > 1:
            x = fold_time(x, self.tfold)

        def enc_level(h, feats, first=False):
            if first:
                return DoubleConv(feats, d, q)(h, train)
            h = ConvBNRelu(feats, d, q)(h, train)
            return ResBlock(feats, d, q)(h, train)

        e1 = enc_level(x, self.base, first=True)
        e2 = enc_level(_pool_time(e1), self.base * 2 // self.enc_div)
        e3 = enc_level(_pool_time(e2), self.base * 4 // self.enc_div)

        b = ConvBNRelu(self.base * self.bneck, d, q)(_pool_time(e3), train)
        b = ResBlock(self.base * self.bneck, d, q)(b, train)
        b = ResBlock(self.base * self.bneck, d, q)(b, train)
        if self.fattn > 0:
            b = FreqAttention(self.fattn, d)(b)

        def dec_level(h, skip, feats, last=False):
            h = _up_time(h, feats, d)
            h = jnp.concatenate([h, skip], -1)
            if last:
                return DoubleConv(feats, d, q)(h, train)
            h = ConvBNRelu(feats, d, q)(h, train)
            return ResBlock(feats, d, q)(h, train)

        h = dec_level(b, e3, self.base * 4 // self.dec_div)
        h = dec_level(h, e2, self.base * 2 // self.dec_div)
        h = dec_level(h, e1, self.base, last=True)

        # Head: one mask lane per folded (bin, frame), depth-to-space back.
        out = nn.Conv(fold * self.tfold, (1, 1), dtype=jnp.float32)(
            h.astype(jnp.float32))
        if self.tfold > 1:
            # (..., Fp, Tp, tfold*fold) -> (..., Fp, T, fold): lane
            # layout (tfold, fold), time-major — unfold time first.
            out = unfold_time(out, self.tfold, T)
        return nn.sigmoid(unfold_freq(out, fold, F))
