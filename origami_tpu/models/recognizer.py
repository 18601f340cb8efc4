"""Line text recognizer: CNN + BiLSTM + CTC (Flax).

The TPU-native counterpart of the reference's Calamari OCR models
(origami/batch/detect/ocr.py:33-67, CNN+LSTM+CTC at line height 48/56).
Lines are width-bucketed and padded so every bucket compiles once; the
recurrent sweep is an nn.scan'd LSTM (unrolled by XLA over the time axis),
and everything before it is MXU-friendly convs over (B, H, W, 1) strips.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class BiLSTM(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        # x: (B, T, F); lengths (B,) int. seq_lengths makes the
        # backward sweep start at each row's LAST VALID frame instead
        # of the bucket end — without it, logits depend on how much
        # padding the compile bucket adds (not bucket-invariant, and
        # device-batched strips would decode differently than
        # host-bucketed ones).
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.features,
                                          dtype=self.dtype))(
            x, seq_lengths=lengths)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.features,
                                          dtype=self.dtype),
                     reverse=True,
                     keep_order=True)(x, seq_lengths=lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics ignore width padding.

    nn.GroupNorm reduces over the full (H, W, C/G) extent, so a line's
    normalized values depend on how much padding its compile bucket
    adds — the same strip decodes differently at bucket 128 vs 512.
    Masking the stats to the valid width makes logits bucket-invariant
    (device-batched and host-bucketed strips agree exactly). Parameter
    names/shapes match nn.GroupNorm ("scale"/"bias" per channel), so
    checkpoints are interchangeable.
    """

    num_groups: int

    @nn.compact
    def __call__(self, x, t_len):
        # x (B, H, W, C); t_len (B,) valid width
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        b, h, w, _ = xf.shape
        xg = xf.reshape(b, h, w, g, c // g)
        mask = (jnp.arange(w)[None, :] < t_len[:, None]) \
            .astype(jnp.float32)[:, None, :, None, None]
        cnt = jnp.maximum(
            jnp.sum(mask * jnp.ones_like(xg), axis=(1, 2, 4),
                    keepdims=True), 1e-6)
        mean = jnp.sum(xg * mask, axis=(1, 2, 4), keepdims=True) / cnt
        var = jnp.sum(((xg - mean) * mask) ** 2,
                      axis=(1, 2, 4), keepdims=True) / cnt
        y = (xg - mean) / jnp.sqrt(var + 1e-6)
        y = y.reshape(b, h, w, c)
        return (y * scale + bias).astype(x.dtype)


class LineRecognizer(nn.Module):
    """(B, H, W, 1) line strips -> (B, T, num_classes+1) CTC logits."""

    num_symbols: int            # excluding blank
    conv_features: Sequence[int] = (64, 128, 256)
    lstm_features: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    # recurrent compute dtype — a SERVING-time numeric mode (param
    # names/shapes and checkpoints are dtype-independent). bfloat16
    # runs the LSTM gate matmuls at the MXU's native rate (~4x f32 on
    # v5e); the carry accumulates in bf16 too, so enable only after a
    # CER A/B on the target corpus (scripts/perf_ocr_breakdown.py).
    lstm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, widths=None):
        # x in [0,1]; ink should be high (callers pass 1 - gray/255)
        x = x.astype(self.dtype)
        h = x.shape[1]
        time_stride = 1
        if widths is not None:
            cur_w = jnp.maximum(widths.astype(jnp.float32), 1.0)
        else:
            cur_w = jnp.full((x.shape[0],), float(x.shape[2]))
        for i, f in enumerate(self.conv_features):
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype,
                        use_bias=False)(x)
            x = MaskedGroupNorm(num_groups=8,
                                name="GroupNorm_%d" % i)(
                x, jnp.ceil(cur_w).astype(jnp.int32))
            x = nn.gelu(x)
            if i < 2:
                # pool H and W early (time downsample x4 overall)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                time_stride *= 2
                cur_w = cur_w / 2
            else:
                x = nn.max_pool(x, (2, 1), strides=(2, 1))
        # collapse the remaining height into features: (B, T, H'*C)
        b, hh, ww, cc = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, ww, hh * cc)
        x = x.astype(self.lstm_dtype)
        if widths is not None:
            t_len = jnp.clip(jnp.ceil(widths / time_stride)
                             .astype(jnp.int32), 1, ww)
        else:
            t_len = jnp.full((b,), ww, jnp.int32)
        x = BiLSTM(self.lstm_features, dtype=self.lstm_dtype)(x, t_len)
        x = nn.Dense(self.lstm_features, dtype=self.lstm_dtype)(x)
        x = nn.gelu(x)
        logits = nn.Dense(self.num_symbols + 1,
                          dtype=self.lstm_dtype)(x)   # blank at index 0
        logits = logits.astype(jnp.float32)
        pad = (jnp.arange(ww)[None, :] >= t_len[:, None]) \
            .astype(jnp.float32)
        return logits, pad

    @property
    def time_downsample(self):
        return 4


def create_recognizer(num_symbols, dtype=jnp.bfloat16,
                      conv_features=(64, 128, 256), lstm_features=256,
                      lstm_dtype=jnp.float32):
    return LineRecognizer(num_symbols=num_symbols, dtype=dtype,
                          conv_features=tuple(conv_features),
                          lstm_features=lstm_features,
                          lstm_dtype=lstm_dtype)


def init_recognizer(model, rng, height=48, width=256):
    x = jnp.zeros((1, height, width, 1), jnp.float32)
    return model.init(rng, x)["params"]


STRIP_WIDTH_STEP = 256


def strip_width_bucket(width, cap=2048):
    """Canonical device-path width bucket: the 256-px ladder.

    ONE ladder shared by the line extractor, the recognizer's device
    dispatch and bucket warmup — the extractor once bucketed to powers
    of two and the recognizer re-bucketed those through the x1.5 host
    ladder, silently padding 1024-wide strip groups to a 1458-wide
    LSTM (~40% wasted timesteps on the dominant bucket). The 256-px
    pitch keeps mean padding waste ~13% at 8 compile shapes
    (each (batch, width) LSTM graph costs minutes through the remote
    TPU compiler, then disk-caches)."""
    b = max(STRIP_WIDTH_STEP,
            -(-int(width) // STRIP_WIDTH_STEP) * STRIP_WIDTH_STEP)
    return min(b, cap) if cap else b


def strip_width_ladder(cap=2048):
    """All strip_width_bucket values up to `cap`."""
    return tuple(range(STRIP_WIDTH_STEP, int(cap) + 1, STRIP_WIDTH_STEP))


def width_buckets(widths, time_downsample=4, min_bucket=128, max_bucket=2048):
    """Static bucket sizes (powers-of-two-ish) so each width class compiles
    once; replaces the reference's variable-width Calamari batches."""
    buckets = []
    b = min_bucket
    while b < max_bucket:
        buckets.append(b)
        b = int(b * 1.5) // time_downsample * time_downsample
    buckets.append(max_bucket)
    out = []
    for w in widths:
        for b in buckets:
            if w <= b:
                out.append(b)
                break
        else:
            out.append(max_bucket)
    return out
