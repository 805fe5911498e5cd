"""Audio conditioning operators (r12 — VERDICT r11 item 8).

Every speech/audio training pipeline normalizes its corpus to one
rate and channel layout (16 kHz mono is the de-facto ASR shape); the
engine decodes five audio formats (WAV PCM/float/G.711, FLAC, plus
the PyAV seam) but until now couldn't condition them. Two operators
over the :func:`..operators.multimodal.decode_audio` output contract
(``samples: array<float>`` in [-1, 1], channel-interleaved):

- :func:`mixdown_audio` — channel mean → mono, one numpy
  reshape/mean per row in an Arrow pass;
- :func:`resample_audio` — rational-ratio polyphase resampling
  (up/down = target/source reduced by gcd) through a Kaiser-windowed
  sinc low-pass (the same filter design scipy.signal.resample_poly
  defaults to: 10·max(up,down) half-length, β=5.0, cutoff at the
  narrower Nyquist), zero-stuff → FIR → decimate, per channel.
  Same-rate rows pass through EXACTLY (no filter touches them).

Both are pure numpy inside ``mapInPandas`` — no codec library, no
Python per sample — and total on nulls (null samples → null out).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["mixdown_audio", "resample_audio", "design_lowpass"]


def design_lowpass(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed sinc FIR for a (up, down) polyphase stage —
    scipy.signal.resample_poly's default design, reimplemented on
    numpy: half-length 10·max(up, down), β=5.0, cutoff 1/max(up,
    down) in Nyquist units, unit DC gain, scaled by ``up`` to restore
    amplitude after zero-stuffing."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half = 10 * max_rate
    n = np.arange(2 * half + 1) - half
    h = f_c * np.sinc(f_c * n)
    h *= np.kaiser(2 * half + 1, 5.0)
    h /= h.sum()                          # unit DC gain
    return (h * up).astype(np.float64)


def _resample_1d(x: np.ndarray, up: int, down: int,
                 h: np.ndarray) -> np.ndarray:
    """True polyphase FIR: per-phase taps applied directly to the
    original samples — O(len(x)·taps/down) multiply-adds and
    O(len(x)·up/down) working memory; the zero-stuffed intermediate
    (len(x)·up float64 — gigabytes for a 44.1 kHz→16 kHz minute) is
    never materialized. Output length ceil(len(x)·up/down) and values
    equal to zero-stuff → convolve → centered decimate (the
    resample_poly / upfirdn-then-slice contract).

    Derivation: output m reads upsampled-domain index
    i = delay + m·down; with phase p = i mod up and base = i // up,
    y[m] = Σ_q h[p + q·up] · x[base − q].  Outputs whose m differ by
    ``up`` share a phase (base advances by ``down``), so each of the
    ``up`` residue classes is one gather + matvec over sliding
    windows of x."""
    nx = len(x)
    n_out = -(-nx * up // down)
    if n_out == 0:
        return np.zeros(0, dtype=np.float64)
    delay = (len(h) - 1) // 2
    L = (len(h) + up - 1) // up           # longest phase-filter
    max_base = (delay + (n_out - 1) * down) // up
    xp = np.zeros(L - 1 + max(nx, max_base + 1), dtype=np.float64)
    xp[L - 1:L - 1 + nx] = x              # front pad covers base−q<0
    win = np.lib.stride_tricks.sliding_window_view(xp, L)
    y = np.empty(n_out, dtype=np.float64)
    for r in range(min(up, n_out)):
        i0 = delay + r * down
        hp = h[i0 % up::up][::-1]         # reversed phase taps
        ms = np.arange(r, n_out, up)
        bases = i0 // up + (ms - r) // up * down
        w = win[bases]                    # (class size, L) gather
        y[ms] = w[:, L - len(hp):] @ hp
    return y


def _meta_int(meta, key):
    if meta is None:
        return None
    v = meta[key] if key in meta else None
    return int(v) if v is not None else None


def mixdown_audio(df: DataFrame, samples_col: str = "samples",
                  meta_col: str = "media_meta",
                  out_col: str = "samples_mono",
                  channels: int | None = None) -> DataFrame:
    """Interleaved multichannel → mono by channel mean. The channel
    count comes from ``media_meta.channels`` unless overridden;
    missing both errors loudly (guessing a channel layout scrambles
    audio silently). Mono input passes through exactly."""
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def mix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for samples, meta in zip(pdf[samples_col],
                                     pdf.get(meta_col,
                                             [None] * len(pdf))):
                if samples is None:
                    out.append(None)
                    continue
                c = channels or _meta_int(meta, "channels")
                if not c:
                    raise ValueError(
                        "mixdown_audio: channel count unknown — set "
                        "media_meta.channels (pack_media) or pass "
                        "channels=")
                x = np.asarray(samples, dtype=np.float32)
                if c == 1:
                    out.append(x)
                    continue
                if len(x) % c:
                    raise ValueError(
                        f"mixdown_audio: {len(x)} samples do not "
                        f"divide into {c} channels — wrong channel "
                        f"count or torn decode")
                out.append(x.reshape(-1, c).mean(axis=1)
                           .astype(np.float32))
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(mix, out_schema)


def resample_audio(df: DataFrame, target_rate: int,
                   samples_col: str = "samples",
                   meta_col: str = "media_meta",
                   out_col: str = "samples_resampled",
                   source_rate: int | None = None,
                   channels: int | None = None) -> DataFrame:
    """Polyphase resample every row to ``target_rate``. The source
    rate comes from ``media_meta.sample_rate`` unless overridden
    (both absent errors loudly); interleaved multichannel input is
    resampled per channel and re-interleaved (channel count from
    ``media_meta.channels``, default 1 — NOTE: after
    :func:`mixdown_audio` the meta still describes the original
    payload, so pass ``channels=1`` explicitly when resampling the
    mono column). Adds ``resampled_rate`` so
    downstream consumers need no out-of-band contract. Same-rate rows
    are returned bit-identical (identity passthrough, no filter).

    FIR kernels are built once per (up, down) pair per batch task and
    reused across rows — corpus-wide conditioning pays filter design
    once per executor, convolution per row."""
    if target_rate <= 0:
        raise ValueError(f"target_rate must be positive, got "
                         f"{target_rate}")
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType())),
           T.StructField("resampled_rate", T.IntegerType())])

    def resample(batches: Iterator[pd.DataFrame]
                 ) -> Iterator[pd.DataFrame]:
        kernels: dict[tuple[int, int], np.ndarray] = {}
        for pdf in batches:
            out, rates = [], []
            for samples, meta in zip(pdf[samples_col],
                                     pdf.get(meta_col,
                                             [None] * len(pdf))):
                if samples is None:
                    out.append(None)
                    rates.append(None)
                    continue
                src = source_rate or _meta_int(meta, "sample_rate")
                if not src:
                    raise ValueError(
                        "resample_audio: source rate unknown — set "
                        "media_meta.sample_rate (pack_media) or pass "
                        "source_rate=")
                x = np.asarray(samples, dtype=np.float64)
                rates.append(target_rate)
                if src == target_rate:
                    out.append(np.asarray(samples, dtype=np.float32))
                    continue
                g = math.gcd(src, target_rate)
                up, down = target_rate // g, src // g
                key = (up, down)
                if key not in kernels:
                    kernels[key] = design_lowpass(up, down)
                c = channels or _meta_int(meta, "channels") or 1
                if c > 1:
                    if len(x) % c:
                        raise ValueError(
                            f"resample_audio: {len(x)} samples do "
                            f"not divide into {c} channels")
                    chans = [
                        _resample_1d(x[i::c], up, down, kernels[key])
                        for i in range(c)]
                    y = np.empty(len(chans[0]) * c, dtype=np.float64)
                    for i, ch in enumerate(chans):
                        y[i::c] = ch
                else:
                    y = _resample_1d(x, up, down, kernels[key])
                out.append(y.astype(np.float32))
            pdf = pdf.copy()
            pdf[out_col] = out
            pdf["resampled_rate"] = pd.array(rates, dtype="Int32")
            yield pdf

    return df.mapInPandas(resample, out_schema)
