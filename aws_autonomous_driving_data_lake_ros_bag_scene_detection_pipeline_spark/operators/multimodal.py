"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Beyond-reference surface (SURVEY §7.2 step 6). The design rule: media
payloads ride through the engine as ``binary`` columns with a typed
metadata struct; compute that must look inside the bytes runs as
Arrow-batched ``mapInPandas`` (one Python round-trip per ~10k-row batch,
never per row — unlike the reference's ``df.rdd.map`` pattern,
detect_scenes.py:115-117).

Decode stubs: this container has no image/audio codecs, so
:func:`decode_image` tries Pillow and otherwise falls back to a
clearly-marked **deterministic fake decoder** (pixels derived from a
rolling hash of the payload). The Spark-side plumbing — schemas,
partitioning, UDF signatures, Arrow batch shapes — is real and tested;
swapping in a real codec changes only the inner ``_decode_bytes``
function.

Scale notes: media rows are wide (MBs); ``repartition_for_media`` sizes
partitions by *bytes*, not rows, so a 100 TB corpus doesn't produce
2 GB Arrow batches. ``spark.sql.files.maxPartitionBytes`` governs the
scan side; ``target_partition_bytes`` governs the shuffle side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder if the environment has it
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except Exception:  # pragma: no cover - container has no Pillow
    _HAS_PIL = False

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def pack_media(df: DataFrame, binary_col: str, fmt: str,
               width: int | None = None, height: int | None = None,
               channels: int = 3, n_frames: int = 1,
               sample_rate: int | None = None,
               meta_col: str = "media_meta") -> DataFrame:
    """Attach the typed metadata struct next to an opaque binary column."""
    return df.withColumn(meta_col, F.struct(
        F.lit(fmt).alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.lit(channels).cast("int").alias("channels"),
        F.lit(n_frames).cast("int").alias("n_frames"),
        F.lit(sample_rate).cast("int").alias("sample_rate"),
    ))


def repartition_for_media(df: DataFrame, binary_col: str,
                          target_partition_bytes: int = 128 << 20,
                          total_bytes: int | None = None) -> DataFrame:
    """Repartition so each partition carries ~``target_partition_bytes``
    of payload — byte-aware sizing for wide binary rows.

    ``total_bytes`` is the corpus payload size. Callers should pass it
    from metadata they already have — file listing sizes, a manifest, or
    table stats — because an operator must not embed a driver action.
    When omitted, it is estimated plan-side from the FIRST row's payload
    length × the table row count when cheap statistics exist, else by a
    one-row sample; both read only metadata/one row, never scan the
    payload column. (The previous implementation ran
    ``sum(length(payload))`` eagerly — a full extra scan of the binary
    corpus inside plan-building code.)"""
    if total_bytes is None:
        # one-row sample: len(first payload) × countApprox-style row count
        # from the cheapest available source (parquet footer count)
        sample = df.select(F.length(binary_col).alias("_l")).head(1)
        per_row = sample[0]["_l"] if sample and sample[0]["_l"] else 0
        n_rows = df.count()  # metadata-only for parquet sources
        total_bytes = per_row * n_rows
    n = max(1, int(total_bytes / target_partition_bytes) + 1)
    return df.repartition(n)


def byte_histogram_features(df: DataFrame, binary_col: str,
                            bins: int = 64,
                            out_col: str = "features") -> DataFrame:
    """L1-normalized byte histogram as an ``array<float>`` feature vector.

    A *real* (no-codec) feature extractor: useful as the embedding input
    for :func:`~.similarity.brute_force_topk` / dedup over media corpora.
    Arrow-batched ``mapInPandas``; numpy vectorized inside the batch.
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[binary_col]:
                if payload is None or len(payload) == 0:
                    feats.append(None)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> (8 - bins.bit_length() + 1),
                                   minlength=bins)[:bins]
                feats.append((hist / hist.sum()).astype(np.float32))
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(extract, out_schema)


def _fake_decode_bytes(payload: bytes, width: int, height: int,
                       channels: int) -> np.ndarray:
    """DETERMINISTIC FAKE DECODER (no codec in this container).

    Produces a (height, width, channels) uint8 array whose values are a
    keyed hash stream of the payload — stable across runs/machines, so
    tests can pin outputs. Replace with a real codec via Pillow when
    available (see :func:`decode_image`).
    """
    n = width * height * channels
    out = np.empty(n, dtype=np.uint8)
    seed = payload[:64]
    filled = 0
    counter = 0
    while filled < n:
        block = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        take = min(len(block), n - filled)
        out[filled:filled + take] = np.frombuffer(block[:take], dtype=np.uint8)
        filled += take
        counter += 1
    return out.reshape(height, width, channels)


def decode_image(df: DataFrame, binary_col: str, meta_col: str = "media_meta",
                 out_col: str = "pixels") -> DataFrame:
    """Decode image bytes to a flat ``array<int>`` pixel buffer (row-major,
    ``height × width × channels``) using Pillow when present, else the
    deterministic fake decoder.

    The output schema, batching, and downstream ops are identical either
    way — the codec is the only swappable piece.
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for payload, meta in zip(pdf[binary_col], pdf[meta_col]):
                if payload is None:
                    pixels.append(None)
                    continue
                w, h, c = (int(meta["width"]), int(meta["height"]),
                           int(meta["channels"]))
                if _HAS_PIL:  # pragma: no cover - not in this container
                    import io

                    from PIL import Image as _I
                    img = np.asarray(_I.open(io.BytesIO(payload)).convert("RGB"))
                    pixels.append(img.reshape(-1).astype(np.int32))
                else:
                    pixels.append(_fake_decode_bytes(payload, w, h, c)
                                  .reshape(-1).astype(np.int32))
            pdf = pdf.copy()
            pdf[out_col] = pixels
            yield pdf

    return df.mapInPandas(decode, out_schema)


def resize_pixels(df: DataFrame, pixels_col: str, meta_col: str,
                  new_width: int, new_height: int,
                  out_col: str = "pixels_resized") -> DataFrame:
    """Nearest-neighbor resize of a decoded pixel buffer — pure numpy
    index arithmetic (real, codec-free), Arrow-batched."""
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px, meta in zip(pdf[pixels_col], pdf[meta_col]):
                if px is None:
                    out.append(None)
                    continue
                w, h, c = (int(meta["width"]), int(meta["height"]),
                           int(meta["channels"]))
                img = np.asarray(px, dtype=np.int32).reshape(h, w, c)
                ys = (np.arange(new_height) * h) // new_height
                xs = (np.arange(new_width) * w) // new_width
                out.append(img[np.ix_(ys, xs)].reshape(-1))
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(resize, out_schema)


def sample_frames(df: DataFrame, binary_col: str, meta_col: str = "media_meta",
                  every_n: int = 10, frame_col: str = "frame",
                  index_col: str = "frame_index") -> DataFrame:
    """Explode a video payload into every ``every_n``-th frame row.

    Framing: with no container parser available, frames are fixed-size
    byte slices of ``len(payload) / n_frames`` (a DETERMINISTIC FAKE of
    the demux step — a real build swaps in PyAV). The explode itself —
    one output row per sampled frame, metadata preserved, frame index
    attached — is the real, scale-relevant plumbing: fan-out happens
    executor-side, so a 1-hour video never materializes on the driver.
    """
    keep = [f for f in df.schema.fields if f.name != binary_col]
    out_schema = T.StructType(keep + [
        T.StructField(index_col, T.IntegerType()),
        T.StructField(frame_col, T.BinaryType()),
    ])
    keep_names = [f.name for f in keep]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload, meta = row[binary_col], row[meta_col]
                if payload is None or meta is None:
                    continue
                n_frames = max(1, int(meta["n_frames"]))
                size = max(1, len(payload) // n_frames)
                for i in range(0, n_frames, every_n):
                    frame = bytes(payload[i * size:(i + 1) * size])
                    rows.append(tuple(row[k] for k in keep_names) + (i, frame))
            yield pd.DataFrame(rows, columns=keep_names + [index_col, frame_col])

    return df.mapInPandas(sample, out_schema)


def decode_audio(df: DataFrame, binary_col: str,  # pragma: no cover - stub
                 meta_col: str = "media_meta",
                 out_col: str = "samples") -> DataFrame:
    """Audio decode requires a codec library not present in this
    container. The signature and output schema (``array<float>`` PCM
    samples) are fixed here; the body is intentionally unimplemented."""
    raise NotImplementedError(
        "decode_audio needs an audio codec (e.g. soundfile/librosa); "
        "not available in this environment. Use byte_histogram_features "
        "for codec-free audio fingerprinting.")
