"""ROS sensor payload decoders — PointCloud2 and raw Image (r12).

The reference's own sample bag carries lidar/sonar
``sensor_msgs/PointCloud2`` topics and ``image_raw`` camera topics
(``/root/reference/README.md:85-87,93,105``); its pipeline leaves those
blobs untouched (bagpy dumps the ``data`` array as a stringly CSV cell,
``service/app/main.py:93-113``). Here the blobs become typed columns:

- :func:`decode_pointcloud2` — numpy strided unpack of the packed point
  records, driven by each message's OWN ``fields`` descriptors
  (offset/datatype/count, ``point_step``, ``is_bigendian``), one Arrow
  ``mapInPandas`` pass. Three output shapes: exploded long form (the
  100 TB storage shape), per-field arrays (columnar), or
  ``array<struct<...>>`` per message.
- :func:`decode_ros_image` — encoding-driven reshape of uncompressed
  ``sensor_msgs/Image`` payloads (rgb8/bgr8/rgba8/bgra8/mono8/mono16/
  8UC1/8UC3/16UC1) honoring ``step`` row padding and ``is_bigendian``,
  emitting the :func:`..operators.multimodal.decode_image` output
  contract (``pixels`` + ``codec='ros_raw'``).
- :func:`ros_image_media_info` — the decode-free ``media_metadata``
  twin for raw image topics: a pure-Catalyst ``media_info`` struct
  (no Python, no bytes touched), total by contract (unknown encodings
  yield ``error``, never raise).

Message definitions ship as constants (public ROS msg-spec text) so
``extract_topics`` / ``extract_mcap_topics`` callers need not re-type
them: :data:`POINTCLOUD2_DEFINITION`, :data:`IMAGE_DEFINITION`.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "POINTCLOUD2_DEFINITION", "IMAGE_DEFINITION",
    "decode_pointcloud2", "decode_ros_image", "ros_image_media_info",
    "voxel_downsample", "transform_points", "COMPRESSED_IMAGE_DEFINITION",
    "decode_ros_compressed_image", "demosaic_bilinear",
    "CAMERA_INFO_DEFINITION", "camera_info_intrinsics",
    "project_points", "unproject_pixels",
]

# Public sensor_msgs definitions in gendeps concatenated-text form
# (the format bags embed in connection records — rosbag.py:322).
POINTCLOUD2_DEFINITION = """\
std_msgs/Header header
uint32 height
uint32 width
sensor_msgs/PointField[] fields
bool is_bigendian
uint32 point_step
uint32 row_step
uint8[] data
bool is_dense
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: sensor_msgs/PointField
uint8 INT8=1
uint8 UINT8=2
uint8 INT16=3
uint8 UINT16=4
uint8 INT32=5
uint8 UINT32=6
uint8 FLOAT32=7
uint8 FLOAT64=8
string name
uint32 offset
uint8 datatype
uint32 count
"""

IMAGE_DEFINITION = """\
std_msgs/Header header
uint32 height
uint32 width
string encoding
uint8 is_bigendian
uint32 step
uint8[] data
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""

# sensor_msgs/PointField datatype codes (public constants above).
_PF_NAME = {1: "int8", 2: "uint8", 3: "int16", 4: "uint16",
            5: "int32", 6: "uint32", 7: "float32", 8: "float64"}
_PF_NP = {"int8": "i1", "uint8": "u1", "int16": "i2", "uint16": "u2",
          "int32": "i4", "uint32": "u4", "float32": "f4",
          "float64": "f8"}
_PF_SIZE = {"int8": 1, "uint8": 1, "int16": 2, "uint16": 2,
            "int32": 4, "uint32": 4, "float32": 4, "float64": 8}
_PF_FLOAT = {"float32", "float64"}


def _spec_from_descriptors(descs) -> list[tuple[str, str, int]]:
    """Message ``fields`` descriptors → declared spec
    ``[(name, base, count)]`` in offset order."""
    out = []
    for d in sorted(descs, key=lambda d: int(d["offset"])):
        code = int(d["datatype"])
        if code not in _PF_NAME:
            raise ValueError(
                f"PointCloud2 field {d['name']!r} has unknown datatype "
                f"code {code} (sensor_msgs/PointField defines 1..8)")
        out.append((str(d["name"]), _PF_NAME[code],
                    int(d["count"] or 1)))
    return out


def _elem_type(base: str, count: int) -> T.DataType:
    elem = (T.DoubleType() if base in _PF_FLOAT else T.LongType())
    return T.ArrayType(elem) if count > 1 else elem


def _point_dtype(spec, descs, point_step: int,
                 is_bigendian: bool) -> np.dtype:
    """One numpy structured dtype per message: the declared spec
    matched against the message's own descriptors (drift refusal —
    a renamed/retyped/moved field errors instead of silently
    unpacking garbage), offsets straight from the wire."""
    by_name = {str(d["name"]): d for d in descs}
    bo = ">" if is_bigendian else "<"
    names, fmts, offsets = [], [], []
    for name, base, count in spec:
        d = by_name.get(name)
        if d is None:
            raise ValueError(
                f"PointCloud2 message lacks declared field {name!r} "
                f"(has {sorted(by_name)}); the topic's field layout "
                f"drifted — re-derive point_fields or split the scan")
        code = int(d["datatype"])
        got = _PF_NAME.get(code)
        got_count = int(d["count"] or 1)
        if got != base or got_count != count:
            raise ValueError(
                f"PointCloud2 field {name!r} drifted: declared "
                f"{base}[{count}], message carries {got}[{got_count}]"
                f" — re-derive point_fields or split the scan")
        off = int(d["offset"])
        width = _PF_SIZE[base] * count
        if off + width > point_step:
            raise ValueError(
                f"PointCloud2 field {name!r} overruns the point: "
                f"offset {off} + {width} bytes > point_step "
                f"{point_step} — corrupt descriptors")
        names.append(name)
        fmts.append((bo + _PF_NP[base], (count,)) if count > 1
                    else bo + _PF_NP[base])
        offsets.append(off)
    return np.dtype({"names": names, "formats": fmts,
                     "offsets": offsets, "itemsize": point_step})


def _unpack_cloud(data: bytes, width: int, height: int,
                  point_step: int, row_step: int,
                  is_bigendian: bool, descs, spec) -> np.ndarray:
    """One message's packed blob → numpy structured array of
    ``width*height`` points. Honors ``row_step`` padding (rows are
    ``row_step`` bytes with ``width*point_step`` used; the final row
    may legally omit the padding)."""
    n_pts = width * height
    dt = _point_dtype(spec, descs, point_step, bool(is_bigendian))
    row_bytes = width * point_step
    if height > 1 and row_step and row_step != row_bytes:
        if row_step < row_bytes:
            raise ValueError(
                f"PointCloud2 row_step {row_step} < width*point_step "
                f"{row_bytes} — corrupt header")
        need = (height - 1) * row_step + row_bytes
        if len(data) < need:
            raise ValueError(
                f"PointCloud2 data truncated: {len(data)} bytes < "
                f"{need} needed for {height}x{width} points at "
                f"row_step {row_step}")
        a = np.frombuffer(data, np.uint8, count=need)
        rows = np.lib.stride_tricks.as_strided(
            a, shape=(height, row_bytes), strides=(row_step, 1))
        packed = np.ascontiguousarray(rows).reshape(-1)
        return packed.view(dt)
    need = n_pts * point_step
    if len(data) < need:
        raise ValueError(
            f"PointCloud2 data truncated: {len(data)} bytes < {need} "
            f"needed for {n_pts} points at point_step {point_step}")
    return np.frombuffer(data, dt, count=n_pts)


def _columns(pts: np.ndarray, spec):
    """Structured array → one widened numpy array per field (float32
    → float64, all ints → int64: the declared Spark column types)."""
    out = {}
    for name, base, count in spec:
        a = pts[name]
        a = a.astype(np.float64 if base in _PF_FLOAT else np.int64)
        out[name] = a
    return out


def decode_pointcloud2(df: DataFrame,
                       point_fields: list[tuple[str, str] |
                                          tuple[str, str, int]]
                       | None = None, *,
                       mode: str = "long",
                       keep_cols: list[str] | None = None,
                       data_col: str = "data",
                       fields_col: str = "fields") -> DataFrame:
    """Unpack ``sensor_msgs/PointCloud2`` blobs into typed point
    columns — the missing half of the reference's lidar/sonar topics
    (``/os1_cloud_node/points``, ``/vehicle/sonar_cloud``,
    README.md:93,105). Input is the decoded topic frame from
    :func:`..sources.rosbag.extract_topics` (or the MCAP/db3 twins):
    columns ``height width fields is_bigendian point_step row_step
    data`` per the message spec.

    ``point_fields`` declares the output schema as ``(name, ros_type
    [, count])`` tuples (``float32``/``uint16``/...). ``None`` infers
    it from the first non-empty message (ONE bounded driver action —
    descriptors are a handful of rows, not data). Unpack itself is
    per-message and wire-driven: each message's own descriptors give
    offsets/endianness, verified against the declared spec so layout
    drift errors loudly instead of unpacking garbage.

    Modes (shared numpy core, one Arrow pass, no Python per point):

    - ``"long"`` — one output row per point (``point_index`` +
      one column per field). The scale shape: downstream filters,
      aggregations, and the parquet sink all stay relational, and a
      100 M-point scan partitions on rows, not on per-message arrays.
    - ``"arrays"`` — one row per message, one ``array<T>`` column per
      field (columnar; zero row explosion).
    - ``"points"`` — one row per message, ``points:
      array<struct<...>>`` (the faithful nested shape).

    floats widen to ``double``, ints to ``bigint``; ``count>1``
    fields become ``array<T>`` per point. NaN points of
    ``is_dense=false`` clouds pass through unchanged.
    """
    if mode not in ("long", "arrays", "points"):
        raise ValueError(f"mode must be long|arrays|points, got {mode!r}")
    if point_fields is None:
        first = (df.where(F.size(fields_col) > 0)
                 .select(fields_col).head(1))
        if not first:
            raise ValueError(
                "decode_pointcloud2: cannot infer point_fields from an "
                "empty frame — pass point_fields=[(name, ros_type), ...]")
        spec = _spec_from_descriptors(
            [r.asDict() for r in first[0][0]])
    else:
        spec = []
        for pf in point_fields:
            name, base = pf[0], pf[1]
            count = int(pf[2]) if len(pf) > 2 else 1
            if base not in _PF_NP:
                raise ValueError(
                    f"unknown PointField type {base!r} for {name!r} "
                    f"(one of {sorted(_PF_NP)})")
            spec.append((name, base, count))

    keep = keep_cols if keep_cols is not None else [
        c for c in ("bag_file", "topic", "time_ns") if c in df.columns]
    in_fields = {f.name: f for f in df.schema.fields}
    keep_fields = [in_fields[c] for c in keep]
    field_structs = [T.StructField(n, _elem_type(b, c))
                     for n, b, c in spec]

    if mode == "long":
        out_schema = T.StructType(
            keep_fields
            + [T.StructField("point_index", T.LongType())]
            + field_structs)
    elif mode == "arrays":
        out_schema = T.StructType(
            keep_fields
            + [T.StructField("n_points", T.LongType())]
            + [T.StructField(f.name, T.ArrayType(f.dataType))
               for f in field_structs])
    else:
        out_schema = T.StructType(
            keep_fields
            + [T.StructField("points",
                             T.ArrayType(T.StructType(field_structs)))])

    names = [n for n, _, _ in spec]

    hdr = (fields_col, data_col, "width", "height", "point_step",
           "row_step", "is_bigendian")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            # column zip, not iterrows(): no per-row Series boxing on
            # the per-message hot loop (r12 review fix)
            rs = pdf["row_step"] if "row_step" in pdf else \
                pd.Series([0] * len(pdf))
            for descs, data, w_, h_, ps, rstep, be, *keepvals in zip(
                    pdf[fields_col], pdf[data_col], pdf["width"],
                    pdf["height"], pdf["point_step"], rs,
                    pdf["is_bigendian"], *(pdf[c] for c in keep)):
                pts = _unpack_cloud(
                    bytes(data), int(w_), int(h_), int(ps),
                    int(rstep or 0), bool(be), descs, spec)
                cols = _columns(pts, spec)
                n = len(pts)
                if mode == "long":
                    o = {c: np.repeat(v, n)
                         for c, v in zip(keep, keepvals)}
                    o["point_index"] = np.arange(n, dtype=np.int64)
                    for (nm, _, count) in spec:
                        o[nm] = (list(cols[nm]) if count > 1
                                 else cols[nm])
                    outs.append(pd.DataFrame(o))
                elif mode == "arrays":
                    o = {c: [v] for c, v in zip(keep, keepvals)}
                    o["n_points"] = [n]
                    for (nm, _, count) in spec:
                        o[nm] = [cols[nm].tolist()]
                    outs.append(pd.DataFrame(o))
                else:
                    recs = [
                        {nm: (cols[nm][i].tolist() if count > 1
                              else cols[nm][i].item())
                         for nm, _, count in spec}
                        for i in range(n)]
                    o = {c: [v] for c, v in zip(keep, keepvals)}
                    o["points"] = [recs]
                    outs.append(pd.DataFrame(o))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return df.mapInPandas(decode, out_schema)


# sensor_msgs image encodings the raw decoder reshapes for real:
# name -> (channels, bytes per sample, normalized channel order).
# order maps stored channel i -> output channel order[i]; BGR(A)
# normalizes to RGB(A) so downstream consumers see one convention.
_ROS_ENC = {
    "mono8": (1, 1, None), "8UC1": (1, 1, None),
    "rgb8": (3, 1, None), "bgr8": (3, 1, (2, 1, 0)),
    "8UC3": (3, 1, None),
    "rgba8": (4, 1, None), "bgra8": (4, 1, (2, 1, 0, 3)),
    "mono16": (1, 2, None), "16UC1": (1, 2, None),
}
# Bayer mosaics: encoding -> 2x2 tile of channel indices (0=R,1=G,
# 2=B) at (row%2, col%2).  bayer_rggb8 means row0 = R G, row1 = G B.
_ROS_BAYER = {
    "bayer_rggb8": ((0, 1), (1, 2)),
    "bayer_bggr8": ((2, 1), (1, 0)),
    "bayer_gbrg8": ((1, 2), (0, 1)),
    "bayer_grbg8": ((1, 0), (2, 1)),
}


def _conv3_121(a: np.ndarray) -> np.ndarray:
    """3x3 separable [1,2,1]⊗[1,2,1] convolution, zero padded —
    the bilinear interpolation kernel, as two slice-sums (no scipy)."""
    p = np.pad(a, 1)
    b = p[:, :-2] + 2 * p[:, 1:-1] + p[:, 2:]
    return b[:-2] + 2 * b[1:-1] + b[2:]


def demosaic_bilinear(mosaic: np.ndarray, pattern: str) -> np.ndarray:
    """Bilinear demosaic of a single-plane Bayer mosaic → (h, w, 3)
    RGB.  Pure numpy, fully vectorized: per channel, a normalized
    3x3 [1,2,1] convolution (sum of present neighbors / count of
    present neighbors) — exact bilinear interpolation in the
    interior, the natural fewer-neighbor average at the borders,
    integer round-half-up so results are platform-deterministic.
    ``pattern`` is a key of ``_ROS_BAYER`` (or its bare prefix, e.g.
    ``'rggb'``)."""
    key = pattern if pattern in _ROS_BAYER else f"bayer_{pattern}8"
    if key not in _ROS_BAYER:
        raise ValueError(f"demosaic_bilinear: unknown Bayer pattern "
                         f"{pattern!r} (known: {sorted(_ROS_BAYER)})")
    tile = _ROS_BAYER[key]
    h, w = mosaic.shape
    m = mosaic.astype(np.int64)
    out = np.empty((h, w, 3), dtype=np.int64)
    for c in range(3):
        mask = np.zeros((h, w), dtype=np.int64)
        for dy in (0, 1):
            for dx in (0, 1):
                if tile[dy][dx] == c:
                    mask[dy::2, dx::2] = 1
        num = _conv3_121(m * mask)
        den = _conv3_121(mask)          # ≥1 everywhere: every 3x3
        ch = (2 * num + den) // (2 * den)   # window has all channels
        # native samples pass through exactly (the G checkerboard
        # would otherwise blend with its diagonal G neighbors)
        out[..., c] = np.where(mask == 1, m, ch)
    return out


def decode_ros_image(df: DataFrame, *,
                     data_col: str = "data",
                     out_col: str = "pixels",
                     codec_col: str = "codec") -> DataFrame:
    """Uncompressed ``sensor_msgs/Image`` payloads (the reference's
    ``image_raw`` camera topics, README.md:85-87) → the
    :func:`..operators.multimodal.decode_image` output contract:
    a flat row-major ``pixels: array<int>`` plus ``codec='ros_raw'``.

    Encoding-driven reshape, no codec: ``step`` row padding is
    honored (each row is ``step`` stored bytes, ``width * bpp`` used),
    BGR(A) normalizes to RGB(A) channel order, mono16/16UC1 samples
    honor ``is_bigendian`` and carry their full 16-bit values (the
    depth-image convention, same as the builtin 16-bit PNG path).
    Bayer mosaics (``bayer_rggb8/bggr8/gbrg8/grbg8`` — the raw
    capture mode of FLIR-style AV camera rigs) are demosaiced to RGB
    via :func:`demosaic_bilinear` (vectorized bilinear, deterministic
    integer rounding) inside the same Arrow pass. A ``channels``
    column is added so downstream ``reshape(h, w, c)`` needs no
    encoding table.
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType())),
           T.StructField("channels", T.IntegerType()),
           T.StructField(codec_col, T.StringType())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, chans, codecs = [], [], []
            # column zip, not iterrows() (r12 review fix)
            for data, encoding, w_, h_, step_, be in zip(
                    pdf[data_col], pdf["encoding"], pdf["width"],
                    pdf["height"], pdf["step"], pdf["is_bigendian"]):
                if data is None:
                    pixels.append(None)
                    chans.append(None)
                    codecs.append(None)
                    continue
                enc = str(encoding)
                bayer = enc in _ROS_BAYER
                if bayer:
                    c, bps, order = 1, 1, None   # stored mosaic plane
                elif enc in _ROS_ENC:
                    c, bps, order = _ROS_ENC[enc]
                else:
                    raise NotImplementedError(
                        f"decode_ros_image: unsupported encoding "
                        f"{enc!r} (supported: "
                        f"{sorted(_ROS_ENC) + sorted(_ROS_BAYER)})")
                if pd.isna(w_) or pd.isna(h_):
                    # salvage/skip rows can carry NULL headers (NaN
                    # through Arrow) — name the field, don't
                    # TypeError/NaN-cast out of the whole task
                    raise ValueError(
                        "decode_ros_image: NULL "
                        f"{'width' if pd.isna(w_) else 'height'} "
                        "header — corrupt or salvaged message")
                w, h = int(w_), int(h_)
                step = (0 if pd.isna(step_) else int(step_)) \
                    or w * c * bps
                be = bool(be) and not pd.isna(be)
                row_bytes = w * c * bps
                if step < row_bytes:
                    raise ValueError(
                        f"decode_ros_image: step {step} < width*"
                        f"channels*bytes {row_bytes} — corrupt header")
                buf = bytes(data)
                need = (h - 1) * step + row_bytes
                if len(buf) < need:
                    raise ValueError(
                        f"decode_ros_image: data truncated: "
                        f"{len(buf)} bytes < {need} for {h} rows of "
                        f"step {step}")
                a = np.frombuffer(buf, np.uint8, count=need)
                rows = np.lib.stride_tricks.as_strided(
                    a, shape=(h, row_bytes), strides=(step, 1))
                img = np.ascontiguousarray(rows)
                if bps == 2:
                    dt = ">u2" if be else "<u2"
                    img = img.reshape(-1).view(dt).reshape(h, w, c)
                else:
                    img = img.reshape(h, w, c)
                if bayer:
                    img = demosaic_bilinear(img[..., 0], enc)
                    c = 3
                if order is not None:
                    img = img[..., list(order)]
                pixels.append(np.ascontiguousarray(img)
                              .reshape(-1).astype(np.int32))
                chans.append(c)
                codecs.append("ros_raw")
            pdf = pdf.copy()
            pdf[out_col] = pixels
            pdf["channels"] = chans
            pdf[codec_col] = codecs
            yield pdf

    return df.mapInPandas(decode, out_schema)


def ros_image_media_info(df: DataFrame,
                         out_col: str = "media_info") -> DataFrame:
    """``media_metadata`` for raw image topics — the struct the
    magic-sniffing probe can't produce (raw blobs have no magic) is
    instead derived from the message's OWN header fields as a pure
    Catalyst expression: zero Python, zero bytes touched, total by
    contract (unknown/Bayer encodings yield ``error`` rows, never a
    raise — a profiling sweep must survive every topic)."""
    enc = F.col("encoding")
    # Bayer decodes to 3-channel 8-bit RGB (demosaic_bilinear)
    ecd = ([(e, c, bps) for e, (c, bps, _) in _ROS_ENC.items()]
           + [(e, 3, 1) for e in _ROS_BAYER])
    chan = F.create_map(
        *[x for e, c, _ in ecd for x in (F.lit(e), F.lit(c))])[enc]
    depth = F.create_map(
        *[x for e, _, bps in ecd
          for x in (F.lit(e), F.lit(8 * bps))])[enc]
    known = chan.isNotNull()
    info = F.struct(
        F.when(known, F.lit("ros_raw")).alias("format"),
        F.when(known, enc).alias("codec"),
        F.when(known, F.col("width").cast("int")).alias("width"),
        F.when(known, F.col("height").cast("int")).alias("height"),
        chan.cast("int").alias("channels"),
        depth.cast("int").alias("bit_depth"),
        F.when(known, F.lit(1)).alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("double").alias("duration_s"),
        F.when(known, F.map_from_arrays(
            F.array(F.lit("encoding")), F.array(enc)))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("tags"),
        F.when(~known, F.concat(
            F.lit("unsupported raw image encoding: "), enc))
        .alias("error"))
    from .multimodal import _MEDIA_INFO_SCHEMA

    # exact schema parity with media_metadata's media_info (same
    # nullability), so mixed raw/containerized profiling frames union
    return df.withColumn(out_col, info.cast(_MEDIA_INFO_SCHEMA))


def voxel_downsample(df: DataFrame,
                     voxel_size: float, *,
                     cols: tuple[str, str, str] = ("x", "y", "z"),
                     group_cols: list[str] | None = None,
                     extra_aggs: dict[str, str] | None = None
                     ) -> DataFrame:
    """Voxel-grid downsampling of a long-form point cloud (the
    standard lidar decimation step): points are binned into cubic
    cells of ``voxel_size`` and each cell collapses to its centroid
    plus ``n_points``. Pure Catalyst — one ``floor``-key groupBy, no
    UDF, no per-point Python — so a 100 M-point sweep is a single
    map-side-combined shuffle on (group, cell) keys; compose after
    ``decode_pointcloud2(mode='long')``.

    ``group_cols`` keeps clouds separate (default: whichever of
    ``bag_file``/``topic``/``time_ns`` are present — per-message
    downsampling); ``extra_aggs`` adds ``{column: 'mean'|'min'|'max'}``
    over other point fields (e.g. ``{"intensity": "mean"}``)."""
    if voxel_size <= 0:
        raise ValueError(f"voxel_size must be positive, got "
                         f"{voxel_size}")
    x, y, z = cols
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"voxel_downsample: no column {c!r} — "
                             f"decode with mode='long' first")
    if group_cols is None:
        group_cols = [c for c in ("bag_file", "mcap_file", "db3_file",
                                  "topic", "time_ns")
                      if c in df.columns]
    keys = [F.floor(F.col(c) / voxel_size).alias(f"voxel_{c}")
            for c in cols]
    aggs = [F.count(F.lit(1)).alias("n_points"),
            F.avg(x).alias(x), F.avg(y).alias(y), F.avg(z).alias(z)]
    for c, how in (extra_aggs or {}).items():
        if how not in ("mean", "avg", "min", "max", "sum"):
            raise ValueError(f"unsupported agg {how!r} for {c!r}")
        fn = {"mean": F.avg, "avg": F.avg, "min": F.min,
              "max": F.max, "sum": F.sum}[how]
        aggs.append(fn(c).alias(c))
    return df.groupBy(*group_cols, *keys).agg(*aggs)


COMPRESSED_IMAGE_DEFINITION = """\
std_msgs/Header header
string format
uint8[] data
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""


def _stored_is_bgr(fmt) -> bool:
    """True when the STORED planes of a CompressedImage are BGR.
    ROS convention is ``"<orig>; <codec> compressed [<stored>]"`` —
    only the token AFTER ``compressed`` describes the bytes in the
    container (``"bgr8; jpeg compressed rgb8"`` stores RGB even
    though the original was BGR).  When no ``compressed`` segment
    exists (bare ``"bgr8"`` / ``"jpeg"`` writers), fall back to the
    whole string."""
    toks = str(fmt or "").lower().split()
    if "compressed" in toks:
        i = toks.index("compressed")
        return i + 1 < len(toks) and toks[i + 1].startswith("bgr")
    return any(t.startswith("bgr") for t in toks)


def decode_ros_compressed_image(df: DataFrame, *,
                                data_col: str = "data",
                                format_col: str = "format",
                                out_col: str = "pixels",
                                codec_col: str = "codec") -> DataFrame:
    """``sensor_msgs/CompressedImage`` payloads (the ``/compressed``
    camera topics) → decoded pixels through the builtin codec family
    (:func:`..operators.multimodal._decode_image_bytes` — JPEG/PNG/
    WebP/...). Unlike raw ``Image``, the message carries no dims, so
    width/height/channels come OUT of the decode. The ``format``
    string is honored for the one ROS convention that changes pixel
    semantics: ``"... jpeg compressed bgr8"`` means the JPEG planes
    are BGR — channels are reordered to RGB so the output matches
    :func:`decode_ros_image`'s normalized contract. Undecodable
    payloads raise naming the format string (same loud contract as
    decode_image)."""
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType())),
           T.StructField("width", T.IntegerType()),
           T.StructField("height", T.IntegerType()),
           T.StructField("channels", T.IntegerType()),
           T.StructField(codec_col, T.StringType())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import _decode_image_bytes
        for pdf in batches:
            px, ws, hs, cs, codecs = [], [], [], [], []
            for data, fmt in zip(pdf[data_col], pdf[format_col]):
                if data is None:
                    px.append(None)
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    codecs.append(None)
                    continue
                arr, codec = _decode_image_bytes(bytes(data))
                if arr is None:
                    raise NotImplementedError(
                        f"decode_ros_compressed_image: payload with "
                        f"format={fmt!r} is not a builtin-decodable "
                        f"container (JPEG/PNG/PPM/BMP/GIF/WebP) "
                        f"and Pillow is unavailable")
                if arr.ndim == 3 and arr.shape[2] >= 3 \
                        and _stored_is_bgr(fmt):
                    # "rgb8; jpeg compressed bgr8": the planes are
                    # BGR as compressed — normalize to RGB
                    arr = arr.copy()
                    arr[..., :3] = arr[..., 2::-1]
                if arr.ndim == 2:
                    arr = arr[..., None]
                h, w, c = arr.shape
                px.append(arr.reshape(-1).astype(np.int32))
                ws.append(w)
                hs.append(h)
                cs.append(c)
                codecs.append(codec)
            pdf = pdf.copy()
            pdf[out_col] = px
            pdf["width"] = pd.array(ws, dtype="Int32")
            pdf["height"] = pd.array(hs, dtype="Int32")
            pdf["channels"] = pd.array(cs, dtype="Int32")
            pdf[codec_col] = codecs
            yield pdf

    return df.mapInPandas(decode, out_schema)


def transform_points(df: DataFrame, *,
                     cols: tuple[str, str, str] = ("x", "y", "z"),
                     quat_cols: tuple[str, str, str, str]
                     = ("qw", "qx", "qy", "qz"),
                     trans_cols: tuple[str, str, str]
                     = ("tx", "ty", "tz"),
                     out_suffix: str = "_t",
                     normalize: bool = False) -> DataFrame:
    """Rigid-body transform of a long-form point cloud into another
    frame (sensor → ego/map — the step after as-of-joining each point
    row with its pose sample): ``p' = R(q)·p + t`` with the rotation
    expanded to its 9-term quaternion form as PURE Catalyst
    expressions — no UDF, no Python per point, whole-stage codegen
    end to end. Pose columns are per ROW, so one pass transforms a
    mixed scan of many messages/poses; compose as::

        pts   = decode_pointcloud2(cloud, mode="long")
        posed = asof_join(pts, poses, on="time_ns", ...)
        ego   = transform_points(posed)

    ``normalize=True`` divides by ||q|| first (recorded poses are
    occasionally un-normalized); the default trusts unit quaternions.
    Adds ``<col><out_suffix>`` columns, inputs untouched."""
    x, y, z = (F.col(c) for c in cols)
    qw, qx, qy, qz = (F.col(c) for c in quat_cols)
    tx, ty, tz = (F.col(c) for c in trans_cols)
    for c in (*cols, *quat_cols, *trans_cols):
        if c not in df.columns:
            raise ValueError(
                f"transform_points: no column {c!r} — as-of join the "
                f"pose topic onto the point rows first")
    if normalize:
        n = F.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
        qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    # R(q) rows (public quaternion-to-matrix identity)
    two = F.lit(2.0)
    xo = (x * (1 - two * (qy * qy + qz * qz))
          + y * two * (qx * qy - qw * qz)
          + z * two * (qx * qz + qw * qy) + tx)
    yo = (x * two * (qx * qy + qw * qz)
          + y * (1 - two * (qx * qx + qz * qz))
          + z * two * (qy * qz - qw * qx) + ty)
    zo = (x * two * (qx * qz - qw * qy)
          + y * two * (qy * qz + qw * qx)
          + z * (1 - two * (qx * qx + qy * qy)) + tz)
    return (df.withColumn(cols[0] + out_suffix, xo)
            .withColumn(cols[1] + out_suffix, yo)
            .withColumn(cols[2] + out_suffix, zo))


CAMERA_INFO_DEFINITION = """\
std_msgs/Header header
uint32 height
uint32 width
string distortion_model
float64[] D
float64[9] K
float64[9] R
float64[12] P
uint32 binning_x
uint32 binning_y
sensor_msgs/RegionOfInterest roi
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: sensor_msgs/RegionOfInterest
uint32 x_offset
uint32 y_offset
uint32 height
uint32 width
bool do_rectify
"""


def camera_info_intrinsics(df: DataFrame, *,
                           k_col: str = "K", d_col: str | None = "D",
                           p_col: str | None = None) -> DataFrame:
    """Flatten a ``sensor_msgs/CameraInfo`` topic's packed calibration
    arrays into the scalar columns :func:`project_points` consumes:
    ``fx, fy, cx, cy`` from the row-major 3x3 ``K`` (or, with
    ``p_col=``, from the 3x4 rectified projection ``P`` — the
    image_geometry convention for rectified pixels), and the plumb-bob
    coefficients ``k1, k2, t1, t2, k3`` from ``D`` (absent entries →
    0.0: an all-zero or short ``D`` is the ROS idiom for an
    undistorted camera). Pure Catalyst ``element_at`` — no Python."""
    src, w = (p_col, 4) if p_col else (k_col, 3)
    if src not in df.columns:
        raise ValueError(f"camera_info_intrinsics: no column {src!r}")
    a = F.col(src)
    out = (df.withColumn("fx", F.element_at(a, 1).cast("double"))
           .withColumn("fy", F.element_at(a, w + 2).cast("double"))
           .withColumn("cx", F.element_at(a, 3).cast("double"))
           .withColumn("cy", F.element_at(a, w + 3).cast("double")))
    if d_col is not None:
        if d_col not in df.columns:
            raise ValueError(
                f"camera_info_intrinsics: no column {d_col!r} — pass "
                f"d_col=None for a distortion-free CameraInfo")
        d = F.col(d_col)
        for name, i in (("k1", 1), ("k2", 2), ("t1", 3), ("t2", 4),
                        ("k3", 5)):
            out = out.withColumn(
                name,
                F.coalesce(F.when(F.size(d) >= i, F.element_at(d, i))
                           .cast("double"), F.lit(0.0)))
        # raw positional coefficients d1..d8 (zero-padded): the D
        # array's meaning depends on distortion_model — plumb_bob is
        # [k1,k2,t1,t2,k3], rational_polynomial [k1,k2,p1,p2,k3,k4,
        # k5,k6], equidistant (fisheye) [θ1,θ2,θ3,θ4] — so the
        # model-dispatching project_points consumes these
        # position-faithful columns (r14; the named k/t columns
        # above stay for the plumb-bob-only call shape)
        for i in range(1, 9):
            out = out.withColumn(
                f"d{i}",
                F.coalesce(F.when(F.size(d) >= i, F.element_at(d, i))
                           .cast("double"), F.lit(0.0)))
    return out


def _distort_plumb_bob(xp, yp, k1, k2, t1, t2, k3):
    """OpenCV/ROS plumb-bob: radial 3-term polynomial + tangential."""
    r2 = xp * xp + yp * yp
    radial = (F.lit(1.0) + k1 * r2 + k2 * r2 * r2
              + k3 * r2 * r2 * r2)
    two = F.lit(2.0)
    xpp = (xp * radial + two * t1 * xp * yp
           + t2 * (r2 + two * xp * xp))
    ypp = (yp * radial + t1 * (r2 + two * yp * yp)
           + two * t2 * xp * yp)
    return xpp, ypp


def _distort_rational(xp, yp, k1, k2, p1, p2, k3, k4, k5, k6):
    """OpenCV rational_polynomial: radial as a 6-coefficient rational
    ``(1+k1r²+k2r⁴+k3r⁶)/(1+k4r²+k5r⁴+k6r⁶)`` + the same
    tangential terms as plumb-bob (D order
    ``[k1,k2,p1,p2,k3,k4,k5,k6]`` per sensor_msgs/CameraInfo)."""
    r2 = xp * xp + yp * yp
    r4 = r2 * r2
    r6 = r4 * r2
    radial = ((F.lit(1.0) + k1 * r2 + k2 * r4 + k3 * r6)
              / (F.lit(1.0) + k4 * r2 + k5 * r4 + k6 * r6))
    two = F.lit(2.0)
    xpp = (xp * radial + two * p1 * xp * yp
           + p2 * (r2 + two * xp * xp))
    ypp = (yp * radial + p1 * (r2 + two * yp * yp)
           + two * p2 * xp * yp)
    return xpp, ypp


def _distort_equidistant(xp, yp, k1, k2, k3, k4):
    """OpenCV fisheye (``equidistant``): ``θ = atan(r)``,
    ``θ_d = θ(1 + k1θ² + k2θ⁴ + k3θ⁶ + k4θ⁸)``, scale ``θ_d/r``
    (``→ 1`` at the optical axis, where θ ≈ r)."""
    r2 = xp * xp + yp * yp
    r = F.sqrt(r2)
    th = F.atan(r)
    th2 = th * th
    th_d = th * (F.lit(1.0) + k1 * th2 + k2 * th2 * th2
                 + k3 * th2 * th2 * th2
                 + k4 * th2 * th2 * th2 * th2)
    scale = F.when(r > F.lit(1e-12), th_d / r).otherwise(F.lit(1.0))
    return xp * scale, yp * scale


def project_points(df: DataFrame, *,
                   cols: tuple[str, str, str] = ("x", "y", "z"),
                   intrinsics: tuple[str, str, str, str]
                   = ("fx", "fy", "cx", "cy"),
                   distortion: tuple[str, str, str, str, str] | None
                   = ("k1", "k2", "t1", "t2", "k3"),
                   model_col: str | None = None,
                   d_cols: tuple[str, ...] = ("d1", "d2", "d3", "d4",
                                              "d5", "d6", "d7", "d8"),
                   out_cols: tuple[str, str] = ("u", "v")) -> DataFrame:
    """Camera projection of camera-frame 3-D points into pixel
    coordinates — the lidar→image association step (the 3-D
    generalization of the reference's 2-D object-in-lane geometry,
    ``/root/reference/spark_scripts/detect_scenes.py:51-90``; the
    reference fuses detections per camera, ``README.md:90-91``).
    PURE Catalyst (same discipline as :func:`transform_points` —
    whole-stage codegen, no Python per point); intrinsics/distortion
    are per-ROW columns (join or as-of-join the CameraInfo topic
    first, or :func:`camera_info_intrinsics` a literal calibration),
    so one pass projects a mixed scan of many cameras.

    Distortion models (all public OpenCV/ROS conventions):

    - default (``model_col=None``): plumb-bob —
      ``x' = x/z``, ``y' = y/z``, ``r² = x'² + y'²``,
      ``x'' = x'(1 + k1·r² + k2·r⁴ + k3·r⁶) + 2·t1·x'y' + t2(r² + 2x'²)``,
      ``y'' = y'(1 + k1·r² + k2·r⁴ + k3·r⁶) + t1(r² + 2y'²) + 2·t2·x'y'``.
      ``distortion=None`` projects the ideal pinhole (rectified
      images / P-matrix intrinsics).
    - ``model_col="distortion_model"`` (r14): per-row dispatch on the
      decoded CameraInfo model string, consuming the position-faithful
      ``d1..d8`` columns :func:`camera_info_intrinsics` emits —
      ``plumb_bob``/``''``/NULL → plumb-bob (zero coefficients are
      the undistorted idiom); ``rational_polynomial`` → 6-term
      rational radial (k4-k6 rigs); ``equidistant`` → the fisheye
      θ-polynomial (surround cameras). Any OTHER model string culls
      that row's pixels to NULL rather than silently projecting with
      the wrong model — filter ``u IS NOT NULL`` after (count the
      NULLs with a non-NULL ``z > 0`` to surface unsupported rigs).

    ``u = fx·x'' + cx``, ``v = fy·y'' + cy``. Points at or behind the
    image plane (``z ≤ 0``) are culled to NULL ``u``/``v`` — they have
    no pixel; filter ``u IS NOT NULL`` (plus image bounds) after.
    Compose::

        pts  = decode_pointcloud2(cloud, mode="long")
        cam  = transform_points(asof_join(pts, poses, ...))  # → camera frame
        px   = project_points(cam, cols=("x_t", "y_t", "z_t"))
    """
    need = list(cols) + list(intrinsics)
    if model_col is not None:
        need += [model_col] + list(d_cols)
    elif distortion:
        need += list(distortion)
    for c in need:
        if c not in df.columns:
            raise ValueError(
                f"project_points: no column {c!r} — join the "
                f"CameraInfo calibration onto the point rows first")
    x, y, z = (F.col(c) for c in cols)
    fx, fy, cx, cy = (F.col(c) for c in intrinsics)
    xp, yp = x / z, y / z
    if model_col is not None:
        d = [F.col(c) for c in d_cols]
        pb_x, pb_y = _distort_plumb_bob(xp, yp, d[0], d[1], d[2],
                                        d[3], d[4])
        ra_x, ra_y = _distort_rational(xp, yp, *d)
        eq_x, eq_y = _distort_equidistant(xp, yp, d[0], d[1], d[2],
                                          d[3])
        model = F.col(model_col)
        is_pb = model.isNull() | model.isin("", "plumb_bob")
        xpp = (F.when(is_pb, pb_x)
               .when(model == "rational_polynomial", ra_x)
               .when(model == "equidistant", eq_x))
        ypp = (F.when(is_pb, pb_y)
               .when(model == "rational_polynomial", ra_y)
               .when(model == "equidistant", eq_y))
    elif distortion:
        k1, k2, t1, t2, k3 = (F.col(c) for c in distortion)
        xpp, ypp = _distort_plumb_bob(xp, yp, k1, k2, t1, t2, k3)
    else:
        xpp, ypp = xp, yp
    front = z > 0
    # stage the distorted normals as named columns before the final
    # affine step: deep nested when() trees duplicated into two
    # output expressions are exactly the Catalyst-analysis blowup the
    # r13 slerp fold hit (f3d5427) — stage early. The front guard
    # wraps the STAGE, not just the output: ANSI mode evaluates a
    # staged x/z eagerly, so z == 0 rows must short-circuit here
    # (when() branches not taken are never evaluated).
    sx, sy = f"__{out_cols[0]}_pp", f"__{out_cols[1]}_pp"
    return (df.withColumn(sx, F.when(front, xpp))
            .withColumn(sy, F.when(front, ypp))
            .withColumn(out_cols[0], fx * F.col(sx) + cx)
            .withColumn(out_cols[1], fy * F.col(sy) + cy)
            .drop(sx, sy))


def unproject_pixels(df: DataFrame, *,
                     px_cols: tuple[str, str] = ("u", "v"),
                     intrinsics: tuple[str, str, str, str]
                     = ("fx", "fy", "cx", "cy"),
                     distortion: tuple[str, str, str, str, str] | None
                     = ("k1", "k2", "t1", "t2", "k3"),
                     model_col: str | None = None,
                     d_cols: tuple[str, ...] = ("d1", "d2", "d3",
                                                "d4", "d5", "d6",
                                                "d7", "d8"),
                     depth_col: str | None = None,
                     out_cols: tuple[str, str, str]
                     = ("rx", "ry", "rz"),
                     iters: int = 8) -> DataFrame:
    """Pixel→ray unprojection — the inverse of :func:`project_points`
    and the other half of the reference's detection-fusion loop
    (``/root/reference/spark_scripts/detect_scenes.py:51-90``): cast
    2-D image detections back into the camera frame as 3-D rays.
    PURE Catalyst (no Python per pixel): the distortion inversion is
    a bounded fixed-point / Newton iteration unrolled ``iters`` times
    with each step STAGED as named columns (the r13 slerp lesson,
    f3d5427 — deep duplicated subtrees cost quadratic Catalyst
    analysis; staged columns keep it linear).

    Math (inverting the public OpenCV models): normalized distorted
    coordinates ``xd = (u-cx)/fx``, ``yd = (v-cy)/fy``; then

    - plumb-bob / rational_polynomial: the classic undistort
      fixed-point — start at ``(xd, yd)`` and iterate
      ``x ← (xd - tangential_x(x,y)) / radial(r²)`` (OpenCV's
      ``undistortPoints`` recurrence; converges for physical
      coefficients, ``iters=8`` matches C implementations' defaults).
    - equidistant: Newton on the θ-polynomial
      ``θ_d = θ(1 + k1θ² + k2θ⁴ + k3θ⁶ + k4θ⁸)`` starting at
      ``θ = θ_d``, then ``scale = tan(θ)/θ_d``.

    Output is the ray ``(x, y, 1)`` — with ``depth_col`` the ray is
    scaled by that column (metric depth along the optical axis), so
    ``project_points(unproject_pixels(...))`` round-trips. As in
    :func:`project_points`, ``model_col=`` dispatches per row on the
    decoded CameraInfo model string and consumes ``d1..d8``; unknown
    models yield NULL rays. ``distortion=None`` is the ideal pinhole
    (no iteration at all)."""
    need = list(px_cols) + list(intrinsics)
    if model_col is not None:
        need += [model_col] + list(d_cols)
    elif distortion:
        need += list(distortion)
    if depth_col is not None:
        need.append(depth_col)
    for c in need:
        if c not in df.columns:
            raise ValueError(
                f"unproject_pixels: no column {c!r} — join the "
                f"CameraInfo calibration onto the pixel rows first")
    u, v = (F.col(c) for c in px_cols)
    fx, fy, cx, cy = (F.col(c) for c in intrinsics)
    stage = [c for c in ("__xd", "__yd", "__ux", "__uy", "__ra_x",
                         "__ra_y", "__th", "__eq_s")]
    out = (df.withColumn("__xd", (u - cx) / fx)
           .withColumn("__yd", (v - cy) / fy))
    xd, yd = F.col("__xd"), F.col("__yd")

    def _pb_iterate(frame, xcol, ycol, k1, k2, t1, t2, k3,
                    k4=None, k5=None, k6=None):
        """Unrolled fixed-point undistort into (xcol, ycol)."""
        frame = (frame.withColumn(xcol, xd).withColumn(ycol, yd))
        for _ in range(iters):
            x, y = F.col(xcol), F.col(ycol)
            r2 = x * x + y * y
            radial = (F.lit(1.0) + k1 * r2 + k2 * r2 * r2
                      + k3 * r2 * r2 * r2)
            if k4 is not None:
                radial = radial / (F.lit(1.0) + k4 * r2
                                   + k5 * r2 * r2
                                   + k6 * r2 * r2 * r2)
            two = F.lit(2.0)
            dx = two * t1 * x * y + t2 * (r2 + two * x * x)
            dy = t1 * (r2 + two * y * y) + two * t2 * x * y
            frame = (frame
                     .withColumn(xcol + "_n", (xd - dx) / radial)
                     .withColumn(ycol + "_n", (yd - dy) / radial)
                     .withColumn(xcol, F.col(xcol + "_n"))
                     .withColumn(ycol, F.col(ycol + "_n"))
                     .drop(xcol + "_n", ycol + "_n"))
        return frame

    if model_col is not None:
        d = [F.col(c) for c in d_cols]
        out = _pb_iterate(out, "__ux", "__uy", d[0], d[1], d[2],
                          d[3], d[4])
        out = _pb_iterate(out, "__ra_x", "__ra_y", *d[:5],
                          k4=d[5], k5=d[6], k6=d[7])
        # equidistant: Newton on θ, staged per step
        th_d = F.sqrt(xd * xd + yd * yd)
        out = out.withColumn("__th", th_d)
        e1, e2, e3, e4 = d[0], d[1], d[2], d[3]
        for _ in range(iters):
            th = F.col("__th")
            t2_ = th * th
            f_ = th * (F.lit(1.0) + e1 * t2_ + e2 * t2_ * t2_
                       + e3 * t2_ * t2_ * t2_
                       + e4 * t2_ * t2_ * t2_ * t2_) - th_d
            fp = (F.lit(1.0) + 3 * e1 * t2_ + 5 * e2 * t2_ * t2_
                  + 7 * e3 * t2_ * t2_ * t2_
                  + 9 * e4 * t2_ * t2_ * t2_ * t2_)
            out = (out.withColumn("__th_n", th - f_ / fp)
                   .withColumn("__th", F.col("__th_n"))
                   .drop("__th_n"))
        out = out.withColumn(
            "__eq_s",
            F.when(th_d > F.lit(1e-12), F.tan(F.col("__th")) / th_d)
            .otherwise(F.lit(1.0)))
        model = F.col(model_col)
        is_pb = model.isNull() | model.isin("", "plumb_bob")
        rx = (F.when(is_pb, F.col("__ux"))
              .when(model == "rational_polynomial", F.col("__ra_x"))
              .when(model == "equidistant", xd * F.col("__eq_s")))
        ry = (F.when(is_pb, F.col("__uy"))
              .when(model == "rational_polynomial", F.col("__ra_y"))
              .when(model == "equidistant", yd * F.col("__eq_s")))
    elif distortion:
        k1, k2, t1, t2, k3 = (F.col(c) for c in distortion)
        out = _pb_iterate(out, "__ux", "__uy", k1, k2, t1, t2, k3)
        rx, ry = F.col("__ux"), F.col("__uy")
    else:
        rx, ry = xd, yd
    depth = F.col(depth_col) if depth_col else F.lit(1.0)
    out = (out.withColumn(out_cols[0], rx * depth)
           .withColumn(out_cols[1], ry * depth)
           .withColumn(out_cols[2], depth))
    return out.drop(*[c for c in stage if c in out.columns])
