"""PointCloud2 + raw sensor_msgs/Image decode (r12).

Unit tests build the packed wire blobs byte-exactly with struct/numpy
(all 8 PointField datatypes, both endiannesses, count>1 fields, row
padding) and pin the unpack against the numpy construction; an
integration test carries a synthetic PointCloud2 topic through a
byte-exact golden ROS1 bag → read_bag_messages → extract_topics →
decode_pointcloud2.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
    IMAGE_DEFINITION, POINTCLOUD2_DEFINITION, decode_pointcloud2,
    decode_ros_image, ros_image_media_info,
)

PF = {"int8": 1, "uint8": 2, "int16": 3, "uint16": 4,
      "int32": 5, "uint32": 6, "float32": 7, "float64": 8}

CLOUD_SCHEMA = T.StructType([
    T.StructField("bag_file", T.StringType()),
    T.StructField("height", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("fields", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("datatype", T.IntegerType()),
        T.StructField("count", T.LongType()),
    ]))),
    T.StructField("is_bigendian", T.BooleanType()),
    T.StructField("point_step", T.LongType()),
    T.StructField("row_step", T.LongType()),
    T.StructField("data", T.BinaryType()),
])


def _desc(name, offset, dt, count=1):
    return {"name": name, "offset": offset, "datatype": PF[dt],
            "count": count}


def _xyz_cloud(n=5, big=False, pad=0):
    """n points of x=f32(i), y=f32(2i), z=f32(3i), ring=u16(i%4),
    optionally with `pad` trailing garbage bytes per point."""
    bo = ">" if big else "<"
    step = 14 + pad
    buf = bytearray()
    for i in range(n):
        buf += struct.pack(f"{bo}fff", float(i), 2.0 * i, 3.0 * i)
        buf += struct.pack(f"{bo}H", i % 4)
        buf += b"\xee" * pad
    descs = [_desc("x", 0, "float32"), _desc("y", 4, "float32"),
             _desc("z", 8, "float32"), _desc("ring", 12, "uint16")]
    return {"bag_file": "b1", "height": 1, "width": n,
            "fields": descs, "is_bigendian": big, "point_step": step,
            "row_step": n * step, "data": bytes(buf)}


@pytest.mark.parametrize("big", [False, True])
def test_pointcloud2_long_mode_both_endiannesses(spark, big):
    df = spark.createDataFrame([_xyz_cloud(5, big=big, pad=2)],
                               CLOUD_SCHEMA)
    out = decode_pointcloud2(df, keep_cols=["bag_file"]).collect()
    assert len(out) == 5
    rows = sorted(out, key=lambda r: r["point_index"])
    for i, r in enumerate(rows):
        assert r["bag_file"] == "b1"
        assert (r["x"], r["y"], r["z"]) == (float(i), 2.0 * i, 3.0 * i)
        assert r["ring"] == i % 4
    types = dict(decode_pointcloud2(df, keep_cols=[]).dtypes)
    assert types == {"point_index": "bigint", "x": "double",
                     "y": "double", "z": "double", "ring": "bigint"}


def test_pointcloud2_all_datatypes(spark):
    """All 8 PointField datatypes in one point record, declared spec
    EXplicit (no inference action)."""
    vals = [(-7, 250, -30000, 60000, -100000, 4000000000,
             1.5, -2.25)]
    buf = struct.pack("<bBhHiIfd", *vals[0])
    descs = [_desc("a", 0, "int8"), _desc("b", 1, "uint8"),
             _desc("c", 2, "int16"), _desc("d", 4, "uint16"),
             _desc("e", 6, "int32"), _desc("f", 10, "uint32"),
             _desc("g", 14, "float32"), _desc("h", 18, "float64")]
    row = {"bag_file": "b", "height": 1, "width": 1, "fields": descs,
           "is_bigendian": False, "point_step": 26, "row_step": 26,
           "data": buf}
    spec = [("a", "int8"), ("b", "uint8"), ("c", "int16"),
            ("d", "uint16"), ("e", "int32"), ("f", "uint32"),
            ("g", "float32"), ("h", "float64")]
    df = spark.createDataFrame([row], CLOUD_SCHEMA)
    got = decode_pointcloud2(df, spec, keep_cols=[]).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"], got["e"],
            got["f"]) == vals[0][:6]
    assert got["g"] == 1.5 and got["h"] == -2.25


def test_pointcloud2_row_padding_and_modes(spark):
    """height>1 with row_step > width*point_step: the padding bytes
    between rows must not shift the unpack; arrays/points modes agree
    with long mode."""
    w, h, step, row_pad = 3, 2, 8, 5
    row_step = w * step + row_pad
    buf = bytearray()
    k = 0
    for r in range(h):
        for c in range(w):
            buf += struct.pack("<fI", float(10 * k), k)
            k += 1
        if r < h - 1:
            buf += b"\xde" * row_pad
    descs = [_desc("x", 0, "float32"), _desc("idx", 4, "uint32")]
    row = {"bag_file": "b", "height": h, "width": w, "fields": descs,
           "is_bigendian": False, "point_step": step,
           "row_step": row_step, "data": bytes(buf)}
    df = spark.createDataFrame([row], CLOUD_SCHEMA)
    long = decode_pointcloud2(df, keep_cols=[]).collect()
    assert sorted((r["point_index"], r["x"], r["idx"]) for r in long) \
        == [(i, 10.0 * i, i) for i in range(6)]
    arrs = decode_pointcloud2(df, mode="arrays",
                              keep_cols=["bag_file"]).collect()[0]
    assert arrs["n_points"] == 6
    assert arrs["x"] == [10.0 * i for i in range(6)]
    assert arrs["idx"] == list(range(6))
    pts = decode_pointcloud2(df, mode="points",
                             keep_cols=["bag_file"]).collect()[0]
    assert [p["idx"] for p in pts["points"]] == list(range(6))


def test_pointcloud2_count_gt_one(spark):
    """count>1 fields become array<T> per point."""
    buf = struct.pack("<ffff", 1.0, 2.0, 3.0, 4.0) * 2
    descs = [_desc("m", 0, "float32", count=4)]
    row = {"bag_file": "b", "height": 1, "width": 2, "fields": descs,
           "is_bigendian": False, "point_step": 16, "row_step": 32,
           "data": buf}
    df = spark.createDataFrame([row], CLOUD_SCHEMA)
    out = decode_pointcloud2(df, [("m", "float32", 4)],
                             keep_cols=[]).collect()
    assert [r["m"] for r in out] == [[1.0, 2.0, 3.0, 4.0]] * 2


def test_pointcloud2_drift_and_hostile(spark):
    base = _xyz_cloud(3)
    df = spark.createDataFrame([base], CLOUD_SCHEMA)
    # declared field absent from the message
    with pytest.raises(Exception, match="lacks declared field"):
        decode_pointcloud2(df, [("nope", "float32")],
                           keep_cols=[]).collect()
    # declared type mismatches the wire descriptors
    with pytest.raises(Exception, match="drifted"):
        decode_pointcloud2(df, [("x", "float64")],
                           keep_cols=[]).collect()
    # truncated data blob
    bad = dict(base, data=base["data"][:10])
    with pytest.raises(Exception, match="truncated"):
        decode_pointcloud2(spark.createDataFrame([bad], CLOUD_SCHEMA),
                           [("x", "float32")], keep_cols=[]).collect()
    # descriptor overruns point_step
    bad2 = dict(base, fields=[_desc("x", 12, "float64")])
    with pytest.raises(Exception, match="overruns"):
        decode_pointcloud2(spark.createDataFrame([bad2], CLOUD_SCHEMA),
                           [("x", "float64")], keep_cols=[]).collect()
    # unknown datatype code in inference path
    bad3 = dict(base, fields=[{"name": "x", "offset": 0,
                               "datatype": 99, "count": 1}])
    with pytest.raises(Exception, match="unknown datatype"):
        decode_pointcloud2(
            spark.createDataFrame([bad3], CLOUD_SCHEMA)).collect()


def test_pointcloud2_through_golden_bag(spark, tmp_path):
    """End to end: a byte-exact ROS1 bag carrying a PointCloud2 topic
    (full message: Header + dims + descriptors + blob) decodes through
    read_bag_messages → extract_topics → decode_pointcloud2."""
    from test_rosbag import _chunk, _connection, _message, _record

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources.rosbag import (
        extract_topics, read_bag_messages,
    )

    def pf(name, offset, dt, count=1):
        nb = name.encode()
        return (struct.pack("<I", len(nb)) + nb
                + struct.pack("<IBI", offset, PF[dt], count))

    def cloud_msg(seq, n):
        frame = b"os1"
        header = (struct.pack("<III", seq, 100 + seq, 0)
                  + struct.pack("<I", len(frame)) + frame)
        descs = (pf("x", 0, "float32") + pf("y", 4, "float32")
                 + pf("intensity", 8, "uint16"))
        pts = b"".join(struct.pack("<ffH", float(seq + i),
                                   float(2 * i), i % 7)
                       for i in range(n))
        return (header
                + struct.pack("<II", 1, n)          # height, width
                + struct.pack("<I", 3) + descs       # fields[3]
                + struct.pack("<?", False)           # is_bigendian
                + struct.pack("<II", 10, 10 * n)     # point/row step
                + struct.pack("<I", len(pts)) + pts  # data
                + struct.pack("<?", True))           # is_dense
    inner = (_connection(0, "/os1_cloud_node/points",
                         "sensor_msgs/PointCloud2",
                         POINTCLOUD2_DEFINITION)
             + _message(0, 100, 0, cloud_msg(0, 4))
             + _message(0, 101, 0, cloud_msg(1, 3)))
    bag_header = _record({"op": b"\x03",
                          "index_pos": struct.pack("<Q", 0),
                          "conn_count": struct.pack("<I", 1),
                          "chunk_count": struct.pack("<I", 1)},
                         b" " * 64)
    (tmp_path / "lidar.bag").write_bytes(
        b"#ROSBAG V2.0\n" + bag_header + _chunk(inner))
    msgs = read_bag_messages(spark, str(tmp_path))
    topics = extract_topics(
        msgs, {"/os1_cloud_node/points": POINTCLOUD2_DEFINITION})
    cloud = topics["/os1_cloud_node/points"]
    pts = decode_pointcloud2(cloud).orderBy("time_ns", "point_index")
    rows = pts.collect()
    assert len(rows) == 7
    assert [(r["x"], r["y"], r["intensity"]) for r in rows[:4]] \
        == [(float(i), float(2 * i), i % 7) for i in range(4)]
    assert rows[4]["x"] == 1.0 and rows[6]["x"] == 3.0
    # the spine columns survive for downstream grouping
    assert rows[0]["bag_file"].endswith("lidar.bag")


def _img_row(enc, w, h, data, step=None, big=False):
    return {"bag_file": "b", "height": h, "width": w,
            "encoding": enc, "is_bigendian": 1 if big else 0,
            "step": step if step is not None else 0, "data": data}


IMG_SCHEMA = T.StructType([
    T.StructField("bag_file", T.StringType()),
    T.StructField("height", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("encoding", T.StringType()),
    T.StructField("is_bigendian", T.IntegerType()),
    T.StructField("step", T.LongType()),
    T.StructField("data", T.BinaryType()),
])


def test_ros_image_rgb8_step_padding(spark):
    w, h, pad = 3, 2, 4
    img = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    padded = b"".join(img[r].tobytes() + b"\xcc" * pad
                      for r in range(h))
    df = spark.createDataFrame(
        [_img_row("rgb8", w, h, padded, step=w * 3 + pad)], IMG_SCHEMA)
    got = decode_ros_image(df).collect()[0]
    assert got["codec"] == "ros_raw" and got["channels"] == 3
    assert got["pixels"] == list(img.reshape(-1))


def test_ros_image_bgr8_normalizes_to_rgb(spark):
    img = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    df = spark.createDataFrame(
        [_img_row("bgr8", 2, 1, img.tobytes())], IMG_SCHEMA)
    got = decode_ros_image(df).collect()[0]
    assert got["pixels"] == [30, 20, 10, 60, 50, 40]


@pytest.mark.parametrize("big", [False, True])
def test_ros_image_mono16_endianness(spark, big):
    vals = np.array([[0, 257, 65535, 4096]], dtype=np.uint16)
    data = vals.astype(">u2" if big else "<u2").tobytes()
    df = spark.createDataFrame(
        [_img_row("mono16", 4, 1, data, big=big)], IMG_SCHEMA)
    got = decode_ros_image(df).collect()[0]
    assert got["pixels"] == [0, 257, 65535, 4096]
    assert got["channels"] == 1


def test_ros_image_errors_and_null(spark):
    ok = _img_row("mono8", 2, 1, b"\x01\x02")
    nullw = dict(_img_row("mono8", 2, 1, b"\x01\x02"), width=None)
    with pytest.raises(Exception, match="NULL width"):
        decode_ros_image(
            spark.createDataFrame([nullw], IMG_SCHEMA)).collect()
    unk = _img_row("yuv422", 2, 1, b"\x00" * 4)
    with pytest.raises(Exception, match="unsupported encoding"):
        decode_ros_image(spark.createDataFrame([unk], IMG_SCHEMA)) \
            .collect()
    trunc = _img_row("rgb8", 4, 2, b"\x00" * 5)
    with pytest.raises(Exception, match="truncated"):
        decode_ros_image(spark.createDataFrame([trunc], IMG_SCHEMA)) \
            .collect()
    nul = dict(ok, data=None)
    got = decode_ros_image(
        spark.createDataFrame([ok, nul], IMG_SCHEMA)).collect()
    by_px = {tuple(r["pixels"]) if r["pixels"] is not None else None: r
             for r in got}
    assert by_px[(1, 2)]["codec"] == "ros_raw"
    assert by_px[None]["codec"] is None


def test_ros_image_media_info_total(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        _MEDIA_INFO_SCHEMA,
    )
    rows = [_img_row("rgb8", 640, 480, b""),
            _img_row("mono16", 100, 50, b""),
            _img_row("bayer_rggb8", 8, 8, b""),
            _img_row("yuv422", 8, 8, b"")]
    df = ros_image_media_info(spark.createDataFrame(rows, IMG_SCHEMA))
    assert df.schema["media_info"].dataType == _MEDIA_INFO_SCHEMA
    got = {r["encoding"]: r["media_info"] for r in df.collect()}
    assert got["rgb8"]["format"] == "ros_raw"
    assert (got["rgb8"]["width"], got["rgb8"]["height"],
            got["rgb8"]["channels"], got["rgb8"]["bit_depth"]) \
        == (640, 480, 3, 8)
    assert got["mono16"]["bit_depth"] == 16
    assert got["mono16"]["tags"] == {"encoding": "mono16"}
    # Bayer decodes to 3-channel RGB now (r13 demosaic)
    assert (got["bayer_rggb8"]["channels"],
            got["bayer_rggb8"]["bit_depth"]) == (3, 8)
    # total: unknown encodings are error rows, not exceptions
    assert "yuv422" in got["yuv422"]["error"]


def test_image_definition_parses(spark):
    """The shipped definition constants parse through the msg-IDL
    section parser (so extract_topics callers can use them as-is)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources.rosbag import (
        parse_definition_sections,
    )
    s1 = parse_definition_sections(POINTCLOUD2_DEFINITION)
    assert ("sensor_msgs/PointField[]", "fields") in s1[""]
    assert ("string", "name") in s1["sensor_msgs/PointField"]
    s2 = parse_definition_sections(IMAGE_DEFINITION)
    assert ("uint8[]", "data") in s2[""]


ROS2_POINTCLOUD2_DEFN = """\
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
builtin_interfaces/Time stamp
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


def test_pointcloud2_through_mcap_cdr(spark, tmp_path):
    """ROS2 face: the SAME operator consumes the CDR-decoded frame
    from an MCAP recording (sensor_msgs/msg/PointCloud2) — proving
    decode_pointcloud2 composes with extract_mcap_topics, not just
    the ROS1 extractor."""
    from test_mcap import _CdrW, _channel, _file, _message, _schema

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources.mcap import (
        extract_mcap_topics, read_mcap_messages,
    )

    def cloud_cdr(n):
        w = _CdrW()
        w.prim("i", 4, 7).prim("I", 4, 0)        # Time stamp
        w.string("os1")                          # frame_id
        w.prim("I", 4, 1).prim("I", 4, n)        # height, width
        w.prim("I", 4, 3)                        # fields count
        for name, off, dt in (("x", 0, 7), ("y", 4, 7),
                              ("ring", 8, 4)):
            w.string(name)
            w.prim("I", 4, off).prim("B", 1, dt).prim("I", 4, 1)
        w.prim("?", 1, False)                    # is_bigendian
        w.prim("I", 4, 10).prim("I", 4, 10 * n)  # steps
        pts = b"".join(struct.pack("<ffH", float(i), float(3 * i),
                                   i % 5)
                       for i in range(n))
        w.prim("I", 4, len(pts)).raw(pts)        # data
        w.prim("?", 1, True)                     # is_dense
        return w.bytes_()

    recs = (_schema(1, "sensor_msgs/msg/PointCloud2",
                    ROS2_POINTCLOUD2_DEFN)
            + _channel(7, 1, "/os1_cloud_node/points")
            + _message(7, 0, 1_000, 1_000, cloud_cdr(4)))
    d = tmp_path / "mcaps"
    d.mkdir()
    (d / "lidar.mcap").write_bytes(_file(recs))
    msgs = read_mcap_messages(spark, str(d))
    cloud = extract_mcap_topics(msgs)["/os1_cloud_node/points"]
    pts = decode_pointcloud2(cloud).orderBy("point_index").collect()
    assert [(r["x"], r["y"], r["ring"]) for r in pts] \
        == [(float(i), float(3 * i), i % 5) for i in range(4)]


def test_voxel_downsample_relational(spark):
    """Voxel-grid decimation: centroids + counts per cell, pure
    relational (plan has one shuffle, no Python stage), values pinned
    against a pandas recomputation."""
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        voxel_downsample,
    )
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame({
        "bag_file": ["b1"] * n,
        "x": rng.uniform(-10, 10, n),
        "y": rng.uniform(-10, 10, n),
        "z": rng.uniform(-2, 2, n),
        "intensity": rng.integers(0, 100, n).astype("int64"),
    })
    df = spark.createDataFrame(pdf)
    out = voxel_downsample(df, 2.5,
                           extra_aggs={"intensity": "mean"})
    got = {(r["voxel_x"], r["voxel_y"], r["voxel_z"]):
           (r["n_points"], r["x"], r["y"], r["z"], r["intensity"])
           for r in out.collect()}
    pdf["vx"] = np.floor(pdf.x / 2.5)
    pdf["vy"] = np.floor(pdf.y / 2.5)
    pdf["vz"] = np.floor(pdf.z / 2.5)
    want = pdf.groupby(["vx", "vy", "vz"]).agg(
        n=("x", "size"), x=("x", "mean"), y=("y", "mean"),
        z=("z", "mean"), i=("intensity", "mean"))
    assert len(got) == len(want)
    for (vx, vy, vz), w in want.iterrows():
        g = got[(vx, vy, vz)]
        assert g[0] == w["n"]
        assert g[1] == pytest.approx(w["x"], rel=1e-12)
        assert g[4] == pytest.approx(w["i"], rel=1e-12)
    # no Python stage: the plan is whole-stage-codegen relational
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    with pytest.raises(ValueError, match="positive"):
        voxel_downsample(df, 0.0)
    with pytest.raises(ValueError, match="no column"):
        voxel_downsample(df.drop("z"), 1.0)
    with pytest.raises(ValueError, match="unsupported agg"):
        voxel_downsample(df, 1.0, extra_aggs={"intensity": "median"})


def test_ros_compressed_image_decode(spark):
    """CompressedImage: dims come OUT of the decode; the 'bgr8'
    format convention reorders planes to RGB; undecodable payloads
    raise naming the format."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import encode_jpeg
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        decode_ros_compressed_image,
    )
    h, w = 16, 24
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = 200                     # stored plane 0 bright
    jpeg = encode_jpeg(img, quality=95)
    ppm = (f"P6 {w} {h} 255\n".encode()
           + np.arange(h * w * 3, dtype=np.uint8).tobytes())
    rows = [("jpeg; compressed", bytearray(jpeg)),
            ("rgb8; jpeg compressed bgr8", bytearray(jpeg)),
            ("rgb8", bytearray(ppm)),
            (None, None)]
    df = spark.createDataFrame(rows, "format string, data binary")
    got = {r["format"]: r for r in
           decode_ros_compressed_image(df).collect()}
    plain = got["jpeg; compressed"]
    assert (plain["width"], plain["height"], plain["channels"]) \
        == (w, h, 3)
    assert plain["codec"] == "jpeg"
    px = np.asarray(plain["pixels"]).reshape(h, w, 3)
    assert px[..., 0].mean() > 150 and px[..., 2].mean() < 50
    # bgr convention: the bright stored plane 0 lands on BLUE
    bgr = np.asarray(got["rgb8; jpeg compressed bgr8"]["pixels"]) \
        .reshape(h, w, 3)
    assert bgr[..., 2].mean() > 150 and bgr[..., 0].mean() < 50
    assert got["rgb8"]["codec"] == "ppm"
    assert got["rgb8"]["pixels"][:3] == [0, 1, 2]
    assert got[None]["pixels"] is None and got[None]["width"] is None
    bad = spark.createDataFrame([("h264", bytearray(b"\x00\x01"))],
                                "format string, data binary")
    with pytest.raises(Exception, match="h264"):
        decode_ros_compressed_image(bad).collect()


def test_pointcloud2_count_gt_one_arrays_and_points_modes(spark):
    """count>1 fields in the non-long modes: arrays mode nests
    array<array<T>>, points mode nests array<T> per struct field."""
    buf = struct.pack("<ffff", 1.0, 2.0, 3.0, 4.0) * 2
    descs = [_desc("m", 0, "float32", count=4)]
    row = {"bag_file": "b", "height": 1, "width": 2, "fields": descs,
           "is_bigendian": False, "point_step": 16, "row_step": 32,
           "data": buf}
    df = spark.createDataFrame([row], CLOUD_SCHEMA)
    arrs = decode_pointcloud2(df, [("m", "float32", 4)],
                              mode="arrays", keep_cols=[]).collect()[0]
    assert arrs["n_points"] == 2
    assert arrs["m"] == [[1.0, 2.0, 3.0, 4.0]] * 2
    pts = decode_pointcloud2(df, [("m", "float32", 4)],
                             mode="points", keep_cols=[]).collect()[0]
    assert [p["m"] for p in pts["points"]] == [[1.0, 2.0, 3.0, 4.0]] * 2


def test_transform_points_matches_numpy(spark):
    """Quaternion rigid transform pinned against an independent numpy
    rotation-matrix construction, incl. an un-normalized quaternion
    through normalize=True; pure-Catalyst plan (no Python stage)."""
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        transform_points,
    )
    rng = np.random.default_rng(5)
    n = 200
    pts = rng.uniform(-5, 5, (n, 3))
    # two poses: a 90-degree yaw and an arbitrary normalized quat
    quats = np.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
                      [0.3, 0.5, -0.4, 0.7]])
    quats[1] /= np.linalg.norm(quats[1])
    trans = np.array([[1.0, -2.0, 0.5], [0.0, 10.0, -3.0]])
    pose_i = rng.integers(0, 2, n)
    pdf = pd.DataFrame({
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "qw": quats[pose_i, 0], "qx": quats[pose_i, 1],
        "qy": quats[pose_i, 2], "qz": quats[pose_i, 3],
        "tx": trans[pose_i, 0], "ty": trans[pose_i, 1],
        "tz": trans[pose_i, 2], "i": np.arange(n)})
    out = transform_points(spark.createDataFrame(pdf))
    got = {r["i"]: (r["x_t"], r["y_t"], r["z_t"])
           for r in out.collect()}

    def rot(q):
        w, xq, yq, zq = q
        return np.array([
            [1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq),
             2 * (xq * zq + w * yq)],
            [2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq),
             2 * (yq * zq - w * xq)],
            [2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq),
             1 - 2 * (xq * xq + yq * yq)]])

    for i in range(n):
        want = rot(quats[pose_i[i]]) @ pts[i] + trans[pose_i[i]]
        assert np.allclose(got[i], want, atol=1e-12), i
    # 90-degree yaw sanity: (1,0,0) -> (0,1,0) + t
    one = transform_points(spark.createDataFrame(
        pd.DataFrame({"x": [1.0], "y": [0.0], "z": [0.0],
                      "qw": [np.cos(np.pi / 4)], "qx": [0.0],
                      "qy": [0.0], "qz": [np.sin(np.pi / 4)],
                      "tx": [0.0], "ty": [0.0], "tz": [0.0]})))
    r = one.first()
    assert abs(r["x_t"]) < 1e-12 and abs(r["y_t"] - 1.0) < 1e-12
    # un-normalized quat: normalize=True recovers the rotation
    un = transform_points(spark.createDataFrame(
        pd.DataFrame({"x": [1.0], "y": [0.0], "z": [0.0],
                      "qw": [2 * np.cos(np.pi / 4)], "qx": [0.0],
                      "qy": [0.0], "qz": [2 * np.sin(np.pi / 4)],
                      "tx": [0.0], "ty": [0.0], "tz": [0.0]})),
        normalize=True).first()
    assert abs(un["y_t"] - 1.0) < 1e-12
    # pure Catalyst: no Python stage in the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    with pytest.raises(ValueError, match="no column"):
        transform_points(spark.createDataFrame(
            pd.DataFrame({"x": [1.0]})))


# ---------------------------------------------------------------- r13: Bayer


def _naive_demosaic(m, tile):
    """Independent per-pixel bilinear oracle: weighted [1,2,1]⊗[1,2,1]
    average of in-bounds same-channel neighbors, round half up,
    native samples pass through."""
    h, w = m.shape
    out = np.zeros((h, w, 3), np.int64)
    for c in range(3):
        for y in range(h):
            for x in range(w):
                if tile[y % 2][x % 2] == c:
                    out[y, x, c] = m[y, x]
                    continue
                num = den = 0
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w \
                                and tile[yy % 2][xx % 2] == c:
                            wgt = (2 - abs(dy)) * (2 - abs(dx))
                            num += wgt * int(m[yy, xx])
                            den += wgt
                out[y, x, c] = (2 * num + den) // (2 * den)
    return out


@pytest.mark.parametrize("enc", ["bayer_rggb8", "bayer_bggr8",
                                 "bayer_gbrg8", "bayer_grbg8"])
@pytest.mark.parametrize("dims", [(4, 6), (5, 7)])
def test_bayer_demosaic_matches_oracle(spark, enc, dims):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        _ROS_BAYER,
    )
    h, w = dims
    rng = np.random.default_rng(hash(enc) % 2**31)
    m = rng.integers(0, 256, (h, w)).astype(np.uint8)
    df = spark.createDataFrame(
        [_img_row(enc, w, h, m.tobytes())], IMG_SCHEMA)
    got = decode_ros_image(df).collect()[0]
    assert got["channels"] == 3 and got["codec"] == "ros_raw"
    want = _naive_demosaic(m, _ROS_BAYER[enc]).reshape(-1)
    assert got["pixels"] == list(want)


def test_bayer_demosaic_step_padding_and_flat(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        _ROS_BAYER,
    )
    h, w, pad = 4, 4, 3
    rng = np.random.default_rng(7)
    m = rng.integers(0, 256, (h, w)).astype(np.uint8)
    padded = b"".join(m[r].tobytes() + b"\xcc" * pad
                      for r in range(h))
    flat = np.full((h, w), 99, np.uint8)   # gray mosaic -> gray RGB
    df = spark.createDataFrame(
        [_img_row("bayer_bggr8", w, h, padded, step=w + pad),
         _img_row("bayer_grbg8", w, h, flat.tobytes())], IMG_SCHEMA)
    got = {r["encoding"]: r for r in decode_ros_image(df).collect()}
    want = _naive_demosaic(m, _ROS_BAYER["bayer_bggr8"]).reshape(-1)
    assert got["bayer_bggr8"]["pixels"] == list(want)
    assert got["bayer_grbg8"]["pixels"] == [99] * (h * w * 3)


def test_compressed_stored_format_token():
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        _stored_is_bgr,
    )
    # only the token AFTER 'compressed' describes the stored planes
    assert _stored_is_bgr("bgr8; jpeg compressed bgr8")
    assert not _stored_is_bgr("bgr8; jpeg compressed rgb8")
    assert not _stored_is_bgr("rgb8; jpeg compressed")
    assert not _stored_is_bgr("rgb8; jpeg compressed rgb8")
    assert _stored_is_bgr("rgb8; jpeg compressed bgra8")
    # no 'compressed' segment: fall back to the whole string
    assert _stored_is_bgr("bgr8")
    assert not _stored_is_bgr("jpeg")
    assert not _stored_is_bgr(None)


# -------------------------------------------------- r13: camera projection


def _plumb_bob_numpy(p, fx, fy, cx, cy, d):
    """Independent numpy oracle of the OpenCV/ROS plumb-bob model,
    with behind-camera culling to None."""
    x, y, z = p
    if z <= 0:
        return (None, None)
    k1, k2, t1, t2, k3 = d
    xp, yp = x / z, y / z
    r2 = xp * xp + yp * yp
    rad = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xpp = xp * rad + 2 * t1 * xp * yp + t2 * (r2 + 2 * xp * xp)
    ypp = yp * rad + t1 * (r2 + 2 * yp * yp) + 2 * t2 * xp * yp
    return (fx * xpp + cx, fy * ypp + cy)


def test_project_points_matches_numpy_and_culls(spark):
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        project_points,
    )
    rng = np.random.default_rng(11)
    n = 200
    pts = rng.uniform(-3, 3, (n, 3))
    pts[: n // 4, 2] = -np.abs(pts[: n // 4, 2])   # behind camera
    pts[n // 4, 2] = 0.0                           # exactly on plane
    intr = (600.5, 601.25, 320.0, 240.5)
    dist = (0.1, -0.05, 0.001, -0.002, 0.01)
    pdf = pd.DataFrame({
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "fx": intr[0], "fy": intr[1], "cx": intr[2], "cy": intr[3],
        "k1": dist[0], "k2": dist[1], "t1": dist[2], "t2": dist[3],
        "k3": dist[4], "i": np.arange(n)})
    out = project_points(spark.createDataFrame(pdf))
    got = {r["i"]: (r["u"], r["v"]) for r in out.collect()}
    for i in range(n):
        want = _plumb_bob_numpy(pts[i], *intr, dist)
        if want[0] is None:
            assert got[i] == (None, None), i
        else:
            assert np.allclose(got[i], want, atol=1e-9), i


def test_project_points_pinhole_and_plan(spark):
    """distortion=None is the ideal pinhole; the plan is pure
    Catalyst — no Python stage of any kind."""
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        project_points,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans import (
        formatted_plan,
    )
    pdf = pd.DataFrame({"x": [1.0, -2.0], "y": [0.5, 1.5],
                        "z": [2.0, 4.0],
                        "fx": 100.0, "fy": 200.0,
                        "cx": 10.0, "cy": 20.0})
    out = project_points(spark.createDataFrame(pdf), distortion=None)
    plan = formatted_plan(out)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    rows = sorted((r["u"], r["v"]) for r in out.collect())
    assert np.allclose(rows[0], (100.0 * -0.5 + 10.0,
                                 200.0 * 0.375 + 20.0))
    assert np.allclose(rows[1], (100.0 * 0.5 + 10.0,
                                 200.0 * 0.25 + 20.0))
    with pytest.raises(ValueError, match="no column"):
        project_points(spark.createDataFrame(pdf))  # no k1..k3 cols


def test_camera_info_intrinsics_k_p_and_short_d(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        camera_info_intrinsics,
    )
    K = [458.0, 0.0, 367.2, 0.0, 457.3, 248.4, 0.0, 0.0, 1.0]
    P = [400.0, 0.0, 350.5, -30.0, 0.0, 401.0, 250.25, 0.0,
         0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [{"K": K, "D": [0.1, -0.2], "P": P},
         {"K": K, "D": [], "P": P}],
        "K array<double>, D array<double>, P array<double>")
    got = camera_info_intrinsics(df).collect()[0]
    assert (got["fx"], got["fy"], got["cx"], got["cy"]) \
        == (458.0, 457.3, 367.2, 248.4)
    # short D: absent coefficients are 0.0 (the undistorted idiom)
    assert (got["k1"], got["k2"], got["t1"], got["t2"], got["k3"]) \
        == (0.1, -0.2, 0.0, 0.0, 0.0)
    empty = camera_info_intrinsics(df).collect()[1]
    assert (empty["k1"], empty["k3"]) == (0.0, 0.0)
    # rectified route: intrinsics from the 3x4 P matrix
    rect = camera_info_intrinsics(df, p_col="P", d_col=None).collect()[0]
    assert (rect["fx"], rect["fy"], rect["cx"], rect["cy"]) \
        == (400.0, 401.0, 350.5, 250.25)
    with pytest.raises(ValueError, match="no column"):
        camera_info_intrinsics(df.drop("D"))


def test_lidar_to_image_pipeline_composes(spark):
    """decode_pointcloud2 → transform_points → project_points: the
    full lidar→camera association path on a synthetic cloud, checked
    against one numpy chain."""
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        decode_pointcloud2, project_points, transform_points,
    )
    n = 6
    df = spark.createDataFrame([_xyz_cloud(n)], CLOUD_SCHEMA)
    pts = decode_pointcloud2(df, mode="long")
    # 90-degree yaw + translation puts the cloud in front of the cam
    q = (np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4))
    t = (0.5, -1.0, 8.0)
    posed = (pts
             .withColumn("qw", F.lit(q[0])).withColumn("qx", F.lit(q[1]))
             .withColumn("qy", F.lit(q[2])).withColumn("qz", F.lit(q[3]))
             .withColumn("tx", F.lit(t[0])).withColumn("ty", F.lit(t[1]))
             .withColumn("tz", F.lit(t[2])))
    cam = transform_points(posed)
    px = project_points(
        cam.withColumn("fx", F.lit(500.0)).withColumn("fy", F.lit(500.0))
        .withColumn("cx", F.lit(320.0)).withColumn("cy", F.lit(240.0)),
        cols=("x_t", "y_t", "z_t"), distortion=None)
    got = {int(r["x"]): (r["u"], r["v"]) for r in px.collect()}

    def rot(qq):
        w, xq, yq, zq = qq
        return np.array([
            [1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq),
             2 * (xq * zq + w * yq)],
            [2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq),
             2 * (yq * zq - w * xq)],
            [2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq),
             1 - 2 * (xq * xq + yq * yq)]])

    for i in range(n):
        p = rot(q) @ np.array([i, 2.0 * i, 3.0 * i]) + np.array(t)
        want = (500.0 * p[0] / p[2] + 320.0, 500.0 * p[1] / p[2] + 240.0)
        assert np.allclose(got[i], want, atol=1e-9), i


def _rational_numpy(p, fx, fy, cx, cy, d):
    x, y, z = p
    if z <= 0:
        return (None, None)
    k1, k2, p1, p2, k3, k4, k5, k6 = d
    xp, yp = x / z, y / z
    r2 = xp * xp + yp * yp
    rad = ((1 + k1 * r2 + k2 * r2**2 + k3 * r2**3)
           / (1 + k4 * r2 + k5 * r2**2 + k6 * r2**3))
    xpp = xp * rad + 2 * p1 * xp * yp + p2 * (r2 + 2 * xp * xp)
    ypp = yp * rad + p1 * (r2 + 2 * yp * yp) + 2 * p2 * xp * yp
    return (fx * xpp + cx, fy * ypp + cy)


def _equidistant_numpy(p, fx, fy, cx, cy, d):
    x, y, z = p
    if z <= 0:
        return (None, None)
    k1, k2, k3, k4 = d
    xp, yp = x / z, y / z
    r = np.sqrt(xp * xp + yp * yp)
    th = np.arctan(r)
    th_d = th * (1 + k1 * th**2 + k2 * th**4 + k3 * th**6
                 + k4 * th**8)
    s = th_d / r if r > 1e-12 else 1.0
    return (fx * xp * s + cx, fy * yp * s + cy)


def test_project_points_model_dispatch_matches_numpy(spark):
    """model_col= dispatches per row on the decoded distortion_model:
    plumb_bob / rational_polynomial / equidistant each match their
    numpy oracle in ONE mixed-camera pass; unknown models cull to
    NULL instead of silently projecting with the wrong math (r13
    VERDICT item 2)."""
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        project_points,
    )
    rng = np.random.default_rng(17)
    n = 240
    pts = rng.uniform(-2, 2, (n, 3))
    pts[:, 2] = np.abs(pts[:, 2]) + 0.5
    pts[: n // 8, 2] = -1.0                       # behind camera
    intr = (420.5, 419.75, 321.25, 239.5)
    # one calibration per model family, position-faithful D order
    D = {"plumb_bob": [0.08, -0.04, 0.001, -0.002, 0.006, 0, 0, 0],
         "rational_polynomial": [0.5, -0.1, 0.001, -0.002, 0.02,
                                 0.45, -0.08, 0.015],
         "equidistant": [-0.01, 0.03, -0.006, 0.001, 0, 0, 0, 0],
         "": [0.08, -0.04, 0.001, -0.002, 0.006, 0, 0, 0],
         "thin_prism": [0.1, 0, 0, 0, 0, 0, 0, 0]}
    models = list(D)
    rows = []
    for i in range(n):
        m = models[i % len(models)]
        rows.append({"x": pts[i, 0], "y": pts[i, 1], "z": pts[i, 2],
                     "fx": intr[0], "fy": intr[1], "cx": intr[2],
                     "cy": intr[3], "distortion_model": m, "i": i,
                     **{f"d{j+1}": float(D[m][j]) for j in range(8)}})
    out = project_points(spark.createDataFrame(pd.DataFrame(rows)),
                         model_col="distortion_model")
    got = {r["i"]: (r["u"], r["v"]) for r in out.collect()}
    for i in range(n):
        m = models[i % len(models)]
        if m == "thin_prism":
            assert got[i] == (None, None), i     # unknown model culls
            continue
        if m in ("plumb_bob", ""):
            want = _plumb_bob_numpy(pts[i], *intr, D[m][:5])
        elif m == "rational_polynomial":
            want = _rational_numpy(pts[i], *intr, D[m])
        else:
            want = _equidistant_numpy(pts[i], *intr, D[m][:4])
        if want[0] is None:
            assert got[i] == (None, None), i
        else:
            assert np.allclose(got[i], want, atol=1e-9), (i, m)


def test_project_points_model_dispatch_plan_pure(spark):
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        project_points,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans import (
        formatted_plan,
    )
    pdf = pd.DataFrame([{"x": 1.0, "y": 0.5, "z": 2.0, "fx": 100.0,
                         "fy": 100.0, "cx": 0.0, "cy": 0.0,
                         "distortion_model": "equidistant",
                         **{f"d{j}": 0.0 for j in range(1, 9)}}])
    out = project_points(spark.createDataFrame(pdf),
                         model_col="distortion_model")
    plan = formatted_plan(out)
    for stagey in ("BatchEvalPython", "ArrowEvalPython",
                   "MapInPandas"):
        assert stagey not in plan
    r = out.first()
    assert np.isclose(r["u"], 100.0 * np.arctan(np.hypot(.5, .25))
                      * (0.5 / np.hypot(0.5, 0.25)))


def test_camera_info_intrinsics_raw_d_columns(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        camera_info_intrinsics,
    )
    K = [458.0, 0.0, 367.2, 0.0, 457.3, 248.4, 0.0, 0.0, 1.0]
    df = spark.createDataFrame(
        [{"K": K, "D": [0.5, -0.1, 0.001, -0.002, 0.02, 0.45,
                        -0.08, 0.015]},
         {"K": K, "D": [-0.01, 0.03]}],
        "K array<double>, D array<double>")
    rows = camera_info_intrinsics(df).collect()
    assert [rows[0][f"d{i}"] for i in range(1, 9)] \
        == [0.5, -0.1, 0.001, -0.002, 0.02, 0.45, -0.08, 0.015]
    assert [rows[1][f"d{i}"] for i in range(1, 9)] \
        == [-0.01, 0.03, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]


def test_unproject_roundtrip_all_models(spark):
    """project(unproject(u, v, depth)) == (u, v) to tolerance on
    randomized intrinsics, for every distortion model — the fusion
    loop closes (r13 VERDICT item 3)."""
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        project_points, unproject_pixels,
    )
    rng = np.random.default_rng(23)
    D = {"plumb_bob": [0.08, -0.04, 0.001, -0.002, 0.006, 0, 0, 0],
         "rational_polynomial": [0.5, -0.1, 0.001, -0.002, 0.02,
                                 0.45, -0.08, 0.015],
         "equidistant": [-0.01, 0.03, -0.006, 0.001, 0, 0, 0, 0]}
    rows = []
    i = 0
    for m, d in D.items():
        for _ in range(40):
            fx, fy = rng.uniform(300, 900, 2)
            cx, cy = rng.uniform(200, 500, 2)
            # pixels near the principal point (physical distortion
            # models are only invertible inside their valid FOV)
            u = cx + rng.uniform(-0.35, 0.35) * fx
            v = cy + rng.uniform(-0.35, 0.35) * fy
            rows.append({"u": float(u), "v": float(v),
                         "fx": float(fx), "fy": float(fy),
                         "cx": float(cx), "cy": float(cy),
                         "depth": float(rng.uniform(1, 50)),
                         "distortion_model": m, "i": i,
                         **{f"d{j+1}": float(d[j]) for j in range(8)}})
            i += 1
    df = spark.createDataFrame(pd.DataFrame(rows))
    rays = unproject_pixels(df, model_col="distortion_model",
                            depth_col="depth")
    back = project_points(rays, cols=("rx", "ry", "rz"),
                          model_col="distortion_model",
                          out_cols=("u2", "v2"))
    for r in back.collect():
        assert abs(r["u2"] - r["u"]) < 1e-6, (r["i"],
                                              r["distortion_model"])
        assert abs(r["v2"] - r["v"]) < 1e-6, (r["i"],
                                              r["distortion_model"])
        assert abs(r["rz"] - r["depth"]) < 1e-12


def test_unproject_pinhole_and_guards(spark):
    import pandas as pd

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.sensors import (
        unproject_pixels,
    )
    pdf = pd.DataFrame([{"u": 110.0, "v": 260.0, "fx": 100.0,
                         "fy": 200.0, "cx": 10.0, "cy": 20.0}])
    r = unproject_pixels(spark.createDataFrame(pdf),
                         distortion=None).first()
    assert np.allclose((r["rx"], r["ry"], r["rz"]), (1.0, 1.2, 1.0))
    with pytest.raises(ValueError, match="no column"):
        unproject_pixels(spark.createDataFrame(pdf))  # wants k1..k3
