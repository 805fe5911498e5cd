"""ROS1 bag source tests.

The tests synthesize byte-exact ROS1 v2.0 bags (public format:
length-prefixed records, key=value headers, messages in optionally
bz2-compressed chunks) and read them back through the distributed
source, pinning topics, timestamps, and primitive-field decoding.
"""

from __future__ import annotations

import bz2
import struct

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources.rosbag import (
    decode_primitive_messages, parse_bag_bytes, parse_message_definition,
    read_bag_messages, topic_metadata,
)

STEERING_DEF = """# steering report
float64 steering_wheel_angle
float64 speed
bool enabled
"""

GPS_DEF = """string status_text
int32 num_sats
"""


def _field(name: str, value: bytes) -> bytes:
    payload = name.encode() + b"=" + value
    return struct.pack("<I", len(payload)) + payload


def _record(fields: dict[str, bytes], data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (struct.pack("<I", len(header)) + header
            + struct.pack("<I", len(data)) + data)


def _connection(cid: int, topic: str, msg_type: str, defn: str) -> bytes:
    data = (_field("topic", topic.encode())
            + _field("type", msg_type.encode())
            + _field("md5sum", b"d" * 32)
            + _field("message_definition", defn.encode()))
    return _record({"op": b"\x07", "conn": struct.pack("<I", cid),
                    "topic": topic.encode()}, data)


def _message(cid: int, t_sec: int, t_nsec: int, payload: bytes) -> bytes:
    return _record({"op": b"\x02", "conn": struct.pack("<I", cid),
                    "time": struct.pack("<II", t_sec, t_nsec)}, payload)


def _steering_payload(angle: float, speed: float, enabled: bool) -> bytes:
    return struct.pack("<dd?", angle, speed, enabled)


def _gps_payload(status: str, sats: int) -> bytes:
    s = status.encode()
    return struct.pack("<I", len(s)) + s + struct.pack("<i", sats)


def _chunk(records: bytes, compression: str = "none") -> bytes:
    body = bz2.compress(records) if compression == "bz2" else records
    return _record({"op": b"\x05", "compression": compression.encode(),
                    "size": struct.pack("<I", len(records))}, body)


def make_bag(compression: str = "none") -> bytes:
    """Two topics: /vehicle/steering_report (3 msgs), /vehicle/gps (2)."""
    inner = (
        _connection(0, "/vehicle/steering_report",
                    "dbw_mkz_msgs/SteeringReport", STEERING_DEF)
        + _connection(1, "/vehicle/gps", "gps_msgs/GPSStatus", GPS_DEF)
        + _message(0, 100, 0, _steering_payload(0.5, 10.0, True))
        + _message(0, 100, 500_000_000, _steering_payload(0.6, 11.0, True))
        + _message(1, 100, 250_000_000, _gps_payload("OK", 7))
        + _message(0, 101, 0, _steering_payload(0.7, 12.0, False))
        + _message(1, 101, 250_000_000, _gps_payload("WEAK", 3))
    )
    bag_header = _record({"op": b"\x03",
                          "index_pos": struct.pack("<Q", 0),
                          "conn_count": struct.pack("<I", 2),
                          "chunk_count": struct.pack("<I", 1)}, b" " * 64)
    return b"#ROSBAG V2.0\n" + bag_header + _chunk(inner, compression)


@pytest.fixture(scope="module", params=["none", "bz2"])
def bag_dir(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"bags_{request.param}")
    (d / "drive1.bag").write_bytes(make_bag(request.param))
    return str(d)


def test_parse_bag_bytes_pure():
    msgs = list(parse_bag_bytes("x.bag", make_bag()))
    assert len(msgs) == 5
    topics = {m[1] for m in msgs}
    assert topics == {"/vehicle/steering_report", "/vehicle/gps"}
    # time_ns of first steering message
    assert msgs[0][5] == 100 * 1_000_000_000


def test_read_bag_messages_distributed(spark, bag_dir):
    df = read_bag_messages(spark, bag_dir)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.bag_file == "drive1.bag" for r in rows)
    steering = [r for r in rows if r.topic == "/vehicle/steering_report"]
    assert len(steering) == 3
    assert steering[0].msg_type == "dbw_mkz_msgs/SteeringReport"
    assert "float64 steering_wheel_angle" in steering[0].message_definition


def test_topic_metadata_stats(spark, bag_dir):
    meta = {r.topic: r for r in
            topic_metadata(read_bag_messages(spark, bag_dir)).collect()}
    s = meta["/vehicle/steering_report"]
    assert s.n_messages == 3
    assert s.first_time_ns == 100 * 10**9 and s.last_time_ns == 101 * 10**9
    assert s.frequency_hz == 3.0  # 3 msgs over exactly 1 s


def test_decode_primitive_messages(spark, bag_dir):
    msgs = read_bag_messages(spark, bag_dir)
    steering = decode_primitive_messages(
        msgs.where(F.col("topic") == "/vehicle/steering_report"), STEERING_DEF)
    rows = sorted(steering.collect(), key=lambda r: r.time_ns)
    assert [r.steering_wheel_angle for r in rows] == [0.5, 0.6, 0.7]
    assert [r.speed for r in rows] == [10.0, 11.0, 12.0]
    assert [r.enabled for r in rows] == [True, True, False]

    gps = decode_primitive_messages(
        msgs.where(F.col("topic") == "/vehicle/gps"), GPS_DEF)
    grows = sorted(gps.collect(), key=lambda r: r.time_ns)
    assert [(r.status_text, r.num_sats) for r in grows] == [("OK", 7), ("WEAK", 3)]


def test_parse_message_definition_skips_constants_and_deps():
    defn = ("uint8 GEAR_PARK=1  # constant\n"
            "float64 speed\n"
            "================================================================================\n"
            "MSG: std_msgs/Header\nuint32 seq\n")
    assert parse_message_definition(defn) == [("float64", "speed")]


def test_nested_types_raise_not_implemented(spark, bag_dir):
    msgs = read_bag_messages(spark, bag_dir)
    with pytest.raises(NotImplementedError, match="msg-IDL"):
        decode_primitive_messages(msgs, "std_msgs/Header header\nfloat64 x\n")


def test_bag_to_synchronize_pipeline_end_to_end(spark, bag_dir):
    """Bag → decode → wide 2 Hz LOCF table: the reference's entry-point-A
    feeding entry-point-B, all in one Spark plan."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.pipeline import (
        synchronize_topics,
    )
    msgs = read_bag_messages(spark, bag_dir)
    steering = decode_primitive_messages(
        msgs.where(F.col("topic") == "/vehicle/steering_report"), STEERING_DEF) \
        .select("bag_file", F.col("time_ns").alias("t"), "speed")
    gps = decode_primitive_messages(
        msgs.where(F.col("topic") == "/vehicle/gps"), GPS_DEF) \
        .select("bag_file", F.col("time_ns").alias("t"), "num_sats")
    wide = synchronize_topics({"steering": steering, "gps": gps},
                              ["bag_file"], time_col="t", step=500_000_000)
    rows = sorted(wide.collect(), key=lambda r: r.t)
    assert len(rows) == 3  # ticks at 100.0, 100.5, 101.0 s
    assert rows[0].steering.speed == 10.0
    assert rows[1].steering.speed == 11.0
    assert rows[1].gps.num_sats == 7   # LOCF from 100.25
    # the sats=3 reading lands at 101.25 s — after the last tick — so
    # LOCF at 101.0 still carries 7
    assert rows[2].gps.num_sats == 7
