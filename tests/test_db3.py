"""ROS2 sqlite (.db3) bag source (r11): golden spec-built databases
(rosbag2_storage_default_plugins schema, public), decode parity with
the MCAP twin of the same recording through the SHARED CDR decoder,
the missing-definition loud guard, corrupt-file salvage, and topic
metadata parity. The .db3 images are built in-memory with stdlib
sqlite3 — the same synthetic-golden-file discipline as
tests/test_mcap.py / tests/test_rosbag.py."""

from __future__ import annotations

import os
import sqlite3

import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    db3_topic_metadata, extract_mcap_topics, mcap_topic_metadata,
    parse_db3_bytes, read_db3_messages, read_mcap_messages,
)
from tests.test_mcap import (
    DEFN, _channel, _file, _message, _payload, _schema,
)

PAYLOADS = [
    _payload(5, 2.5, "hi", True, [3, 4], [1.0, 2.0],
             b"\xab\xcd", 9.5, -2),
    _payload(-6, 0.25, "worldly", False, [1, 2], [], b"", -1.5, 7),
]
TIMES = [1_000, 2_000]
TYPE = "demo/Mixed"
TOPIC = "/demo"


def _db3_bytes(rows=None, topics=None) -> bytes:
    """One in-memory .db3 image with the public rosbag2 storage
    schema. rows = [(topic_id, timestamp, payload)]."""
    con = sqlite3.connect(":memory:")
    con.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT NOT "
        "NULL, type TEXT NOT NULL, serialization_format TEXT NOT "
        "NULL, offered_qos_profiles TEXT NOT NULL)")
    con.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id "
        "INTEGER NOT NULL, timestamp INTEGER NOT NULL, data BLOB "
        "NOT NULL)")
    for t in (topics if topics is not None
              else [(1, TOPIC, TYPE, "cdr", "")]):
        con.execute("INSERT INTO topics VALUES (?,?,?,?,?)", t)
    for tid, ts, data in (rows if rows is not None else
                          [(1, ts, d)
                           for ts, d in zip(TIMES, PAYLOADS)]):
        con.execute(
            "INSERT INTO messages(topic_id, timestamp, data) "
            "VALUES (?,?,?)", (tid, ts, data))
    con.commit()
    blob = con.serialize()
    con.close()
    return bytes(blob)


def _mcap_twin() -> bytes:
    """The SAME recording as _db3_bytes() framed as MCAP (pub time =
    log time, since .db3 stores one timestamp)."""
    recs = _schema(1, TYPE, DEFN) + _channel(7, 1, TOPIC)
    for i, (ts, d) in enumerate(zip(TIMES, PAYLOADS)):
        recs += _message(7, i, ts, ts, d)
    return _file(recs)


def _write(tmp_path, sub: str, name: str, blob: bytes) -> str:
    d = str(tmp_path / sub)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "wb") as f:
        f.write(blob)
    return d


def test_golden_extraction(spark, tmp_path):
    d = _write(tmp_path, "bags", "a.db3", _db3_bytes())
    df = read_db3_messages(spark, d, definitions={TYPE: DEFN})
    rows = sorted(df.collect(), key=lambda r: r["sequence"])
    assert len(rows) == 2
    r = rows[0]
    assert (r["db3_file"], r["topic"], r["schema_name"]) == \
        ("a.db3", TOPIC, TYPE)
    assert (r["message_encoding"], r["schema_encoding"]) == \
        ("cdr", "ros2msg")
    assert r["message_definition"] == DEFN
    # db3 stores one timestamp: log == publish
    assert r["log_time_ns"] == r["publish_time_ns"] == 1_000
    assert bytes(r["data"]) == PAYLOADS[0]


def test_decode_equals_mcap_twin(spark, tmp_path):
    """The r10 VERDICT done-condition: a golden .db3 decodes
    byte-equal to its MCAP twin — both through the SAME CDR decoder
    and the SAME topic extractor (extract_mcap_topics consumes the
    db3 message frame unchanged)."""
    dd = _write(tmp_path, "db3", "a.db3", _db3_bytes())
    dm = _write(tmp_path, "mcap", "a.mcap", _mcap_twin())
    t_db3 = extract_mcap_topics(
        read_db3_messages(spark, dd, definitions={TYPE: DEFN}))
    t_mcap = extract_mcap_topics(read_mcap_messages(spark, dm))
    assert set(t_db3) == set(t_mcap) == {TOPIC}
    # compare the decoded payload columns + time, keyed on log time
    # (sequence counters differ by container: db3 row ids are 1-based)
    common = [c for c in t_mcap[TOPIC].columns
              if c in t_db3[TOPIC].columns
              and c not in ("sequence",)]
    a = [tuple(r) for r in t_db3[TOPIC].select(*common)
         .orderBy("log_time_ns").collect()]
    b = [tuple(r) for r in t_mcap[TOPIC].select(*common)
         .orderBy("log_time_ns").collect()]
    assert a == b and len(a) == 2


def test_missing_definition_null_and_loud_guard(spark, tmp_path):
    d = _write(tmp_path, "bags", "a.db3", _db3_bytes())
    msgs = read_db3_messages(spark, d)        # no definitions mapping
    rows = msgs.collect()
    assert all(r["message_definition"] is None for r in rows)
    assert all(r["schema_encoding"] == "" for r in rows)
    with pytest.raises(ValueError, match="NULL"):
        extract_mcap_topics(msgs)
    # fallback resolution by TOPIC name also serves
    by_topic = read_db3_messages(spark, d, definitions={TOPIC: DEFN})
    assert all(r["message_definition"] == DEFN
               for r in by_topic.collect())


def test_corrupt_file_salvage_and_fail(spark, tmp_path):
    good = _db3_bytes()
    d = _write(tmp_path, "bags", "good.db3", good)
    # not sqlite at all + a torn image that fails inside sqlite
    _write(tmp_path, "bags", "junk.db3", b"\x00" * 64)
    _write(tmp_path, "bags", "torn.db3", good[:len(good) // 2])
    with pytest.raises(Exception):
        read_db3_messages(spark, d).collect()
    df = read_db3_messages(spark, d, definitions={TYPE: DEFN},
                           on_error="skip")
    rows = df.collect()
    ok = [r for r in rows if r["error"] is None]
    bad = {r["db3_file"]: r["error"] for r in rows
           if r["error"] is not None}
    assert len(ok) == 2 and all(r["db3_file"] == "good.db3"
                                for r in ok)
    assert set(bad) == {"junk.db3", "torn.db3"}


def test_parse_rejects_non_sqlite():
    with pytest.raises(ValueError, match="not a sqlite3"):
        list(parse_db3_bytes("x.db3", b"PK\x03\x04 zip bytes"))


def test_topic_metadata_parity(spark, tmp_path):
    dd = _write(tmp_path, "db3", "a.db3", _db3_bytes())
    dm = _write(tmp_path, "mcap", "a.mcap", _mcap_twin())
    md = db3_topic_metadata(
        read_db3_messages(spark, dd, definitions={TYPE: DEFN}))
    mm = mcap_topic_metadata(read_mcap_messages(spark, dm))
    rd, rm = md.first(), mm.first()
    assert rd["topic"] == rm["topic"] == TOPIC
    assert rd["msg_type"] == rm["msg_type"] == TYPE
    for c in ("message_count", "t_min", "t_max", "frequency_hz"):
        assert rd[c] == rm[c]


def test_db3_ingest_stream_end_to_end(spark, tmp_path):
    """The third extract loop: streaming binaryFile source → .db3
    extract (CDR-decoding transform) → quarantine for corrupt images
    → ONE exactly-once snapshot_append per micro-batch, with the
    per-batch admission stats on record; a restart with no new files
    publishes nothing."""
    import json

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        latest_version, read_snapshot,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import db3_ingest_stream

    src = str(tmp_path / "landing")
    tbl = str(tmp_path / "tbl")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    log = str(tmp_path / "ingest_log.jsonl")
    good = _db3_bytes()
    _write(tmp_path, "landing", "good.db3", good)
    _write(tmp_path, "landing", "bad.db3", good[:len(good) // 2])

    def run():
        return db3_ingest_stream(
            spark, src, table_path=tbl, quarantine_path=quar,
            checkpoint_dir=ckpt, definitions={TYPE: DEFN},
            transform=lambda df: df.select("db3_file", "topic",
                                           "log_time_ns", "data"),
            ingest_log=log)

    q = run()
    q.awaitTermination(120)
    rows = read_snapshot(spark, tbl).collect()
    assert sorted((r["db3_file"], r["log_time_ns"]) for r in rows) \
        == [("good.db3", 1000), ("good.db3", 2000)]
    quar_rows = spark.read.parquet(quar).collect()
    assert len(quar_rows) == 1 and quar_rows[0]["db3_file"] == "bad.db3"
    entries = [json.loads(ln) for ln in open(log, encoding="utf-8")]
    assert sum(e["files"] for e in entries) == 2
    assert sum(e["records"] for e in entries) == 2
    assert sum(e["quarantined"] for e in entries) == 1
    v = latest_version(spark, tbl)

    q2 = run()
    q2.awaitTermination(120)
    assert latest_version(spark, tbl) == v


def test_zstd_compressed_image_decodes_builtin(zstd_ref):
    """A .db3.zstd image (rosbag2 file-level compression) decodes
    builtin (r14, functions/zstd.py) — no optional package needed —
    and a corrupt image stays on the reader contract's ValueError
    (so on_error='skip' salvage fires)."""
    comp = zstd_ref(_db3_bytes())
    rows = list(parse_db3_bytes("a.db3.zstd", comp, {TYPE: DEFN}))
    assert len(rows) == 2
    with pytest.raises(ValueError, match="zstd image"):
        list(parse_db3_bytes("a.db3.zstd",
                             b"\x28\xb5\x2f\xfd" + b"\x00" * 16))
