"""rosbag2 recording-directory sidecar reader (r12 — VERDICT r11
item 4): a golden recording dir (metadata.yaml + two .db3 splits +
a .msg bundle) ingests with zero caller config; the MCAP routing,
the builtin yaml subset parser, and the wrong-yaml loud errors are
pinned too."""

from __future__ import annotations



import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    read_rosbag2, rosbag2_metadata,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources.rosbag2 import (
    _mini_yaml, load_definitions_dir,
)
from tests.test_db3 import DEFN, PAYLOADS, TIMES, TOPIC, TYPE, _db3_bytes
from tests.test_mcap import _channel, _file, _message, _schema


def _sidecar(storage="sqlite3", files=("split_0.db3", "split_1.db3"),
             cfmt="", cmode="", counts=(1, 1)) -> str:
    qos = '"- history: 3\\n  depth: 0\\n  reliability: 1"'
    lines = [
        "rosbag2_bagfile_information:",
        "  version: 4",
        f"  storage_identifier: {storage}",
        "  relative_file_paths:",
        *[f"    - {f}" for f in files],
        "  duration:",
        "    nanoseconds: 1000",
        "  starting_time:",
        "    nanoseconds_since_epoch: 1000",
        f"  message_count: {sum(counts)}",
        "  topics_with_message_count:",
        "    - topic_metadata:",
        f"        name: {TOPIC}",
        f"        type: {TYPE}",
        "        serialization_format: cdr",
        f"        offered_qos_profiles: {qos}",
        f"      message_count: {counts[0]}",
        f'  compression_format: "{cfmt}"',
        f'  compression_mode: "{cmode}"',
    ]
    if not files:
        lines[3] = "  relative_file_paths: []"
    return "\n".join(lines) + "\n"


def _recording(tmp_path, yaml_text=None, with_splits=True):
    d = tmp_path / "rosbag2_2026_08_16"
    d.mkdir(exist_ok=True)
    if with_splits:
        # two splits of the SAME recording: message 0 in split 0,
        # message 1 in split 1 (rosbag2 splits by size/duration)
        (d / "split_0.db3").write_bytes(
            _db3_bytes(rows=[(1, TIMES[0], PAYLOADS[0])]))
        (d / "split_1.db3").write_bytes(
            _db3_bytes(rows=[(1, TIMES[1], PAYLOADS[1])]))
        # a stray artifact that is NOT in relative_file_paths and
        # must NOT be read
        (d / "stray.db3").write_bytes(b"garbage, not sqlite")
    (d / "metadata.yaml").write_text(
        yaml_text if yaml_text is not None else _sidecar())
    return str(d)


def _msg_bundle(tmp_path):
    b = tmp_path / "msgs" / "demo"
    b.mkdir(parents=True, exist_ok=True)
    (b / "Mixed.msg").write_text(DEFN)
    return str(tmp_path / "msgs")


def test_mini_yaml_parses_the_sidecar():
    doc = _mini_yaml(_sidecar())
    info = doc["rosbag2_bagfile_information"]
    assert info["storage_identifier"] == "sqlite3"
    assert info["relative_file_paths"] == ["split_0.db3",
                                           "split_1.db3"]
    assert info["duration"]["nanoseconds"] == 1000
    t = info["topics_with_message_count"][0]
    assert t["topic_metadata"]["name"] == TOPIC
    assert t["topic_metadata"]["type"] == TYPE
    assert t["message_count"] == 1
    # quoted scalars keep escaped newlines (qos profile string)
    assert "history: 3\n" in t["topic_metadata"]["offered_qos_profiles"]
    assert info["compression_format"] == ""
    with pytest.raises(ValueError, match="unparseable"):
        _mini_yaml("a:\n  - x\n }broken{")


def test_mini_yaml_agrees_with_pyyaml():
    yaml = pytest.importorskip("yaml")
    assert _mini_yaml(_sidecar()) == yaml.safe_load(_sidecar())


def test_metadata_validation_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="no metadata.yaml"):
        rosbag2_metadata(str(tmp_path))
    bad = [
        ("not_rosbag: {}\n", ValueError, "missing top-level"),
        (_sidecar(storage="rocksdb"), ValueError,
         "storage_identifier"),
        (_sidecar(files=()), ValueError, "relative_file_paths"),
        (_sidecar(files=("nope.db3",)), FileNotFoundError,
         "do not exist"),
        (_sidecar(cfmt="lz4", cmode="file"), NotImplementedError,
         "compression_format"),
        (_sidecar(cfmt="zstd", cmode="sideways"), ValueError,
         "compression_mode"),
    ]
    for text, exc, match in bad:
        d = _recording(tmp_path, yaml_text=text)
        with pytest.raises(exc, match=match):
            rosbag2_metadata(d)
    # scheme paths are rejected pointing at the split readers
    with pytest.raises(ValueError, match="read_db3_messages"):
        rosbag2_metadata("s3a://bucket/rec")


def test_zero_config_ingest_two_splits(spark, tmp_path):
    """The headline: recording dir + .msg bundle, no hand-written
    definitions, both splits decoded through the shared CDR decoder,
    the stray non-listed file ignored."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        extract_mcap_topics,
    )
    d = _recording(tmp_path)
    meta = rosbag2_metadata(d)
    assert meta["storage_identifier"] == "sqlite3"
    assert meta["message_count"] == 2
    assert meta["topics"][0]["name"] == TOPIC
    msgs = read_rosbag2(spark, d,
                        definitions_dir=_msg_bundle(tmp_path))
    rows = msgs.orderBy("log_time_ns").collect()
    assert [r["db3_file"] for r in rows] == ["split_0.db3",
                                             "split_1.db3"]
    assert all(r["message_definition"] == DEFN for r in rows)
    dec = extract_mcap_topics(msgs)[TOPIC].orderBy("log_time_ns")
    got = dec.collect()
    assert [g["a"] for g in got] == [5, -6]
    assert [g["name"] for g in got] == ["hi", "worldly"]


def test_explicit_definitions_override_bundle(spark, tmp_path):
    d = _recording(tmp_path)
    alt = "int32 a\n"
    msgs = read_rosbag2(spark, d,
                        definitions_dir=_msg_bundle(tmp_path),
                        definitions={TYPE: alt})
    assert msgs.select("message_definition").first()[0] == alt


def test_definitions_dir_flat_and_errors(tmp_path):
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "demo__Mixed.msg").write_text(DEFN)
    assert load_definitions_dir(str(flat)) == {"demo/Mixed": DEFN}
    with pytest.raises(FileNotFoundError):
        load_definitions_dir(str(tmp_path / "absent"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no .msg files"):
        load_definitions_dir(str(empty))


def test_mcap_storage_routing(spark, tmp_path):
    """storage_identifier: mcap routes to the MCAP extractor over the
    listed splits — definitions come from the files themselves."""
    d = tmp_path / "rec_mcap"
    d.mkdir()
    recs = _schema(1, TYPE, DEFN) + _channel(7, 1, TOPIC)
    recs += _message(7, 0, TIMES[0], TIMES[0], PAYLOADS[0])
    (d / "split_0.mcap").write_bytes(_file(recs))
    (d / "metadata.yaml").write_text(
        _sidecar(storage="mcap", files=("split_0.mcap",)))
    msgs = read_rosbag2(spark, str(d))
    r = msgs.first()
    assert r["topic"] == TOPIC and r["message_definition"] == DEFN


def test_file_compression_mcap_decodes_builtin(spark, tmp_path,
                                               zstd_ref):
    """compression_mode: file over mcap storage: whole-split
    ``.mcap.zstd`` images decode builtin (r14, functions/zstd.py)
    through the _decompress_files Arrow pass."""
    d = tmp_path / "rec_mcap_z"
    d.mkdir()
    recs = _schema(1, TYPE, DEFN) + _channel(7, 1, TOPIC)
    recs += _message(7, 0, TIMES[0], TIMES[0], PAYLOADS[0])
    (d / "split_0.mcap.zstd").write_bytes(zstd_ref(_file(recs)))
    (d / "metadata.yaml").write_text(
        _sidecar(storage="mcap", files=("split_0.mcap.zstd",),
                 cfmt="zstd", cmode="file"))
    r = read_rosbag2(spark, str(d)).first()
    assert r["topic"] == TOPIC and r["message_definition"] == DEFN
    assert bytes(r["data"]) == PAYLOADS[0]


def test_message_compression_decodes_builtin(tmp_path, zstd_ref):
    """Per-message zstd (rosbag2 compression_mode: message) decodes
    builtin (r14, functions/zstd.py) — blobs round-trip with no
    optional package."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        parse_db3_bytes,
    )
    comp = zstd_ref(PAYLOADS[0])
    blob = _db3_bytes(rows=[(1, TIMES[0], comp)])
    (row,) = parse_db3_bytes("x.db3", blob,
                             message_compression="zstd")
    assert row[-1] == PAYLOADS[0]


def test_unknown_message_compression_loud():
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        parse_db3_bytes,
    )
    with pytest.raises(NotImplementedError, match="lz4"):
        list(parse_db3_bytes("x.db3", _db3_bytes(),
                             message_compression="lz4"))
