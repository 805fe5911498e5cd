"""JSONL/CSV quarantine ingestion: declared schemas, malformed lines
preserved verbatim, no inference."""

from __future__ import annotations

import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    read_csv, read_jsonl,
)


def test_read_jsonl_routes_malformed_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": 1, "body": "hello world", "lang": "en"}',
        '{"doc_id": 2, "body": "bonjour"}',              # missing field -> null
        'this is not json at all',                       # quarantine
        '{"doc_id": "not a number", "body": "x"}',       # type clash -> quarantine
        '{"doc_id": 5, "body": "ok", "extra": "ignored"}',
    ]))
    q = read_jsonl(spark, str(p),
                   "doc_id long, body string, lang string")
    try:
        good = {r.doc_id: (r.body, r.lang) for r in q.good.collect()}
        assert good == {1: ("hello world", "en"),
                        2: ("bonjour", None),
                        5: ("ok", None)}
        bad = sorted(r.raw_line for r in q.bad.collect())
        assert bad == ['this is not json at all',
                       '{"doc_id": "not a number", "body": "x"}']
        assert "extra" not in q.good.columns
    finally:
        q.unpersist()

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(p), "doc_id long, _corrupt_record string")


def test_read_csv_routes_malformed_rows(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("\n".join([
        "doc_id,score",
        "1,0.5",
        "2,not_a_double",
        "3,1.25",
    ]))
    q = read_csv(spark, str(p), "doc_id long, score double")
    try:
        good = {r.doc_id: r.score for r in q.good.collect()}
        assert good == {1: 0.5, 3: 1.25}
        assert [r.raw_line for r in q.bad.collect()] == ["2,not_a_double"]
    finally:
        q.unpersist()


def test_quarantine_read_does_not_mutate_declared_schema(spark, tmp_path):
    """r7 regression (ADVICE r6, medium): the reader schema must be a
    FRESH StructType — StructType.add mutates in place, which leaked
    _corrupt_record into `good` and broke schema reuse across reads."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "docs.jsonl"
    p.write_text('{"id": 1, "t": "ok"}\nnot json\n')
    declared = StructType([StructField("id", LongType()),
                           StructField("t", StringType())])
    r1 = read_jsonl(spark, str(p), declared)
    assert r1.good.columns == ["id", "t"]          # no corrupt column
    assert [f.name for f in declared.fields] == ["id", "t"]  # unmutated
    # the same StructType object must be reusable for a second read
    r2 = read_jsonl(spark, str(p), declared)
    assert r2.good.count() == 1 and r2.bad.count() == 1
    r1.unpersist(); r2.unpersist()
