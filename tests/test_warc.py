"""WARC ingestion front door (r8, VERDICT item 7): golden-file
extraction through read_warc → html_to_text, malformed-record
quarantine with resync, gzip members, and the pure parser's framing
properties."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
    parse_warc_bytes, read_warc, split_http_response,
)

HTML = (b"<html><head><title>skip me</title>"
        b"<style>body{color:red}</style></head>"
        b"<body><h1>Hello &amp; Welcome</h1>"
        b"<script>var x = '<p>not text</p>';</script>"
        b"<p>First paragraph.</p><p>Second &lt;tagged&gt; one.</p>"
        b"<!-- comment --><div>Last block</div></body></html>")

GOLDEN_TEXT = ("Hello & Welcome\n"
               "First paragraph.\n"
               "Second <tagged> one.\n"
               "Last block")


def _record(rtype: str, uri: str, payload: bytes,
            rid: str = "<urn:uuid:1>") -> bytes:
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {rtype}\r\n"
           f"WARC-Record-ID: {rid}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           f"Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(payload)}\r\n"
           f"\r\n").encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          ctype: bytes = b"text/html") -> bytes:
    return (b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"\r\n" + body)


def test_parse_warc_bytes_framing():
    """Length-framed walk: records recovered exactly; a corrupt header
    region yields ONE error and resyncs at the next WARC/ magic."""
    blob = (_record("warcinfo", "-", b"info-payload")
            + _record("response", "http://a.example/", _http(b"A"))
            + b"GARBAGE-NOT-A-RECORD\r\n\r\n"
            + _record("response", "http://b.example/", _http(b"B")))
    recs = parse_warc_bytes(blob)
    clean = [r for r in recs if r[3] is None]
    errs = [r for r in recs if r[3] is not None]
    assert len(clean) == 3 and len(errs) == 1
    assert "magic" in errs[0][3]
    assert [r[1]["warc-type"] for r in clean] == \
        ["warcinfo", "response", "response"]
    status, body = split_http_response(clean[1][2])
    assert (status, body) == (200, b"A")

    # truncated payload: error, walk stops without inventing records
    trunc = _record("response", "http://c.example/", _http(b"CCCC"))
    recs2 = parse_warc_bytes(trunc[:-10])
    assert any(r[3] and "truncated" in r[3] for r in recs2)


def test_read_warc_golden_extraction(spark, tmp_path):
    """The end-to-end front door: a .warc file and a gzipped twin read
    into records; payload → decode → html_to_text equals the golden
    text; non-requested record types are dropped."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import html_to_text

    blob = (_record("warcinfo", "-", b"crawler=test")
            + _record("response", "http://x.example/page",
                      _http(HTML), rid="<urn:uuid:42>")
            + _record("request", "http://x.example/page",
                      b"GET /page HTTP/1.1\r\n\r\n"))
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(blob)
    (d / "b.warc.gz").write_bytes(gzip.compress(blob))

    qr = read_warc(spark, str(d))
    try:
        rows = qr.good.collect()
        assert len(rows) == 2                  # one response per file
        assert {r["warc_type"] for r in rows} == {"response"}
        r = [x for x in rows if x["src_file"].endswith("a.warc")][0]
        assert r["record_id"] == "<urn:uuid:42>"
        assert r["target_uri"] == "http://x.example/page"
        assert r["http_status"] == 200
        assert bytes(r["payload"]) == HTML
        assert qr.bad.count() == 0

        got = (qr.good
               .select(html_to_text(
                   F.decode(F.col("payload"), "utf-8")).alias("text"))
               .collect())
        assert all(g["text"] == GOLDEN_TEXT for g in got)
    finally:
        qr.unpersist()


def test_read_warc_quarantines_malformed_and_keeps_good(spark,
                                                        tmp_path):
    """Malformed regions land in bad (file, offset, reason, snippet)
    while clean records in the SAME file still parse — one corrupt
    record must not sink its file."""
    good1 = _record("response", "http://ok1.example/", _http(b"one"))
    corrupt = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: NOT_A_NUMBER\r\n\r\nxxx")
    good2 = _record("response", "http://ok2.example/", _http(b"two"))
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "mixed.warc").write_bytes(good1 + corrupt + good2)
    (d / "not_even.warc.gz").write_bytes(b"\x1f\x8bthis is not gzip")

    qr = read_warc(spark, str(d))
    try:
        assert {r["target_uri"] for r in qr.good.collect()} == \
            {"http://ok1.example/", "http://ok2.example/"}
        bad = qr.bad.collect()
        reasons = " | ".join(b["reason"] for b in bad)
        assert "Content-Length" in reasons
        assert "gzip" in reasons
        assert all(b["snippet"] for b in bad)
    finally:
        qr.unpersist()


def test_html_to_text_boilerplate_composition(spark):
    """html_to_text composes with strip_boilerplate_lines: nav-link
    lines vanish, content lines survive — the extract→clean chain."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import (
        html_to_text, strip_boilerplate_lines,
    )
    page = ("<body><div>http://a.example http://b.example</div>"
            "<p>This sentence has enough words to survive the "
            "filter.</p><div>Home</div></body>")
    df = spark.createDataFrame([(page,)], "html string")
    out = df.select(strip_boilerplate_lines(
        html_to_text(F.col("html"))).alias("t")).collect()[0]["t"]
    assert out == ("This sentence has enough words to survive the "
                   "filter.")


def test_warc_ingest_stream_end_to_end(spark, tmp_path):
    """The extract loop (r8): WARC archives land in a watched dir, the
    stream parses each micro-batch, quarantines malformed regions,
    applies the decode+html_to_text transform, and commits clean
    records to a snapshot table exactly-once — a second run with the
    same checkpoint and no new files publishes nothing."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions import html_to_text
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.sources import (
        latest_version, read_snapshot,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.streaming import warc_ingest_stream

    src = tmp_path / "in"
    src.mkdir()
    blob1 = _record("response", "http://a.example/", _http(HTML))
    corrupt = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: NaN\r\n\r\nzz")
    (src / "a.warc").write_bytes(blob1 + corrupt)
    (src / "b.warc.gz").write_bytes(gzip.compress(
        _record("response", "http://b.example/", _http(b"<p>two</p>"))))

    table = str(tmp_path / "tbl")
    quarantine = str(tmp_path / "bad")
    ckpt = str(tmp_path / "ckpt")

    def extract(df):
        return df.select(
            "target_uri", "http_status",
            html_to_text(F.decode(F.col("payload"), "utf-8"))
            .alias("text"))

    ingest_log = str(tmp_path / "ingest_log.jsonl")
    q = warc_ingest_stream(spark, str(src), table_path=table,
                           quarantine_path=quarantine,
                           checkpoint_dir=ckpt, transform=extract,
                           max_files_per_trigger=1,
                           ingest_log=ingest_log)
    q.awaitTermination(180)

    # no-silent-caps admission reporting (r10 VERDICT item 8): with
    # maxFilesPerTrigger=1 each batch admits exactly one file, and
    # the per-batch clean/quarantined splits are on record
    import json
    entries = [json.loads(ln) for ln in
               open(ingest_log, encoding="utf-8")]
    assert [e["files"] for e in entries] == [1, 1]
    assert sum(e["records"] for e in entries) == 2
    assert sum(e["quarantined"] for e in entries) == 1
    assert all(e["source"] == "warc" and "version" in e
               for e in entries)

    got = {r["target_uri"]: r["text"]
           for r in read_snapshot(spark, table).collect()}
    assert got == {"http://a.example/": GOLDEN_TEXT,
                   "http://b.example/": "two"}
    bad = spark.read.parquet(quarantine)
    assert bad.count() == 1
    assert "Content-Length" in bad.collect()[0]["reason"]
    v = latest_version(spark, table)

    # restart, no new files: exactly-once (no empty commits)
    q2 = warc_ingest_stream(spark, str(src), table_path=table,
                            quarantine_path=quarantine,
                            checkpoint_dir=ckpt, transform=extract,
                            max_files_per_trigger=1)
    q2.awaitTermination(180)
    assert latest_version(spark, table) == v
