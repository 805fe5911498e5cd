"""WARC web-archive ingestion — the front door real web corpora
arrive through (Common-Crawl-style), completing the
extract → clean → dedup pipeline end-to-end: ``read_warc`` →
:func:`~..functions.text.html_to_text` /
``strip_boilerplate_lines`` → the dedup/quality operators.

Format: ISO 28500 — a WARC file is a sequence of records, each a
``WARC/1.x`` header block (``Name: value`` lines, CRLF), a blank
line, then exactly ``Content-Length`` payload bytes. ``response``
records carry a full HTTP response (status line + headers + body) as
payload. Files are commonly gzipped per record with the members
concatenated — a single gzip stream decompresses the whole file.

Scale shape
-----------
``binaryFile`` hands each archive file to ONE task whole (Spark's
binary source; a WARC can't be line-split — records are
length-framed). Parallelism is across files, which matches how web
corpora ship (Common Crawl: ~100 MB-1 GB per .warc.gz, tens of
thousands of files per crawl) — at 100 TB that is 10⁵ independent
tasks with zero shuffle; the parse is one Arrow pass per file.
The 2 GB per-file ceiling is Spark's binary-source limit and is far
above the archive convention; oversized files are QUARANTINED with a
clear reason, not crashed on.

Malformed records are DATA, not errors (the ``read_jsonl`` /
``quarantine_batch`` discipline): a record with a bad header block,
an unparsable Content-Length, or truncated payload is routed to the
``bad`` frame with (file, offset, reason, snippet) preserved for
repair, and parsing RESYNCS to the next ``WARC/`` magic so one
corrupt record doesn't sink the rest of its file.

The reference has no web ingestion (its sources are ROS bags on S3);
this is part of the beyond-reference LLM-data surface.
"""

from __future__ import annotations

import gzip

from pyspark.sql import DataFrame, SparkSession

from .textual import QuarantinedRead

_RECORDS_SCHEMA = ("record_id string, warc_type string, "
                   "target_uri string, warc_date string, "
                   "content_type string, http_status int, "
                   "payload binary, src_file string, rec_offset long, "
                   "_err string, _snippet string")

_MAGIC = b"WARC/"


def parse_warc_bytes(data: bytes):
    """Pure-Python WARC member walk (shared by the Spark reader and
    tests): yields ``(offset, headers, payload, error)`` tuples —
    ``error`` is None for clean records; on a malformed region one
    error tuple is emitted and the walk resyncs at the next
    ``WARC/`` magic."""
    out = []
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        start = i
        if data[i:i + len(_MAGIC)] != _MAGIC:
            nxt = data.find(_MAGIC, i + 1)
            out.append((start, None, None, "no WARC/ magic at offset"))
            if nxt < 0:
                break
            i = nxt
            continue
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            out.append((start, None, None, "unterminated header block"))
            break
        headers = {}
        try:
            lines = data[i:hdr_end].decode("utf-8",
                                           errors="replace").split("\r\n")
            for line in lines[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
        except Exception:  # noqa: BLE001 — header block is hostile input
            headers = {}
        cl = headers.get("content-length")
        if cl is None or not cl.isdigit():
            out.append((start, None, None,
                        f"bad Content-Length {cl!r}"))
            nxt = data.find(_MAGIC, hdr_end)
            if nxt < 0:
                break
            i = nxt
            continue
        cl = int(cl)
        payload = data[hdr_end + 4:hdr_end + 4 + cl]
        if len(payload) < cl:
            out.append((start, None, None,
                        f"truncated payload ({len(payload)}/{cl} bytes)"))
            break
        out.append((start, headers, payload, None))
        i = hdr_end + 4 + cl
    return out


def split_http_response(payload: bytes):
    """``(status, body)`` from an HTTP response payload; (None,
    payload) when it isn't one (resource records, weird servers)."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, payload
    try:
        status = int(payload[:sep].split(b"\r\n", 1)[0].split()[1])
    except (IndexError, ValueError):
        return None, payload
    return status, payload[sep + 4:]


def warc_records_frame(binary_df: DataFrame, *,
                       types: tuple[str, ...] = ("response",),
                       strip_http_headers: bool = True) -> DataFrame:
    """The parse stage alone: a ``(path, content)`` frame (batch OR
    streaming ``binaryFile`` source) → one row per record with
    ``_err``/``_snippet`` still attached — the raw relation both
    :func:`read_warc` and the streaming ingest loop split."""
    want = tuple(t.lower() for t in types)

    def parse(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for src, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    try:
                        data = gzip.decompress(data)
                    except Exception as e:  # noqa: BLE001 — hostile gz
                        rows.append((None, None, None, None, None,
                                     None, None, src, 0,
                                     f"gzip decompress failed: {e}",
                                     repr(data[:64])))
                        continue
                for off, headers, payload, err in parse_warc_bytes(data):
                    if err is not None:
                        rows.append((None, None, None, None, None,
                                     None, None, src, off, err,
                                     repr(data[off:off + 120])))
                        continue
                    wtype = (headers.get("warc-type") or "").lower()
                    if want and wtype not in want:
                        continue
                    status, body = (split_http_response(payload)
                                    if strip_http_headers
                                    else (None, payload))
                    rows.append((
                        headers.get("warc-record-id"), wtype,
                        headers.get("warc-target-uri"),
                        headers.get("warc-date"),
                        headers.get("content-type"),
                        status, body, src, off, None, None))
            yield pd.DataFrame(rows, columns=[
                "record_id", "warc_type", "target_uri", "warc_date",
                "content_type", "http_status", "payload", "src_file",
                "rec_offset", "_err", "_snippet"])

    return (binary_df.select("path", "content")
            .mapInPandas(parse, _RECORDS_SCHEMA))


def read_warc(spark: SparkSession, path: str, *,
              types: tuple[str, ...] = ("response",),
              strip_http_headers: bool = True) -> QuarantinedRead:
    """Read WARC archives into one row per record of the requested
    ``types`` (default: ``response`` — the fetched pages).

    ``good`` columns: ``record_id, warc_type, target_uri, warc_date,
    content_type, http_status, payload, src_file, rec_offset`` —
    ``payload`` is the HTTP BODY bytes when ``strip_http_headers``
    (status parsed into ``http_status``), decode downstream with
    ``decode(payload, 'utf-8')`` + :func:`~..functions.text.
    html_to_text`. ``bad`` columns: ``src_file, rec_offset, reason,
    snippet`` — every malformed region, verbatim context preserved.
    Same caller-owned persist contract as :func:`~.textual.
    read_jsonl` (call ``.unpersist()`` when both frames are
    consumed)."""
    from pyspark.sql import functions as F

    raw = warc_records_frame(
        spark.read.format("binaryFile").load(path),
        types=types, strip_http_headers=strip_http_headers)
    cached = raw.persist()
    good = (cached.where(F.col("_err").isNull())
            .drop("_err", "_snippet"))
    bad = (cached.where(F.col("_err").isNotNull())
           .select("src_file", "rec_offset",
                   F.col("_err").alias("reason"),
                   F.col("_snippet").alias("snippet")))
    return QuarantinedRead(good=good, bad=bad, _cached=cached)
