"""ROS2 sqlite (``.db3``) bag source — the third container of the ROS
recording family (reference domain: ROS drive logs, README.md:83-113).

rosbag2's default storage before MCAP is a sqlite3 database with the
public schema (rosbag2_storage_default_plugins):

    topics   (id, name, type, serialization_format, ...)
    messages (id, topic_id, timestamp, data)

Same Spark shape as the ROS1 (`rosbag.py`) and MCAP (`mcap.py`)
readers: whole files fan out over ``binaryFile`` + ``mapInPandas``
(file-level parallelism, zero driver involvement), and each executor
opens its file image with stdlib ``sqlite3`` via
``Connection.deserialize`` — no temp files, no native deps. Payloads
are CDR exactly like MCAP, so the decode half IS the MCAP decoder
(:func:`~.mcap.decode_cdr_messages`, :func:`~.mcap.extract_mcap_topics`
work on this module's output unchanged).

One real difference from MCAP: ``.db3`` files do NOT embed message
definitions (rosbag2 resolves types against the locally installed
interface packages at play time). The reader therefore takes a
``definitions`` mapping (type name → ``ros2msg`` definition text, e.g.
``{"geometry_msgs/msg/Point": "float64 x\\n..."}``); without it the
``message_definition`` column is NULL and the topic extractor's
existing NULL-definition guard fires loudly rather than misparse.
"""

from __future__ import annotations

import sqlite3
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DB3_MESSAGE_SCHEMA = T.StructType([
    T.StructField("db3_file", T.StringType()),
    T.StructField("topic", T.StringType()),
    T.StructField("schema_name", T.StringType()),
    T.StructField("schema_encoding", T.StringType()),
    T.StructField("message_encoding", T.StringType()),
    T.StructField("message_definition", T.StringType()),
    T.StructField("sequence", T.LongType()),
    T.StructField("log_time_ns", T.LongType()),
    T.StructField("publish_time_ns", T.LongType()),
    T.StructField("data", T.BinaryType()),
])

_DB3_MAGIC = b"SQLite format 3\x00"


def parse_db3_bytes(db3_file: str, buf: bytes,
                    definitions: dict[str, str] | None = None,
                    message_compression: str | None = None,
                    ) -> Iterator[tuple]:
    """Yield DB3_MESSAGE_SCHEMA tuples from one in-memory ``.db3``
    image. ``definitions`` maps the ``topics.type`` name (or, as a
    fallback, the topic name) to its ``ros2msg`` definition text;
    unmapped types yield NULL ``message_definition``.

    rosbag2 stores ONE timestamp per message (the receive time), so
    ``log_time_ns`` and ``publish_time_ns`` are both that value —
    documented, not a guess; MCAP twins built from the same recording
    agree on ``log_time_ns``.

    ``message_compression='zstd'`` decompresses each payload blob
    (rosbag2 ``compression_mode: message`` recordings, r12 — the
    sidecar reader :func:`~.rosbag2.read_rosbag2` passes it from
    metadata.yaml); both it and the file-level ``.db3.zstd`` sniff
    below decode builtin via :mod:`..functions.zstd` (RFC 8878,
    r14 — the optional ``zstandard`` package accelerates when
    installed)."""
    from ..functions.zstd import decompress as _zstd

    if message_compression not in (None, "zstd"):
        raise NotImplementedError(
            f"{db3_file}: message_compression {message_compression!r} "
            f"is not supported (builtin: None or 'zstd')")
    blob_dec = _zstd if message_compression == "zstd" else None
    if buf[:4] == b"\x28\xb5\x2f\xfd":
        # rosbag2's file-level compression ships .db3.zstd images
        # (compression_format: zstd in metadata.yaml)
        try:
            buf = _zstd(bytes(buf), max_output=1 << 31)
        except Exception as e:  # noqa: BLE001 — normalize onto the
            # reader contract's input-error set so on_error='skip'
            # salvage fires instead of killing the task (r12 review)
            raise ValueError(f"{db3_file}: zstd image: {e}") from e
    if buf[:len(_DB3_MAGIC)] != _DB3_MAGIC:
        raise ValueError(f"{db3_file}: not a sqlite3 database")
    defs = definitions or {}
    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(bytes(buf))
        topics: dict[int, tuple[str, str, str]] = {}
        for tid, name, typ, ser in con.execute(
                "SELECT id, name, type, serialization_format "
                "FROM topics"):
            topics[tid] = (name, typ, ser)
        # ordered walk: messages.id is the insert order — the db3
        # counterpart of MCAP's per-channel sequence counter
        for mid, tid, ts, data in con.execute(
                "SELECT id, topic_id, timestamp, data FROM messages "
                "ORDER BY id"):
            name, typ, ser = topics.get(tid, ("", "", ""))
            defn = defs.get(typ) or defs.get(name)
            payload = bytes(data) if data is not None else b""
            if blob_dec is not None and payload:
                try:
                    payload = blob_dec(payload, max_output=1 << 31)
                except Exception as e:  # noqa: BLE001 — ZstdError is
                    # not in the salvage input-error set; normalize
                    # so one corrupt blob quarantines, not kills
                    raise ValueError(
                        f"{db3_file}: zstd message blob: {e}") from e
            yield (db3_file, name, typ,
                   "ros2msg" if defn is not None else "",
                   ser, defn, mid, ts, ts, payload)
    except sqlite3.Error as e:
        # normalize sqlite's own error family onto the reader
        # contract's input-error set so on_error='skip' salvage and
        # loud 'fail' behave exactly like the bag/MCAP readers
        raise ValueError(f"{db3_file}: {e}") from e
    finally:
        con.close()


def read_db3_messages(spark: SparkSession, path: str,
                      glob: str = "*.db3",
                      definitions: dict[str, str] | None = None,
                      on_error: str = "fail") -> DataFrame:
    """Long message table for every message in every ``.db3`` file
    under ``path`` — columns match :data:`~.mcap.MCAP_MESSAGE_SCHEMA`
    except the file column is ``db3_file``, so
    :func:`~.mcap.decode_cdr_messages` and
    :func:`~.mcap.extract_mcap_topics` consume it unchanged. Same
    ``on_error`` salvage contract as the bag/MCAP readers
    (``'skip'`` keeps every message read before a corruption point,
    drops the rest of that file only, and emits one ``error`` row)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))
    return db3_messages_frame(files, definitions=definitions,
                              on_error=on_error)


def db3_messages_frame(files: DataFrame,
                       definitions: dict[str, str] | None = None,
                       on_error: str = "fail",
                       message_compression: str | None = None,
                       ) -> DataFrame:
    """The extraction transform behind :func:`read_db3_messages`,
    usable over ANY ``(path, content)`` frame — including a streaming
    ``binaryFile`` micro-batch. ``definitions`` is broadcast with the
    task closure (it is a model-sized dict of .msg texts, not data)."""
    if on_error not in ("fail", "skip"):
        raise ValueError(
            f"on_error must be 'fail' or 'skip', got {on_error!r}")
    files = files.select("path", "content")
    out_schema = DB3_MESSAGE_SCHEMA
    if on_error == "skip":
        out_schema = T.StructType(
            list(DB3_MESSAGE_SCHEMA.fields)
            + [T.StructField("error", T.StringType())])
    defs = dict(definitions or {})
    input_errors = (ValueError, KeyError, IndexError, EOFError,
                    struct.error, OSError, NotImplementedError)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        skip = on_error == "skip"
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                name = fpath.rsplit("/", 1)[-1]
                rows: list[tuple] = []
                try:
                    for row in parse_db3_bytes(name, bytes(content),
                                               defs,
                                               message_compression):
                        rows.append(row + (None,) if skip else row)
                except input_errors as e:
                    if not skip:
                        raise
                    rows.append((name,) + (None,) * 9
                                + (f"{type(e).__name__}: {e}",))
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(extract, out_schema)


def db3_topic_metadata(messages: DataFrame) -> DataFrame:
    """Per-(file, topic) stats — the ``.db3`` face of
    :func:`~.rosbag.topic_metadata` / :func:`~.mcap.mcap_topic_metadata`
    (the reference's DynamoDB metadata item, service/app/main.py:61-74),
    same output columns with ``db3_file`` as the file key.
    ``frequency_hz`` is NULL for single-message topics (zero time
    span — a rate is undefined, same convention as the MCAP twin)."""
    span_s = (F.max("log_time_ns") - F.min("log_time_ns")) / 1e9
    return (messages
            .where(F.col("topic").isNotNull())
            .groupBy("db3_file", "topic",
                     F.col("schema_name").alias("msg_type"))
            .agg(F.count(F.lit(1)).alias("message_count"),
                 (F.min("log_time_ns") / 1e9).alias("t_min"),
                 (F.max("log_time_ns") / 1e9).alias("t_max"),
                 F.when(span_s > 0,
                        (F.count(F.lit(1)) - 1) / span_s)
                 .alias("frequency_hz")))
