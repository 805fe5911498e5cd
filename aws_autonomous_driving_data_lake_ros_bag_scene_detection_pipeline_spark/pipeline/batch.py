"""Batch orchestration parity: manifest-driven runs + catalog registration.

The reference coordinates work through DynamoDB manifests (batch items
listing files/topics per bag; trigger.py:121-134, read back paginated at
synchronize_topics.py:29-41) and registers outputs with Glue crawlers
(ecs_stack.py:387-401, emr_orchestration/stack.py:272-289). Here the
manifest is a plain DataFrame-backed table and registration is the Spark
catalog — no external services, same semantics:

- :class:`BatchManifest`     : (batch_id, bag_file, topic, path) ledger
  with paginated-read parity (the reference's pagination is buggy —
  ``data.update`` on a list, synchronize_topics.py:39-40; here reads are
  just DataFrame scans, the *intended* semantics per SURVEY §4).
- :func:`run_sync_batch`     : end-to-end sync job for one batch id —
  read manifest → per-topic multi-path reads → synchronize → partitioned
  append write (entry point B, SURVEY §3.2).
- :func:`register_table`     : ``CREATE TABLE ... USING parquet`` over an
  output directory — the Glue-crawler replacement; partition discovery
  via ``MSCK REPAIR TABLE``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import write_partitioned
from .synchronize import synchronize_topics

MANIFEST_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType()),
    T.StructField("bag_file", T.StringType()),
    T.StructField("topic", T.StringType()),
    T.StructField("path", T.StringType()),
])


class BatchManifest:
    """File/topic ledger for batch runs, stored as a parquet table.

    The reference's DynamoDB items ``(BatchId, Name=bag_file, files,
    topics)`` (trigger.py:121-134) as rows; append-only like the
    reference's ``list_append``.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, rows: list[tuple[int, str, str, str]]) -> None:
        (self.spark.createDataFrame(rows, MANIFEST_SCHEMA)
         .coalesce(1).write.mode("append").parquet(self.path))

    def read(self, batch_id: int) -> DataFrame:
        """All entries of one batch — the reference's paginated Query on
        BatchId (synchronize_topics.py:29-41), as a pruned scan."""
        return (self.spark.read.parquet(self.path)
                .where(F.col("batch_id") == batch_id))

    def topics(self, batch_id: int) -> list[str]:
        return sorted(r.topic for r in
                      self.read(batch_id).select("topic").distinct().collect())

    def paths_by_topic(self, batch_id: int) -> dict[str, list[str]]:
        rows = (self.read(batch_id).select("topic", "path")
                .distinct().collect())
        out: dict[str, list[str]] = {}
        for r in rows:
            out.setdefault(r.topic, []).append(r.path)
        return out


def run_sync_batch(spark: SparkSession, manifest: BatchManifest,
                   batch_id: int, keys: list[str], time_col: str,
                   step: float, output_path: str,
                   as_json: bool = False) -> DataFrame:
    """One manifest-driven sync run (the reference's EMR step 1,
    synchronize_topics.py:207-223): per-topic multi-path reads → wide
    LOCF table → append write partitioned by the bag keys.

    Returns the written DataFrame (lazily re-readable from
    ``output_path``). One ``spark.read.parquet(*paths)`` per topic —
    Spark parallelizes listing; no per-file driver loop.
    """
    topic_dfs = {
        topic: spark.read.parquet(*paths)
        for topic, paths in manifest.paths_by_topic(batch_id).items()
    }
    wide = synchronize_topics(topic_dfs, keys, time_col=time_col, step=step,
                              as_json=as_json)
    write_partitioned(wide.withColumn("batch_id", F.lit(batch_id)),
                      output_path, keys)
    return wide


def register_table(spark: SparkSession, name: str, path: str,
                   partition_cols: list[str] | None = None) -> None:
    """Register a parquet output directory as a catalog table — the
    Glue-crawler replacement (SURVEY §2 #12). Partitioned layouts get
    ``MSCK REPAIR`` so hive-style dirs become visible partitions."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if partition_cols:
        df = spark.read.option("basePath", path).parquet(path)
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                         for f in df.schema.fields
                         if f.name not in partition_cols)
        parts = ", ".join(f"`{c}` string" for c in partition_cols)
        spark.sql(f"CREATE TABLE {name} ({cols}) USING parquet "
                  f"PARTITIONED BY ({parts}) LOCATION '{path}'")
        spark.sql(f"MSCK REPAIR TABLE {name}")
    else:
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{path}'")
