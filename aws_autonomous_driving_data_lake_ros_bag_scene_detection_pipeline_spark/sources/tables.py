"""Parquet sources and sinks.

Replaces the reference's manifest-driven per-file loops
(synchronize_topics.py:44-75 ``load_file_path``/``load_and_union_data``:
one ``spark.read`` + union per file) with multi-path single reads so
Spark parallelizes listing and scan planning, and partition pruning /
predicate pushdown stay available to Catalyst.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated table (TESTDATA.md layout)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TPCH_TABLES) -> None:
    """Register temp views so queries can also be written in SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_topics(spark: SparkSession, topic_paths: dict[str, list[str]],
                base_path: str | None = None) -> dict[str, DataFrame]:
    """Read per-topic parquet datasets (reference: one dataset per ROS
    topic, hive-partitioned by ``bag_file=``; main.py:117-125).

    One multi-path read per topic — Spark unions the files natively and
    keeps partition columns when ``base_path`` is set
    (detect_scenes.py:152-159 does the same via ``basePath``).
    """
    out = {}
    for topic, paths in topic_paths.items():
        reader = spark.read
        if base_path:
            reader = reader.option("basePath", base_path)
        out[topic] = reader.parquet(*paths)
    return out


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """Schema-aligned n-ary union (SURVEY §2 #25).

    The reference hand-rolls a column-superset union with a latent
    null-fill bug (synchronize_topics.py:9-18); the intended semantics
    are exactly ``unionByName(allowMissingColumns=True)``.
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "append") -> None:
    """Partitioned parquet sink (SURVEY §2 #10; synchronize_topics.py:88-90).

    Hive layout (``bag_file=...``) keeps partition pruning available to
    downstream readers at any scale.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed + sorted catalog table — the co-located-join layout.

    At 100 TB the dominant repeated cost is re-shuffling a fact table
    for every join/aggregate on the same key. Writing it bucketed by
    that key (hash-partitioned into a fixed file layout, optionally
    sorted inside each bucket) lets every later equi-join or groupBy on
    the key run with NO exchange: Spark reads matching buckets
    pair-wise, and with sorted buckets the sort-merge join skips its
    sort too. Verified by plan assertion in
    tests/test_plans.py::test_bucketed_join_has_no_shuffle.

    Bucketing requires a catalog table (``saveAsTable``; plain
    ``.parquet(path)`` writes no bucket metadata) — the engine's
    catalog registration path (SURVEY §2 #12) already assumes one.
    Pick ``num_buckets`` so one bucket of the largest table fits an
    executor's scan batch (~128-512 MB); both sides of a co-located
    join must use the same bucket count and columns.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def add_lineage(df: DataFrame, **cols: str) -> DataFrame:
    """Tag lineage/literal columns (SURVEY §2 #15; synchronize_topics.py:47-49)."""
    for name, value in cols.items():
        df = df.withColumn(name, F.lit(value))
    return df
