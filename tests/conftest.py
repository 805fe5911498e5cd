"""Shared fixtures: one tuned local SparkSession per test run, a DuckDB
connection with the testdata tables registered, and helpers to compare a
Spark DataFrame against a DuckDB oracle result (the same comparison the
driver harness performs: row count + order-insensitive values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.session import get_spark

    # Hermetic warehouse: saveAsTable fails with LOCATION_ALREADY_EXISTS
    # when a killed prior session leaves ./spark-warehouse/<table> behind
    # (the test's `finally` drop never ran). A per-session tmp warehouse
    # means stale residue from any previous run can't poison this one.
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    spark = get_spark("tests", shuffle_partitions=8,
                      extra_conf={"spark.sql.warehouse.dir": str(warehouse)})
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def assert_df_matches_oracle(sdf, duck, sql, sort_cols=None):
    """Order-insensitive comparison of a Spark DF vs a DuckDB query."""
    spark_rows = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())
    duck_rows = sorted(tuple(_norm(v) for v in r) for r in duck.sql(sql).fetchall())
    assert len(spark_rows) == len(duck_rows), f"row count {len(spark_rows)} != {len(duck_rows)}"
    for i, (s, d) in enumerate(zip(spark_rows, duck_rows)):
        assert s == d, f"row {i}: spark={s} duck={d}"
