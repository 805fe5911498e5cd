"""Cross-engine parity primitives the oracle checks depend on.

These pin the conventions used by every ``__spark_entry__.queries()`` /
``oracle_sql()`` pair:

- portable 64-bit hash: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
  DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT`` (60 bits, fits bigint);
- event time as integer microseconds: ``__spark_entry__._ts_us`` adapts
  to the parquet storage type (TIMESTAMP(NANOS)-as-bigint -> ``ts div
  1000``; TIMESTAMP(MICROS) timestamp_ntz -> ``unix_micros`` under a UTC
  session zone) == DuckDB ``epoch_us(ts)``;
- double aggregates compared after ``round(x, 2)``.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_md5_hash64_parity(spark, duck):
    vals = ["", "a", "hello shingle", "the quick brown fox", "ünïcode ✓"]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.expr("cast(conv(substring(md5(s),1,15),16,10) as bigint)").alias("h"))
    got = {r.s: r.h for r in sdf.collect()}
    for v in vals:
        d = duck.execute("select ('0x'||substring(md5(?),1,15))::BIGINT", [v]).fetchone()[0]
        assert got[v] == d, v


def test_event_ts_microseconds_parity(spark, duck):
    from __spark_entry__ import _ts_us
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    s = (ev.select("event_id", _ts_us(ev).alias("ts_us"))
         .orderBy("event_id").limit(50).collect())
    d = duck.sql(
        "select event_id, epoch_us(ts) from events order by event_id limit 50").fetchall()
    assert [(r.event_id, r.ts_us) for r in s] == d


def test_double_agg_round_parity(spark, duck):
    s = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
         .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("rev")).collect()[0].rev)
    d = duck.sql(
        "select round(sum(l_extendedprice*(1-l_discount)),2) from lineitem").fetchone()[0]
    assert s == d


def test_contract_fits_driver_gate_cap():
    """The correctness driver evaluates at most 50 queries() entries;
    anything past the cap never gets a hard verdict (the r3 tail
    problem). Every entry must also have an oracle, and the two maps
    must key identically."""
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    assert len(qs) <= 50, "contract outgrew the driver's 50-row gate cap"
    assert set(qs) == set(osql)
