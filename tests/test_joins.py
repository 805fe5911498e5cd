"""salted_join must be observationally identical to the plain equi-join
(SURVEY §8 beyond-reference: skew mitigation). Includes a hot key, an
unmatched probe key, an unmatched build key, and null salt_by values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import salted_join


@pytest.fixture(scope="module")
def sides(spark):
    # key 1 is hot (60 rows); key 99 matches nothing on the build side
    probe = spark.createDataFrame(
        [(1, i, f"p{i}" if i % 3 else None) for i in range(60)]
        + [(2, 100, "x"), (3, 101, "y"), (99, 102, "z")],
        "k int, rid int, tag string")
    build = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "cold"), (7, "unmatched")],
        "k int, label string")
    return probe, build


def _rows(df):
    return sorted((r.k, r.rid, r.tag, r.label) for r in df.collect())


def test_salted_inner_matches_plain(sides):
    probe, build = sides
    plain = probe.join(build, ["k"], "inner")
    salted = salted_join(probe, build, ["k"], salt_by="rid", salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted) == _rows(plain)


def test_salted_left_matches_plain(sides):
    probe, build = sides
    plain = probe.join(build, ["k"], "left")
    salted = salted_join(probe, build, ["k"], salt_by="rid",
                         how="left", salt=8)
    assert _rows(salted) == _rows(plain)


def test_salted_null_salt_by_keeps_rows(sides):
    probe, build = sides
    # tag is null on every 3rd row — salting on a nullable column must
    # not drop matches
    plain = probe.join(build, ["k"], "inner")
    salted = salted_join(probe, build, ["k"], salt_by="tag", salt=8)
    assert _rows(salted) == _rows(plain)


def test_salted_spreads_hot_key(sides):
    probe, build = sides
    p = salted_join(probe, build, ["k"], salt_by="rid", salt=8)
    # the salt must actually distribute the hot key's rows: reconstruct
    # the salt values used for k=1 and require more than one bucket
    salts = (probe.where("k = 1")
             .select(F.pmod(F.xxhash64(F.coalesce(F.col("rid").cast("string"),
                                                  F.lit(""))), F.lit(8))
                     .alias("s")).distinct().count())
    assert salts > 1
    assert p.where("k = 1").count() == 60


def test_salted_rejects_right_join(sides):
    probe, build = sides
    with pytest.raises(ValueError):
        salted_join(probe, build, ["k"], salt_by="rid", how="right")


def test_binned_interval_join_matches_plain_predicate(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import binned_interval_join
    import random
    rng = random.Random(3)
    pts = spark.createDataFrame(
        [(i, float(rng.randint(0, 1000))) for i in range(300)],
        "pid long, t double")
    ivs = spark.createDataFrame(
        [(j, s, s + float(rng.randint(0, 120)))
         for j, s in ((j, float(rng.randint(-50, 1000))) for j in range(40))],
        "iid long, s double, e double")
    plain = pts.join(ivs, (pts.t >= ivs.s) & (pts.t <= ivs.e))
    expected = {(r.pid, r.iid) for r in plain.collect()}
    for width in (7, 50, 500):   # widths below/at/above interval lengths
        got = {(r.pid, r.iid) for r in binned_interval_join(
            pts, ivs, "t", "s", "e", bin_width=width).collect()}
        assert got == expected, f"width={width}"
    # left join keeps pointless points with null interval cols
    left = binned_interval_join(pts, ivs, "t", "s", "e",
                                bin_width=50, how="left")
    matched = {r.pid for r in left.where(F.col("iid").isNotNull()).collect()}
    assert matched == {p for p, _ in expected}
    assert left.where(F.col("iid").isNull()).count() == \
        pts.count() - len({p for p, _ in expected} )


def test_salted_join_measured_skew_spread(spark):
    """Measured evidence for the salting rationale (not just semantics):
    with a hot key carrying ~85% of the probe rows and the build side
    too big to broadcast (forced off), the plain shuffle join lands the
    hot key's entire output on ONE reducer partition, while the salted
    join spreads it across ~salt partitions. Partition row counts are
    the deterministic cause of task-time spread (wall-clock itself is
    ±30% box noise, so we pin the distribution, not the clock)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import salted_join
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans import formatted_plan

    n_hot, n_cold, n_keys = 50_000, 500, 20
    probe = spark.range(n_hot).select(
        F.lit(0).alias("k"), F.col("id").alias("rid")).unionAll(
        spark.range(n_cold * (n_keys - 1)).select(
            (F.col("id") % (n_keys - 1) + 1).cast("int").alias("k"),
            (F.col("id") + n_hot).alias("rid")))
    build = spark.range(n_keys).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("label_"), F.col("id")).alias("label"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's small-partition coalescing would merge this test-sized
    # output into one partition and hide the reducer layout; at real
    # scale the hot partition is far above the coalesce target anyway
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        plain = probe.join(build, ["k"])
        salted = salted_join(probe, build, ["k"], salt_by="rid", salt=16)
        assert plain.count() == salted.count() == n_hot + n_cold * (n_keys - 1)

        # plan pin: the salted join's equi-keys include the salt column
        assert "_salt" in formatted_plan(salted)
        assert "_salt" not in formatted_plan(plain)

        def partition_shares(df):
            sizes = [r.cnt for r in
                     df.withColumn("_pid", F.spark_partition_id())
                       .groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt"))
                       .collect()]
            total = sum(sizes)
            return max(sizes) / total, len(sizes)

        plain_max, _ = partition_shares(plain)
        salted_max, salted_parts = partition_shares(salted)
        # plain: the hot key (~84% of rows) is one reducer's task
        assert plain_max >= 0.8
        # salted: no reducer holds more than ~2/salt of the rows
        assert salted_max <= 0.25
        assert salted_parts > 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       prev_coalesce)
