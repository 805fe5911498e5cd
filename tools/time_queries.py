"""Targeted per-query timing: split each query into BUILD (the
``fn(spark, sf_dir)`` call — driver-side work, plus any eager actions the
builder runs) and EXEC (the noop write — Catalyst analysis of the final
plan + cluster execution), for the named queries.

Usage: python tools/time_queries.py [sf_dir] q_a q_b ...
       python tools/time_queries.py            # all queries

Prints one line per (query, run): build_s exec_s total_s. Run 1 pays
codegen; run 2 is the steady state the bench's min-of-2 reports.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    only = set(args)

    import __spark_entry__ as entry
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    from pyspark.sql import functions as F
    spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count() \
        .write.format("noop").mode("overwrite").save()

    qs = entry.queries()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    for name, fn in qs.items():
        if only and name not in only:
            continue
        for r in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            print(f"{name} run{r + 1}: build={t1 - t0:6.3f}s "
                  f"exec={t2 - t1:6.3f}s total={t2 - t0:6.3f}s", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
