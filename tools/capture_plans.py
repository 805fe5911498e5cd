"""Capture ``.explain("formatted")`` for every ``__spark_entry__.queries()``
entry into ``plans/<tag>/<query>_<suffix>.txt``.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]

e.g. ``python tools/capture_plans.py r14 before`` dumps
``plans/r14/q_tfidf_before.txt`` etc. ``explain`` runs the analyzer and
optimizer but does not execute the plan, so this is cheap — though query
builders that run eager side work (index builds, stream snapshots) still
pay that work once.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    import __spark_entry__ as entry
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.session import (
        get_spark,
    )

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {time.time() - t0:.1f}s -> {path}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
