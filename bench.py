"""Benchmark harness: run every ``__spark_entry__.queries()`` entry at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "total_query_time", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...},
     "queries_p50": {...}, "queries_last": {...}, "value_last": M,
     "warmup_sec": W, "runs": 2, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` sink (full computation,
no serialization to disk, no driver collect) so the measured time is the
Spark plan's, not the harness's.

Round-over-round attribution: ``queries``/``value`` stay the min across
runs (steady state, the comparable headline), ``queries_p50`` is the
median of the same runs (captures first-run codegen/broadcast cost and
run variance), ``queries_last``/``value_last`` is the final run alone
(what a single-run harness like the driver's BENCH_r{N} records — docs
must cite whichever committed number they mean), and ``warmup_sec`` is
the one-time session bring-up that is deliberately OUTSIDE every query
timing — so a regression shows up in exactly one field instead of
smearing across all of them.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # the artifact path is run-scoped BY DEFAULT (bench_out.last.json,
    # gitignored): the committed bench_out.json records a min-of-N from
    # ISOLATED runs and is only updated deliberately via
    # `python bench.py --out bench_out.json` — a driver/CI invocation
    # with no args can therefore never clobber the committed numbers
    # (r5 finding: the driver's single run overwrote the artifact).
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", "bench_out.last.json"))
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.session import get_spark

    spark = get_spark("bench")  # master local[$SPARK_GRAFT_CPUS] inside
    spark.sparkContext.setLogLevel("ERROR")

    # session warm-up: JVM/scheduler bring-up and the noop sink's first
    # codegen are not any query's cost
    t0 = time.time()
    spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count() \
        .write.format("noop").mode("overwrite").save()
    warmup = round(time.time() - t0, 3)

    # min of 2 runs per query: run 1 pays one-time codegen/broadcast
    # build; run 2 is the steady state a long-running job sees, and the
    # min is robust to transient background load on a shared box
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    qs = entry.queries()
    timings: dict[str, float] = {}
    p50s: dict[str, float] = {}
    lasts: dict[str, float] = {}
    for name, fn in qs.items():
        samples: list[float] = []
        try:
            for _ in range(runs):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            timings[name] = round(min(samples), 3)
            p50s[name] = round(statistics.median(samples), 3)
            lasts[name] = round(samples[-1], 3)
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"bench error in {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            timings[name] = -1.0
            p50s[name] = -1.0
            lasts[name] = -1.0
        # the dedup pair operators persist() their signature relation and
        # document that the CALLER owns the cache lifetime (dedup.py:24-29);
        # leaked cache from earlier queries skews later measurements
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_last = round(sum(t for t in lasts.values() if t >= 0), 3)
    full = json.dumps({"metric": "total_query_time", "value": total,
                       "unit": "sec", "queries": timings,
                       "queries_p50": p50s, "queries_last": lasts,
                       "value_last": total_last, "warmup_sec": warmup,
                       "runs": runs, "sf": sf})
    # The stdout line carries ONLY the spec-required fields: r3's
    # artifact had parsed:null because the harness keeps a bounded tail
    # of output and the 59-query × two-dict line was cut mid-JSON. The
    # compact line is ~half the size; the per-query medians and warmup
    # live in the --out artifact alongside a copy of everything.
    compact = json.dumps({"metric": "total_query_time", "value": total,
                          "unit": "sec", "queries": timings, "sf": sf},
                         separators=(",", ":"))
    # stop Spark BEFORE printing so no stray executor/log output can
    # interleave with the metric line (r2's BENCH json had parsed:null
    # because progress-bar writes truncated it); also persist a copy.
    spark.stop()
    out_path = args.out
    if not os.path.isabs(out_path):
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                out_path)
    with open(out_path, "w") as f:
        f.write(full + "\n")
    sys.stdout.flush()
    print(compact, flush=True)


if __name__ == "__main__":
    main()
