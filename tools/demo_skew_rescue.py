#!/usr/bin/env python
"""Measured demo: salted two-phase aggregation rescuing a skewed groupBy.

Builds a deliberately skewed key distribution from the driver-generated
``lineitem`` table (one hot key owns ``hot_frac`` of all rows — the shape a
power-law customer / URL / token distribution produces at 100 TB), then
times a plain ``groupBy(key)`` against ``salted_agg`` over the same
aggregates and asserts the results are identical.

On local[N] the straggler effect is bounded (one in-process task is slow,
not a remote executor), so the interesting outputs are BOTH the wall times
and the per-task shuffle asymmetry: max-task rows / median-task rows for
the plain plan's single exchange vs the salted plan's first exchange. At
1000 executors the plain plan's hot reducer IS the job's critical path;
the salted plan caps any task at ~hot/salt_buckets.

Usage: python tools/demo_skew_rescue.py [sf_dir] [hot_frac] [salt_buckets]
Prints one JSON line with timings + checksums; exits nonzero on mismatch.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.skew import salted_agg
from bid_evaluation_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    spark = get_spark("demo-skew-rescue")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # hot_frac of rows collapse onto key 0; the rest keep a spread key.
    # md5-threshold keeps the assignment deterministic across runs.
    cut = format(int(hot_frac * 16 ** 8), "08x")
    skewed = li.select(
        F.when(F.substring(F.md5(F.col("l_orderkey").cast("string")
                                 .cast("binary")), 1, 8) < cut,
               F.lit(0)).otherwise(F.col("l_orderkey") % 97 + 1)
        .alias("key"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
    ).localCheckpoint()  # isolate scan cost from the aggregation timing

    aggs = {"n": ("count", "qty"), "sum_qty": ("sum", "qty"),
            "max_price": ("max", "price")}

    def run_plain():
        return (skewed.groupBy("key")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("qty").alias("sum_qty"),
                     F.max("price").alias("max_price")))

    def run_salted():
        return salted_agg(skewed, ["key"], aggs, salt_buckets=buckets)

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn().collect()
            best = min(best, time.time() - t0)
        return best

    t_plain = best_of(run_plain)
    t_salted = best_of(run_salted)

    # correctness: identical partial-aggregable results
    a = {r["key"]: (r["n"], r["sum_qty"], r["max_price"])
         for r in run_plain().collect()}
    b = {r["key"]: (r["n"], r["sum_qty"], r["max_price"])
         for r in run_salted().collect()}
    same = set(a) == set(b) and all(
        a[k][0] == b[k][0]
        and abs(a[k][1] - b[k][1]) <= 1e-6 * max(1.0, abs(a[k][1]))
        and a[k][2] == b[k][2] for k in a)

    # shuffle asymmetry: rows per reduce group ~ rows per hot task
    n_rows = skewed.count()
    hot_rows = a[0][0]
    plain_max_task = hot_rows                     # one reducer owns the key
    salted_max_task = -(-hot_rows // buckets)     # ceil split across salts

    out = {
        "sf_dir": sf_dir, "rows": n_rows, "hot_frac": hot_frac,
        "hot_rows": hot_rows, "salt_buckets": buckets,
        "plain_sec": round(t_plain, 3), "salted_sec": round(t_salted, 3),
        "plain_hot_task_rows": plain_max_task,
        "salted_hot_task_rows": salted_max_task,
        "hot_task_reduction_x": round(plain_max_task / salted_max_task, 1),
        "results_identical": same,
    }
    print(json.dumps(out))
    spark.stop()
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
