#!/usr/bin/env python
"""Measured skew-rescue demo: where salting helps Spark and where it doesn't.

Two experiments over driver-generated ``lineitem`` (amplified 8x, ~95 % of
rows collapsed onto one hot key — the power-law shape a customer / URL /
token distribution produces at 100 TB):

1. AGGREGATION (negative result, kept honest): for the algebraic
   aggregates ``salted_agg`` supports, a plain ``groupBy`` is already
   skew-immune — map-side partial aggregation collapses the hot key to ONE
   partial row per map task before the exchange — and the salt's second
   shuffle only adds cost. The demo measures both and expects plain to win.

2. JOIN (the real rescue): a shuffle equi-join hashes every probe row of
   the hot key to one reducer; partial aggregation cannot help. The demo
   measures the plain shuffle join with AQE skew-handling disabled (the
   straggler), ``salted_join`` under the same config, and the plain join
   with AQE re-enabled (Spark's own runtime rescue), with the broadcast
   threshold zeroed so the join actually shuffles (the build side is
   dimension-sized; at real scale it exceeds the broadcast limit).

Usage: python tools/demo_skew_rescue.py [sf_dir] [amplify] [salt_buckets]
Prints one JSON line; exits nonzero if any variant disagrees with plain.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.skew import salted_agg, salted_join
from bid_evaluation_spark.session import get_spark


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark("demo-skew-rescue")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # ~95 % of rows on key 0 (md5 threshold keeps it deterministic)
    big = (li.crossJoin(spark.range(amplify))
           .select(F.when(F.substring(
                       F.md5(F.col("l_orderkey").cast("string")
                             .cast("binary")), 1, 8) < "f3333333",
                   F.lit(0)).otherwise(F.col("l_orderkey") % 97 + 1)
                   .alias("key"),
                   F.col("l_quantity").cast("double").alias("qty"),
                   F.col("l_extendedprice").cast("double").alias("price"))
           .localCheckpoint())
    n_rows = big.count()
    hot_rows = big.filter(F.col("key") == 0).count()

    # --- 1. aggregation: plain already wins (partial agg eats the skew)
    aggs = {"n": ("count", "qty"), "sum_qty": ("sum", "qty"),
            "max_price": ("max", "price")}
    plain_agg = lambda: (big.groupBy("key")
                         .agg(F.count(F.lit(1)).alias("n"),
                              F.sum("qty").alias("sum_qty"),
                              F.max("price").alias("max_price")).collect())
    salt_agg = lambda: salted_agg(big, ["key"], aggs,
                                  salt_buckets=buckets).collect()
    t_plain_agg, t_salted_agg = best_of(plain_agg), best_of(salt_agg)
    agg_same = ({r["key"]: (r["n"], round(r["sum_qty"], 6), r["max_price"])
                 for r in plain_agg()}
                == {r["key"]: (r["n"], round(r["sum_qty"], 6),
                               r["max_price"])
                    for r in salt_agg()})

    # --- 2. join: the hot key's probe rows pile on one reducer
    small = (big.select("key").distinct()
             .withColumn("dim_payload", F.col("key") * 2 + 1)
             .localCheckpoint())

    def run_join(fn, aqe):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            return best_of(lambda: fn().count())
        finally:
            spark.conf.unset("spark.sql.adaptive.enabled")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    plain_join = lambda: big.join(small, ["key"], "inner")
    s_join = lambda: salted_join(big, small, ["key"],
                                 salt_buckets=buckets)
    t_plain_noaqe = run_join(plain_join, aqe=False)
    t_salted = run_join(s_join, aqe=False)
    t_plain_aqe = run_join(plain_join, aqe=True)
    join_same = (plain_join().count() == s_join().count() == n_rows)

    out = {
        "sf_dir": sf_dir, "rows": n_rows, "hot_rows": hot_rows,
        "hot_frac": round(hot_rows / n_rows, 3), "salt_buckets": buckets,
        "agg": {"plain_sec": t_plain_agg, "salted_sec": t_salted_agg,
                "verdict": "plain wins: partial agg already "
                           "collapses the hot key map-side",
                "identical": agg_same},
        "join": {"plain_noaqe_sec": t_plain_noaqe,
                 "salted_noaqe_sec": t_salted,
                 "plain_aqe_sec": t_plain_aqe,
                 "salted_speedup_vs_straggler_x":
                     round(t_plain_noaqe / t_salted, 2),
                 "hot_reducer_rows_plain": hot_rows,
                 "hot_reducer_rows_salted": -(-hot_rows // buckets),
                 "identical": join_same},
    }
    print(json.dumps(out))
    spark.stop()
    sys.exit(0 if (agg_same and join_same) else 1)


if __name__ == "__main__":
    main()
