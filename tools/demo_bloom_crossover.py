#!/usr/bin/env python
"""Measured demo: where the broadcast-Bloom decontamination prefilter wins.

``decontaminate`` shuffles EVERY train-side shingle into the candidate
join; ``decontaminate_bloom`` drops train shingles that cannot be in the
eval set first (broadcast Bloom — no false negatives, exact results), so
it trades a fixed CPU cost (filter build + one Arrow probe pass) for
shuffle volume. Two measured regimes:

1. ``local-default`` — the sf0.1 corpus as-is. EXPECTED NEGATIVE: the
   eval token side is small enough that Spark broadcasts it, so the
   exact path has no train-side exchange to shrink, and the synthetic
   train/eval split shares most shingles (keep-rate far above fpp). The
   prefilter's fixed cost buys nothing. This regime is kept in the demo
   deliberately — it is the measurement that says "do NOT reach for the
   Bloom variant at benchmark scale".

2. ``scale-shape`` — the deployment profile the operator exists for,
   reproduced locally: the train side amplified with distinct ids, the
   broadcast threshold disabled (at 100 TB the eval token side exceeds
   it; every join shuffles), and the eval corpus made ~disjoint from
   train (uppercased text — real decontamination hits are rare). Here
   the probe kills almost every train shingle before the exchange and
   the bloom path must win; the demo records by how much.

Both regimes assert the two paths return identical pair sets.

Usage: python tools/demo_bloom_crossover.py [sf_dir] [train_amplify]
Prints one JSON line per point + a summary line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.pipeline import (
    decontaminate,
    decontaminate_bloom,
)
from bid_evaluation_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("demo-bloom-crossover")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()

    def amplified_train(mod):
        return (docs.filter(F.col("doc_id") % mod != 0)
                .crossJoin(spark.range(amplify).select(
                    F.col("id").alias("_rep")))
                .withColumn("doc_id",
                            F.col("doc_id") * amplify + F.col("_rep"))
                .drop("_rep").localCheckpoint())

    def timed(fn, train, ev, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            rows = fn(train, ev, threshold=0.25, k=3).collect()
            best = min(best, time.time() - t0)
        return best, {(r["train_id"], r["eval_id"]) for r in rows}

    def point(regime, mod, train, ev):
        n_train, n_eval = train.count(), ev.count()
        t_plain, pairs_plain = timed(decontaminate, train, ev)
        t_bloom, pairs_bloom = timed(decontaminate_bloom, train, ev)
        same = pairs_plain == pairs_bloom
        out = {"regime": regime, "eval_mod": mod,
               "n_train": n_train, "n_eval": n_eval,
               "plain_sec": round(t_plain, 2),
               "bloom_sec": round(t_bloom, 2),
               "bloom_speedup_x": round(t_plain / t_bloom, 2),
               "pairs": len(pairs_plain), "results_identical": same}
        print(json.dumps(out))
        return out, same

    all_same, results = True, []

    # regime 1: local default — bloom expected to LOSE (documented)
    for mod in (2, 50):
        train = amplified_train(mod)
        ev = docs.filter(F.col("doc_id") % mod == 0)
        out, same = point("local-default", mod, train, ev)
        results.append(out)
        all_same &= same

    # regime 2: scale shape — shuffling joins + ~disjoint eval corpus
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for mod in (10, 50):
            train = amplified_train(mod)
            ev = (docs.filter(F.col("doc_id") % mod == 0)
                  .withColumn("text", F.upper(F.col("text"))))
            out, same = point("scale-shape", mod, train, ev)
            results.append(out)
            all_same &= same
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    local = [r for r in results if r["regime"] == "local-default"]
    scale = [r for r in results if r["regime"] == "scale-shape"]
    print(json.dumps({
        "summary": {
            "local_default_bloom_speedup_x":
                [r["bloom_speedup_x"] for r in local],
            "scale_shape_bloom_speedup_x":
                [r["bloom_speedup_x"] for r in scale],
            "verdict": "bloom prefilter pays only in the asymmetric "
                       "low-overlap shuffle regime; at benchmark scale "
                       "the plain exact join wins",
        }}))
    spark.stop()
    sys.exit(0 if all_same else 1)


if __name__ == "__main__":
    main()
