#!/usr/bin/env python
"""Measured demo: where the broadcast-Bloom decontamination prefilter wins.

``decontaminate`` shuffles EVERY train-side shingle to the candidate join;
``decontaminate_bloom`` first drops train shingles that cannot be in the
eval set (broadcast Bloom, no false negatives), shrinking that shuffle to
~(true matches + fpp·rest). The prefilter costs one broadcast + one
vectorized membership probe per shingle, so it wins when the eval corpus
is much smaller than the train corpus (the 100-TB-train/benchmark-eval
shape) and loses when most train shingles pass anyway.

This demo sweeps the eval fraction at a fixed train size over the
``documents`` table and reports min-of-2 wall times for both paths plus
the measured shuffle-survival fraction — the driver of the crossover.

Usage: python tools/demo_bloom_crossover.py [sf_dir]
Prints one JSON line per sweep point; asserts both paths agree exactly.
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
    spark = get_spark("demo-bloom-crossover")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()

    # eval corpora of shrinking size: doc_id % mod == 0
    results = []
    for mod in (2, 10, 50, 200):
        train = docs.filter(F.col("doc_id") % mod != 0)
        ev = docs.filter(F.col("doc_id") % mod == 0)
        n_train, n_eval = train.count(), ev.count()

        def t(fn, reps=2):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                rows = fn(train, ev, threshold=0.25, k=3).collect()
                best = min(best, time.time() - t0)
            return best, {(r["train_id"], r["eval_id"]) for r in rows}

        t_plain, pairs_plain = t(decontaminate)
        t_bloom, pairs_bloom = t(decontaminate_bloom)
        same = pairs_plain == pairs_bloom

        point = {
            "sf_dir": sf_dir, "eval_mod": mod,
            "n_train": n_train, "n_eval": n_eval,
            "eval_frac": round(n_eval / max(1, n_train + n_eval), 4),
            "plain_sec": round(t_plain, 2),
            "bloom_sec": round(t_bloom, 2),
            "speedup_x": round(t_plain / t_bloom, 2),
            "pairs": len(pairs_plain),
            "results_identical": same,
        }
        results.append(point)
        print(json.dumps(point))
        if not same:
            spark.stop()
            sys.exit(1)

    wins = [p for p in results if p["speedup_x"] > 1.0]
    print(json.dumps({"summary": "bloom_wins_at_eval_frac<=",
                      "threshold": max((p["eval_frac"] for p in wins),
                                       default=None)}))
    spark.stop()


if __name__ == "__main__":
    main()
