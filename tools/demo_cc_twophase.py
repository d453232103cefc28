#!/usr/bin/env python
"""A/B: min-label propagation vs large-star/small-star CC on graphs of
increasing DIAMETER — the variable that decides which engine survives
scale.

Label propagation moves the component minimum ONE HOP per round, so a
chain of length D costs D rounds (each a join + groupBy + checkpoint);
the Kiveris two-phase alternation contracts any component in O(log² n)
rounds regardless of diameter.  Banding graphs are shallow (stars —
label wins on constant factors); DBSCAN core grids and span chains get
LONGER as density grows, which is why dbscan() defaults to twophase.

Run: python tools/demo_cc_twophase.py [chain_len ...]
Writes nothing; prints one line per (engine, chain length).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from bid_evaluation_spark.operators.dedup import near_duplicate_clusters
from bid_evaluation_spark.session import get_spark


def main() -> int:
    lens = [int(a) for a in sys.argv[1:]] or [16, 64, 256]
    spark = get_spark("demo-cc-twophase")
    spark.sparkContext.setLogLevel("ERROR")
    print("engine    chain_len  rounds_bound  wall_s  clusters_ok")
    for n in lens:
        # one path graph: diameter = n; plus 1k shallow star components
        # (the banding shape) so both engines do mixed work
        pairs = [(i + 1, i) for i in range(n)]
        pairs += [(100_000 + 7 * s, 100_000 + 7 * s + j)
                  for s in range(1000) for j in range(1, 4)]
        df = spark.createDataFrame(pairs, "a_id long, b_id long")
        for alg, cap in (("label", n + 8), ("twophase", 64)):
            t0 = time.time()
            out = near_duplicate_clusters(df, max_iter=cap, algorithm=alg)
            rows = out.collect()
            wall = time.time() - t0
            chain_ok = all(r["cluster_id"] == 0
                           for r in rows if r["id"] <= n)
            print(f"{alg:9s} {n:9d} {cap:13d} {wall:7.2f}  {chain_ok}",
                  flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
