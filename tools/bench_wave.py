#!/usr/bin/env python
"""Spark-side wall-time for a list of registry queries at a given SF.

Unlike bench.py (the fixed headline suite) this times ANY registry
subset — used to pin the cost of a new operator wave at sf0.1 before it
ships. Forces full execution with the noop sink; prints one
``name: cold warm`` line per query (warm = second run, same session).

Usage: python tools/bench_wave.py [--json out.json] [sf_dir] query [...]

``--json PATH`` additionally writes ``{"sf_dir":..., "queries":
{name: {"cold": s, "warm": s}}, "total_cold": s, "total_warm": s}`` —
the per-wave perf-tracking artifact (BENCHWAVE_r*.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    import __spark_entry__ as entry
    from bid_evaluation_spark.session import get_spark

    spark = get_spark("bench-wave")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    per_query = {}
    total_cold = total_warm = 0.0
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        per_query[name] = {"cold": round(times[0], 3),
                           "warm": round(times[1], 3)}
        total_cold += times[0]
        total_warm += times[1]
        print(f"{name}: cold {times[0]:.2f}s warm {times[1]:.2f}s",
              flush=True)
    print(f"TOTAL: cold {total_cold:.2f}s warm {total_warm:.2f}s")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir,
                       "queries": per_query,
                       "total_cold": round(total_cold, 3),
                       "total_warm": round(total_warm, 3)}, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
