#!/usr/bin/env python
"""Spark-side wall-time for a list of registry queries at a given SF.

Unlike bench.py (the fixed headline suite) this times ANY registry
subset — used to pin the cost of a new operator wave at sf0.1 before it
ships. Forces full execution with the noop sink; prints one
``name: cold warm`` line per query (warm = second run, same session).

Usage: python tools/bench_wave.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    import __spark_entry__ as entry
    from bid_evaluation_spark.session import get_spark

    spark = get_spark("bench-wave")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    total_cold = total_warm = 0.0
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        total_cold += times[0]
        total_warm += times[1]
        print(f"{name}: cold {times[0]:.2f}s warm {times[1]:.2f}s",
              flush=True)
    print(f"TOTAL: cold {total_cold:.2f}s warm {total_warm:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
