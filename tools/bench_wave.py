#!/usr/bin/env python
"""Spark-side wall-time for a list of registry queries at a given SF.

Unlike bench.py (the fixed headline suite) this times ANY registry
subset — used to pin the cost of a new operator wave at sf0.1 before it
ships. Forces full execution with the noop sink; prints one
``name: cold warm`` line per query (warm = second run, same session).

Usage: python tools/bench_wave.py [--json out.json]
       [--baseline prev.json] [sf_dir] query [...]

``--json PATH`` additionally writes ``{"sf_dir":..., "queries":
{name: {"cold": s, "warm": s}}, "total_cold": s, "total_warm": s}`` —
the per-wave perf-tracking artifact (BENCHWAVE_r*.json).

``--baseline PREV`` compares each warm time against the same query in a
previous artifact; any row >1.3x its baseline warm is automatically
re-run SOLO after the suite finishes (two more executions, min taken)
and both numbers land in the artifact (``solo_warm``,
``baseline_warm``).  This makes in-suite interference (GC pauses, JIT
warmup ordering) self-adjudicating: a row that is slow in-suite but
fine solo is machine-recorded as such instead of being argued in prose
(VERDICT r8 task 4, the ml_centroid_embeddings case).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    args = sys.argv[1:]
    json_out = baseline_path = None
    while args and args[0] in ("--json", "--baseline"):
        if args[0] == "--json":
            json_out = args[1]
        else:
            baseline_path = args[1]
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
        times = [_timed(fn, spark, sf_dir) for _ in range(2)]
        per_query[name] = {"cold": round(times[0], 3),
                           "warm": round(times[1], 3)}
        total_cold += times[0]
        total_warm += times[1]
        print(f"{name}: cold {times[0]:.2f}s warm {times[1]:.2f}s",
              flush=True)
    print(f"TOTAL: cold {total_cold:.2f}s warm {total_warm:.2f}s")
    if baseline_path:
        with open(baseline_path) as fh:
            base = json.load(fh).get("queries", {})
        flagged = [n for n in names
                   if n in base and base[n].get("warm", 0) > 0
                   and per_query[n]["warm"] > 1.3 * base[n]["warm"]]
        for name in flagged:
            # solo re-run at the END of the suite: same session, but no
            # interleaved queries — two executions, min taken, so a GC
            # pause can't condemn the rerun either
            solo = min(
                _timed(qs[name], spark, sf_dir) for _ in range(2))
            per_query[name]["baseline_warm"] = base[name]["warm"]
            per_query[name]["solo_warm"] = round(solo, 3)
            verdict = ("suite-interference"
                       if solo <= 1.3 * base[name]["warm"]
                       else "real-regression")
            per_query[name]["solo_verdict"] = verdict
            print(f"SOLO {name}: suite {per_query[name]['warm']:.2f}s "
                  f"baseline {base[name]['warm']:.2f}s "
                  f"solo {solo:.2f}s -> {verdict}", flush=True)
        if not flagged:
            print("SOLO: no rows >1.3x baseline warm")
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
