#!/usr/bin/env python
"""Spark-side wall-time for a list of registry queries at a given SF.

Unlike bench.py (the fixed headline suite) this times ANY registry
subset — used to pin the cost of a new operator wave at sf0.1 before it
ships. Forces full execution with the noop sink; prints one
``name: cold warm`` line per query (warm = second run, same session).

Usage: python tools/bench_wave.py [--json out.json]
       [--baseline prev.json] [--calib-baseline SEC] [sf_dir] query [...]

``--json PATH`` additionally writes ``{"sf_dir":..., "queries":
{name: {"cold": s, "warm": s}}, "total_cold": s, "total_warm": s,
"calibration": {...}}`` — the per-wave perf-tracking artifact
(BENCHWAVE_r*.json).

SELF-ADJUDICATION (r10 verdict task 1). The box's idle speed has
measurably drifted 1.1–1.4x WITHIN a session (identical code measured
25→43 s across round 10), so raw warm-vs-baseline ratios can
manufacture regressions. This tool therefore:

1. times the same fixed 200M-row JVM aggregate bench.py uses
   (``calibration_sec_before/after``) and, given a baseline
   calibration (from the baseline artifact's ``calibration`` block or
   ``--calib-baseline``), computes ``calibration_ratio`` =
   this-box-speed / baseline-box-speed;
2. flags rows whose warm exceeds ``1.3 × baseline_warm ×
   calibration_ratio`` (the NORMALIZED threshold);
3. re-runs every flagged row SOLO immediately before writing the final
   JSON — with a fresh calibration right then (``solo_calibration_sec``,
   ``solo_ts``) so the verdict is judged against the box speed AT
   VERDICT TIME, not an earlier, faster box;
4. writes the FINAL per-row ``verdict`` into the artifact:
   ``suite-interference`` (solo fine even raw), ``box-drift`` (solo
   slow raw but fine after calibration deflation), or
   ``real-regression`` (slow even normalized). The artifact carries
   its own adjudication — prose never has to override it.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

_FLAG = 1.3                      # normalized warm-vs-baseline threshold


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _release_all():
    from bid_evaluation_spark.operators.cache import release_all
    release_all()


def main() -> int:
    args = sys.argv[1:]
    json_out = baseline_path = None
    calib_baseline = None
    while args and args[0] in ("--json", "--baseline", "--calib-baseline"):
        if args[0] == "--json":
            json_out = args[1]
        elif args[0] == "--baseline":
            baseline_path = args[1]
        else:
            calib_baseline = float(args[1])
        args = args[2:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    import __spark_entry__ as entry
    from bench import _calibrate
    from bid_evaluation_spark.session import get_spark

    spark = get_spark("bench-wave")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    _calibrate(spark)            # discarded: first JVM job pays JIT (~10x)
    calib_before = _calibrate(spark)
    per_query = {}
    total_cold = total_warm = 0.0
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(2):
            times.append(_timed(fn, spark, sf_dir))
            _release_all()
        per_query[name] = {"cold": round(times[0], 3),
                           "warm": round(times[1], 3)}
        total_cold += times[0]
        total_warm += times[1]
        print(f"{name}: cold {times[0]:.2f}s warm {times[1]:.2f}s",
              flush=True)
    calib_after = _calibrate(spark)
    print(f"TOTAL: cold {total_cold:.2f}s warm {total_warm:.2f}s")

    calibration = {"before": calib_before, "after": calib_after,
                   "job": "fixed 200M-row JVM aggregate (bench._calibrate)"}
    if baseline_path:
        with open(baseline_path) as fh:
            base_doc = json.load(fh)
        base = base_doc.get("queries", {})
        if calib_baseline is None:
            bc = base_doc.get("calibration", {})
            vals = [v for v in (bc.get("before"), bc.get("after"))
                    if isinstance(v, (int, float))]
            calib_baseline = min(vals) if vals else None
        ratio = (round(min(calib_before, calib_after)
                       / calib_baseline, 3)
                 if calib_baseline else None)
        calibration["baseline"] = calib_baseline
        calibration["ratio"] = ratio
        if ratio is None:
            print("CALIB: no baseline calibration — ratios are RAW "
                  "(pass --calib-baseline SEC to normalize)")
        else:
            print(f"CALIB: before {calib_before:.2f}s after "
                  f"{calib_after:.2f}s baseline {calib_baseline:.2f}s "
                  f"ratio {ratio:.3f}")
        # calibration DEFLATES apparent regressions on a slow box; it
        # must never demand speedups on a fast one (a faster-than-
        # anchor calibration job says nothing about scheduler-latency-
        # bound query walls) — clamp the normalizer at 1.0
        norm = max(ratio, 1.0) if ratio else 1.0
        flagged = []
        for n in names:
            bw = base.get(n, {}).get("warm", 0)
            if not bw:
                continue
            per_query[n]["baseline_warm"] = bw
            raw = round(per_query[n]["warm"] / bw, 3)
            per_query[n]["warm_ratio_raw"] = raw
            per_query[n]["warm_ratio_norm"] = round(raw / norm, 3)
            if per_query[n]["warm_ratio_norm"] > _FLAG:
                flagged.append(n)
        # solo adjudication happens LAST, immediately before the JSON is
        # written, with its own calibration — the verdict in the
        # artifact is judged against the box speed at verdict time
        if flagged:
            solo_calib = _calibrate(spark)
            solo_norm = (max(round(solo_calib / calib_baseline, 3),
                             1.0)
                         if calib_baseline else 1.0)
            for name in flagged:
                solos = []
                for _ in range(2):
                    solos.append(_timed(qs[name], spark, sf_dir))
                    _release_all()
                solo = min(solos)
                bw = per_query[name]["baseline_warm"]
                raw_ok = solo <= _FLAG * bw
                norm_ok = solo <= _FLAG * bw * solo_norm
                verdict = ("suite-interference" if raw_ok
                           else "box-drift" if norm_ok
                           else "real-regression")
                per_query[name].update({
                    "solo_warm": round(solo, 3),
                    "solo_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
                    "solo_calibration_sec": solo_calib,
                    "verdict": verdict,
                })
                print(f"SOLO {name}: suite {per_query[name]['warm']:.2f}s "
                      f"baseline {bw:.2f}s solo {solo:.2f}s "
                      f"(calib ratio {solo_norm}) -> {verdict}",
                      flush=True)
        else:
            print(f"SOLO: no rows >{_FLAG}x normalized baseline warm")
    if json_out:
        from bid_evaluation_spark.dispatch import force_distributed
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir,
                       # r12 verdict task 3: the artifact records whether
                       # this wave ran the forced distributed fallbacks
                       # (SPARK_GRAFT_FORCE_DISTRIBUTED=1 → every dual-
                       # engine dispatch takes its at-scale route)
                       "force_distributed": force_distributed(),
                       "queries": per_query,
                       "total_cold": round(total_cold, 3),
                       "total_warm": round(total_warm, 3),
                       "calibration": calibration}, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
