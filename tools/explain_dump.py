#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to plan files.

Usage: python tools/explain_dump.py OUT_DIR SUFFIX [sf_dir] query [...]

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` for each named registry query —
the before/after plan evidence for optimization rounds (judge-readable
without running Spark). Planning only; nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and "/" in rest[0]:
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    import __spark_entry__ as entry
    from bid_evaluation_spark.session import get_spark

    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = (plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython") + plan.count("MapInPandas")
                + plan.count("MapInArrow") + plan.count("FlatMapGroupsInPandas"))
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{n_exch} Exchange, {n_py} python nodes -> {path}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
