#!/usr/bin/env python
"""Regenerate tests/slow_manifest.txt from pytest --durations output.

Usage:
  1. Run the suite (sharded is fine) with per-test durations:
       python -m pytest -q -m "slow or not slow" --durations=0 \
           --durations-min=0.05 tests/ > /tmp/durations.log
  2. python tools/gen_slow_manifest.py [threshold_sec] /tmp/durations.log...

A test's recorded time is the sum of its setup+call+teardown entries;
tests at or above the threshold (default 2.5 s) are listed. Plain
``pytest`` excludes them (pyproject addopts ``-m 'not slow'``);
``tools/run_tests_parallel.py`` runs everything.
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

_LINE = re.compile(r"\s*([\d.]+)s\s+(?:call|setup|teardown)\s+(\S+)")


def main() -> int:
    args = sys.argv[1:]
    thr = 2.5
    if args and re.fullmatch(r"[\d.]+", args[0]):
        thr, args = float(args[0]), args[1:]
    if not args:
        print(__doc__)
        return 2
    per_test: dict[str, float] = defaultdict(float)
    for path in args:
        with open(path) as fh:
            for line in fh:
                m = _LINE.match(line)
                if m:
                    per_test[m.group(2)] += float(m.group(1))
    sel = sorted(t for t, v in per_test.items() if v >= thr)
    with open("tests/slow_manifest.txt", "w") as fh:
        fh.write("# Tests marked `slow` (excluded from plain `pytest`; "
                 "the full\n# battery runs via tools/run_tests_parallel"
                 ".py). Generated from\n# measured durations (setup+call"
                 f"+teardown >= {thr}s); regenerate with\n"
                 "# `pytest --durations=0` and tools/gen_slow_manifest"
                 ".py.\n")
        for t in sel:
            fh.write(t + "\n")
    excl = sum(v for v in per_test.values() if v >= thr)
    kept = sum(v for v in per_test.values() if v < thr)
    print(f"marked {len(sel)} tests >= {thr}s "
          f"(excluded {excl:.0f}s, kept {kept:.0f}s recorded)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
