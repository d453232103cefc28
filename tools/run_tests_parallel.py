#!/usr/bin/env python
"""Run the test suite as N concurrent pytest shards (no pytest-xdist in the
container). Each test session builds one local[4] SparkSession, so on a
32-CPU box several shards run without oversubscribing.

Shards are greedy-packed by file size (a good-enough duration proxy: the
slow files are the big ones), largest first, so wall time approaches the
slowest single file instead of the serial sum.

Usage: python tools/run_tests_parallel.py [n_shards]   (default 4)
Exit status is non-zero if any shard fails; each shard's tail is printed.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    files = sorted(glob.glob("tests/test_*.py"),
                   key=lambda f: -os.path.getsize(f))
    shards: list[tuple[int, list[str]]] = [(0, []) for _ in range(n)]
    for f in files:
        size, members = min(shards, key=lambda s: s[0])
        idx = shards.index((size, members))
        shards[idx] = (size + os.path.getsize(f), members + [f])

    t0 = time.time()
    procs = []
    for i, (_, members) in enumerate(shards):
        if not members:
            continue
        log = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f"_shard{i}.log", delete=False)
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             # the FULL battery: override pyproject's `-m "not slow"`
             # (plain serial pytest runs the fast subset; this runner is
             # where the slow_manifest.txt tests stay exercised)
             "-m", "slow or not slow",
             *members],
            stdout=log, stderr=subprocess.STDOUT)
        procs.append((i, p, log, members))

    failed = False
    import re
    n_passed = n_failed = n_skipped = 0
    parsed_all = True
    for i, p, log, members in procs:
        rc = p.wait()
        log.flush()
        log.seek(0)
        lines = log.read().strip().splitlines()
        tail = lines[-3:]
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        # the pytest summary is not always the LAST line — a background
        # Spark thread (e.g. StateStoreCoordinator lag WARNs) can log
        # after it; scan backward for the first line that parses
        summary = next((ln for ln in reversed(lines[-25:])
                        if re.search(r"\d+ (passed|failed|skipped)", ln)),
                       tail[-1] if tail else "")
        print(f"shard {i} [{status}] ({len(members)} files): " + summary)
        got = {k: int(v) for v, k in
               re.findall(r"(\d+) (passed|failed|skipped)", summary)}
        if got:
            n_passed += got.get("passed", 0)
            n_failed += got.get("failed", 0)
            n_skipped += got.get("skipped", 0)
        else:
            parsed_all = False
        if rc != 0:
            failed = True
            print("\n".join(tail))
            print(f"  full log: {log.name}")
        log.close()
    # machine-printed suite total — close-out docs quote THIS line, never
    # a hand count (r6: 280-vs-279 drift; r7: a stale "872 passed")
    suffix = "" if parsed_all else " (PARTIAL: a shard summary didn't parse)"
    print(f"SUITE TOTAL: {n_passed} passed, {n_failed} failed, "
          f"{n_skipped} skipped in {time.time() - t0:.1f}s wall{suffix}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
