#!/usr/bin/env python
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row count, column names and (order-insensitively) values.

Usage: python tools/check_oracle.py [sf_dir] [--deep] [--family PREFIX]
       [query ...]

``--family PREFIX`` restricts the run to queries whose name starts with
PREFIX (e.g. ``--family dedup_`` or ``--family mm_``) — targeted slices
of the ~300-key registry without listing names.  Combinable with
explicit query names (union).

``--deep`` merges ``deep_queries()`` into the run set — the FULL-corpus
variants of the quadratic-ground-truth dedup queries (the registry runs
them on a doc_id-sampled sub-corpus so routine sweeps stay fast). Run
the deep gate once per round: ``python tools/check_oracle.py
/root/testdata/sf0.01 --deep dedup_minhash_candidates_documents_full
dedup_simhash_documents_full dedup_lsh_recall_documents_full`` (sf0.1
costs the full n² oracle — budget ~35 min).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry
from bid_evaluation_spark.session import get_spark
from bid_evaluation_spark.sources.io import TESTDATA_TABLES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEEP_STAMP = os.path.join(_REPO, "artifacts", "deep_gate_stamp.json")


def _git_head() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=_REPO,
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def _git_dirty() -> bool:
    # untracked files are ignored: the sweep's own in-progress output
    # artifact (ORACLE_*.txt) must not mark the verified tree dirty —
    # only modified TRACKED sources invalidate the header's HEAD claim
    try:
        out = subprocess.check_output(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=_REPO, stderr=subprocess.DEVNULL).decode()
        return bool(out.strip())
    except Exception:
        return False


def _stamp_deep_gate(names) -> None:
    """Record WHICH tree the deep (full-corpus) gate verified, so the
    routine sweep can tell whether the sampled-registry discipline has
    lapsed (the sub-corpus rework is a silent coverage reduction if
    nobody reruns --deep after changes)."""
    os.makedirs(os.path.dirname(_DEEP_STAMP), exist_ok=True)
    with open(_DEEP_STAMP, "w") as fh:
        json.dump({"head": _git_head(), "queries": sorted(names)}, fh)


def _check_deep_stamp() -> None:
    head = _git_head()
    try:
        with open(_DEEP_STAMP) as fh:
            st = json.load(fh)
    except (OSError, ValueError):
        print("DEEP GATE: never run in this checkout — run "
              "`python tools/check_oracle.py <sf_dir> --deep` to verify "
              "the full-corpus twins of the sampled dedup queries")
        return
    if st.get("head") != head:
        print(f"DEEP GATE: stale — last verified at {st.get('head', '?')[:12]}, "
              f"HEAD is {head[:12]}; rerun "
              "`python tools/check_oracle.py <sf_dir> --deep`")
    else:
        print(f"DEEP GATE: verified at current HEAD {head[:12]} "
              f"({len(st.get('queries', []))} full-corpus queries)")


def normalize(rows, columns):
    """Sort columns by name and rows by value — the driver's order-insensitive
    comparison shape. Floats are kept as-is (queries pre-round)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == int(v) and abs(v) < 1e15:
                    v = round(v, 10)
            vals.append((str(type(v).__name__) if v is not None else "none", str(v)))
        out.append(tuple(vals))
    out.sort()
    return [sorted(columns), out]


def main():
    argv = sys.argv[1:]
    deep = "--deep" in argv
    families = []
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--deep":
            pass
        elif argv[i] == "--family":
            families.append(argv[i + 1])
            i += 1
        else:
            args.append(argv[i])
        i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    deep_names = set()
    if deep:
        for name, (fn, sql) in entry.deep_queries().items():
            qs[name] = fn
            oracles[name] = sql
            deep_names.add(name)
    n_oracled = sum(1 for k in qs if oracles.get(k) is not None)
    # machine-printed registry count — docs quote THIS header, never a
    # hand count (the r6 close-out docs drifted to 280 vs the real 279)
    # HEAD hash in the header makes each committed sweep artifact
    # provably cover a specific tree (r9 judge task: a post-sweep source
    # commit left the shipped tree formally unverified); "+dirty" flags
    # uncommitted changes so the artifact can't masquerade as covering
    # any commit at all.
    head = _git_head()[:12] + ("+dirty" if _git_dirty() else "")
    print(f"registry: {len(qs)} queries, {n_oracled} with value oracles, "
          f"{len(qs) - n_oracled} rows-only; sf_dir={sf_dir}; "
          f"verified_head={head}")
    if families:
        fam_hits = {k for k in qs for p in families if k.startswith(p)}
        if not fam_hits and not only:
            print(f"no queries match family prefixes {families}")
            sys.exit(2)
        only |= fam_hits
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"  WARNING: zero rows for rows-only query {name}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue

        ncols_s, nrows_s = normalize(srows, scols)
        ncols_d, nrows_d = normalize(drows, dcols)
        problems = []
        if ncols_s != ncols_d:
            problems.append(f"columns {ncols_s} != {ncols_d}")
        if len(nrows_s) != len(nrows_d):
            problems.append(f"rowcount {len(nrows_s)} != {len(nrows_d)}")
        elif nrows_s != nrows_d:
            diffs = [
                (a, b) for a, b in zip(nrows_s, nrows_d) if a != b
            ][:3]
            problems.append(f"{sum(1 for a, b in zip(nrows_s, nrows_d) if a != b)} "
                            f"value mismatches, first: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(p[:500] for p in problems))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(nrows_s)} rows [{time.time()-t0:.1f}s]")

    print()
    if deep and not failures and (not only or deep_names <= only):
        # all deep queries ran and passed → stamp the verified tree
        _stamp_deep_gate(deep_names)
        print(f"DEEP GATE: stamped at HEAD {_git_head()[:12]}")
    elif not deep and not only:
        # routine full sweep → remind (loudly, not fatally) if the deep
        # full-corpus gate hasn't been re-verified against this tree
        _check_deep_stamp()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
