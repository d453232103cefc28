"""Invariants of the driver-facing registry sample.

The driver's correctness gate checks the FIRST 50 keys of
``__spark_entry__.queries()``; ``_DRIVER_SAMPLE`` curates that window to
span the operator families (VERDICT r8 task 1).  These tests freeze the
contract so a registry edit can't silently shrink or skew the sample.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry


def test_sample_is_exactly_the_first_50_keys():
    qs = list(entry.queries())
    os_ = list(entry.oracle_sql())
    assert entry._DRIVER_SAMPLE == qs[:50]
    assert entry._DRIVER_SAMPLE == os_[:50]


def test_sample_size_and_uniqueness():
    s = entry._DRIVER_SAMPLE
    assert len(s) == 50
    assert len(set(s)) == 50


def test_sample_keys_all_exist_and_all_oracled():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = [k for k in entry._DRIVER_SAMPLE if k not in qs]
    unoracled = [k for k in entry._DRIVER_SAMPLE if k not in oracles]
    assert missing == []
    assert unoracled == []


def test_sample_spans_at_least_20_post_r2_families():
    """Family = first name segment(s); count distinct beyond the
    reference-parity prefixes (f*/a*/j*/w*/staged/flagship/batched)."""
    core_prefixes = ("f", "a", "j", "w", "staged", "flagship", "batched")
    fams = set()
    for k in entry._DRIVER_SAMPLE:
        head = k.split("_")[0]
        if head in core_prefixes or (
            len(head) <= 3 and head[0] in "fajw" and head[1:].isdigit()
        ):
            continue
        fams.add(head if head not in ("events", "pipe", "mm", "ts")
                 else "_".join(k.split("_")[:2]))
    assert len(fams) >= 20, sorted(fams)


def test_family_index_matches_census():
    """The family-index comment block above ``_QUERIES`` quotes per-prefix
    counts; verify every ``name(count)`` token there against the live
    registry so the index can't drift (f1-f13 are rolled up by hand)."""
    import re

    src = open("__spark_entry__.py").read()
    block = re.search(
        r"# Family index.*?\n_QUERIES: dict = \{", src, re.S).group(0)
    from collections import Counter

    census = Counter(k.split("_")[0] for k in entry._QUERIES)
    stated = re.findall(r"([a-z0-9]+)\((\d+)\)", block)
    assert stated, "no name(count) tokens found in the index block"
    for name, cnt in stated:
        assert census.get(name, 0) == int(cnt), (
            f"index says {name}({cnt}) but registry has "
            f"{census.get(name, 0)}")
    # the f*(18) rollup (regex above skips it: '*' breaks the token)
    f_total = sum(v for k, v in census.items()
                  if re.fullmatch(r"f\d+", k))
    assert f_total == 18, f_total


def test_reorder_preserves_the_full_registry():
    qs = entry.queries()
    assert set(qs) == set(entry._QUERIES)
    assert len(qs) == len(entry._QUERIES)
    # tail preserves original insertion order
    orig = [k for k in entry._QUERIES if k not in set(entry._DRIVER_SAMPLE)]
    assert list(qs)[50:] == orig
