"""Fuzzy edit-distance join: exactness vs dense ground truth (both paths),
null handling, approximate mode, validation."""

import numpy as np
import pytest

from bid_evaluation_spark.operators.fuzzy import fuzzy_join


def _lev(a, b):
    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[-1])


def _truth(rows_a, rows_b, d):
    return {(i, j): _lev(a, b)
            for i, a in rows_a for j, b in rows_b if _lev(a, b) <= d}


def test_exact_vs_dense_truth_mixed_lengths(spark):
    # crosses the short/long path boundary (q=2, d=2 -> short_len 6, cap 8)
    names = ["alpha", "alphq", "alpXa", "beta", "bta", "a", "ab", "",
             "gamma-ray", "gamma_ray", "gamma", "x" * 30, "x" * 29 + "y",
             "abcdef", "abcdeg", "abcdefgh"]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["l_id"], r["r_id"]): r["dist"]
           for r in fuzzy_join(df, df, "name", "id", "id",
                               max_dist=2).collect()}
    assert got == _truth(rows, rows, 2)


def test_exact_random_strings_d1(spark):
    rng = np.random.default_rng(9)
    alph = list("abcd")
    rows = [(i, "".join(rng.choice(alph, size=rng.integers(1, 10))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["l_id"], r["r_id"]): r["dist"]
           for r in fuzzy_join(df, df, "name", "id", "id",
                               max_dist=1, q=2).collect()}
    assert got == _truth(rows, rows, 1)


def test_cross_table_and_nulls(spark):
    a = spark.createDataFrame([(0, "hello"), (1, None)], "id long, name string")
    b = spark.createDataFrame([(10, "hallo"), (11, None)], "id long, name string")
    got = [(r["l_id"], r["r_id"], r["dist"])
           for r in fuzzy_join(a, b, "name", "id", "id", max_dist=1).collect()]
    assert got == [(0, 10, 1)]          # nulls never match anything


def test_max_gram_df_is_an_explicit_approximation(spark):
    # every name shares the frequent prefix-grams; pruning them can only
    # remove LONG-path candidates, never add false positives
    rows = [(i, f"item-{i:04d}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, name string")
    exact = {(r["l_id"], r["r_id"]) for r in
             fuzzy_join(df, df, "name", "id", "id", max_dist=2).collect()}
    pruned = {(r["l_id"], r["r_id"]) for r in
              fuzzy_join(df, df, "name", "id", "id", max_dist=2,
                         max_gram_df=5).collect()}
    assert pruned <= exact


def test_validation(spark):
    df = spark.createDataFrame([(0, "x")], "id long, name string")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(df, df, "name", "id", "id", max_dist=0)
    with pytest.raises(ValueError, match="q must"):
        fuzzy_join(df, df, "name", "id", "id", q=0)
