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


class TestFellegiSunter:
    def _pairs(self, spark):
        return spark.createDataFrame(
            [(1, 2, "A", "A", 10.0, 12.0),
             (3, 4, "A", "B", 10.0, 500.0),
             (5, 6, "A", "A", 10.0, 900.0),
             (7, 8, None, "A", None, 5.0)],
            "a_id long, b_id long, a_seg string, b_seg string, "
            "a_bal double, b_bal double")

    def _comparisons(self):
        from pyspark.sql import functions as F
        return {
            "seg": (F.col("a_seg") == F.col("b_seg"), 0.9, 0.1),
            "bal": (F.abs(F.col("a_bal") - F.col("b_bal")) <= 50.0,
                    0.8, 0.05),
        }

    def test_weights_and_classes(self, spark):
        import math

        import pytest as _pt

        from bid_evaluation_spark.operators.fuzzy import fellegi_sunter_score

        out = {r["a_id"]: r for r in fellegi_sunter_score(
            self._pairs(spark), self._comparisons(),
            lower=0.0, upper=4.0).collect()}
        w_seg_a, w_seg_d = math.log(0.9 / 0.1), math.log(0.1 / 0.9)
        w_bal_a, w_bal_d = math.log(0.8 / 0.05), math.log(0.2 / 0.95)
        assert out[1]["fs_score"] == _pt.approx(w_seg_a + w_bal_a)
        assert out[1]["fs_class"] == "link"
        assert out[3]["fs_score"] == _pt.approx(w_seg_d + w_bal_d)
        assert out[3]["fs_class"] == "non_link"
        assert out[5]["fs_score"] == _pt.approx(w_seg_a + w_bal_d)
        # null comparisons count as disagreement, never null out the score
        assert out[7]["fs_score"] == _pt.approx(w_seg_d + w_bal_d)

    def test_validation(self, spark):
        import pytest as _pt

        from bid_evaluation_spark.operators.fuzzy import fellegi_sunter_score

        pairs = self._pairs(spark)
        with _pt.raises(ValueError):
            fellegi_sunter_score(pairs, {})
        bad = dict(self._comparisons())
        from pyspark.sql import functions as F
        bad["x"] = (F.lit(True), 1.5, 0.5)
        with _pt.raises(ValueError):
            fellegi_sunter_score(pairs, bad)
        with _pt.raises(ValueError):
            fellegi_sunter_score(pairs, self._comparisons(),
                                 lower=5.0, upper=1.0)
