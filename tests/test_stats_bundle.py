"""stats_bundle_df engine parity (r12 opt): the single-task kernel
(sort-based exact percentiles) must agree with the fused distributed
aggregate at well under the bundle's 4-decimal output contract, and the
dispatch must handle empty input and the env cap."""

import random

import pytest

from bid_evaluation_spark.plans.stats import stats_bundle_df


def _row(df, cols, **kw):
    return stats_bundle_df(df, cols, **kw).collect()[0].asDict()


def test_kernel_matches_agg_engine(spark):
    rnd = random.Random(3)
    rows = [(rnd.uniform(0, 1e5),
             rnd.uniform(0, 50) if i % 7 else None,
             5.0)                       # constant column: std 0
            for i in range(5001)]       # odd count: exact-row percentile
    df = spark.createDataFrame(rows, "a double, b double, c double")
    fast = _row(df, ["a", "b", "c"], engine="kernel")
    slow = _row(df, ["a", "b", "c"], engine="agg")
    assert fast.keys() == slow.keys()
    for k in fast:
        f, s = fast[k], slow[k]
        if f is None or s is None:
            assert f == s, k
        else:
            assert f == pytest.approx(s, rel=1e-9, abs=1e-9), k


def test_empty_single_and_allnull(spark):
    df = spark.createDataFrame([(1.5, None), (2.5, None)],
                               "a double, b double")
    for eng in ("kernel", "agg", "auto"):
        r = _row(df, ["a", "b"], engine=eng)
        assert r["a__min"] == 1.5 and r["a__median"] == 2.0
        assert r["b__min"] is None and r["b__std"] is None, eng
    empty = _row(df.limit(0), ["a"], engine="auto")
    assert all(v is None for v in empty.values())
    one = spark.createDataFrame([(7.0,)], "a double")
    assert _row(one, ["a"], engine="kernel") \
        == _row(one, ["a"], engine="agg")     # stddev n=1 -> null in both


def test_env_cap_routes_to_agg(spark, monkeypatch):
    df = spark.createDataFrame([(float(i),) for i in range(10)], "a double")
    monkeypatch.setenv("SPARK_GRAFT_STATS_LOCAL_MAX_ROWS", "2")
    r = _row(df, ["a"])                  # auto -> agg above the cap
    assert r["a__median"] == 4.5
    with pytest.raises(ValueError):
        stats_bundle_df(df, ["a"], engine="bogus")
