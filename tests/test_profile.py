"""Data-profiling operators (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F

from bid_evaluation_spark.operators.profile import column_profile, numeric_histogram


@pytest.fixture
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, "b", 8.0), (4, None, 4.0),
         (5, "a", 6.0)],
        "id long, cat string, x double")


def test_column_profile_tallies_and_top(frame):
    got = {r["column"]: r for r in column_profile(frame, ["cat", "x"], top_k=2).collect()}
    c = got["cat"]
    assert (c["n_rows"], c["n_null"], c["n_distinct"]) == (5, 1, 2)
    assert [(tv["value"], tv["n"]) for tv in c["top_values"]] == [("a", 3), ("b", 1)]
    x = got["x"]
    assert (x["n_rows"], x["n_null"], x["n_distinct"]) == (5, 1, 4)
    # count ties break value-ascending (string order) — deterministic
    assert [(tv["value"], tv["n"]) for tv in x["top_values"]] == [("2.0", 1), ("4.0", 1)]
    # default: every column, including the key itself
    assert {r["column"] for r in column_profile(frame).collect()} == {"id", "cat", "x"}
    with pytest.raises(KeyError, match="nope"):
        column_profile(frame, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        column_profile(frame, [])


def test_numeric_histogram_edges_and_empty_buckets(spark, frame):
    rows = numeric_histogram(frame, ["x"], bins=3).collect()
    assert [(r["bucket"], r["lo"], r["hi"], r["n"]) for r in rows] == [
        (0, 2.0, 4.0, 1),   # 2.0
        (1, 4.0, 6.0, 1),   # 4.0
        (2, 6.0, 8.0, 2),   # 6.0 and the max 8.0 (top edge inclusive)
    ]
    # empty buckets materialize with n=0
    sparse = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    got = {r["bucket"]: r["n"] for r in numeric_histogram(sparse, ["x"], bins=5).collect()}
    assert got == {0: 1, 1: 0, 2: 0, 3: 0, 4: 1}
    # constant and all-null columns keep the bins-rows contract
    const = spark.createDataFrame([(7.0,), (7.0,), (None,)], "x double")
    crows = numeric_histogram(const, ["x"], bins=4).collect()
    assert [r["n"] for r in crows] == [2, 0, 0, 0]
    assert all(r["lo"] == 7.0 and r["hi"] == 7.0 for r in crows)
    nul = spark.createDataFrame([(None,)], "x double")
    assert [r["n"] for r in numeric_histogram(nul, ["x"], bins=2).collect()] == [0, 0]
    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(frame, ["x"], bins=0)
    with pytest.raises(KeyError, match="nope"):
        numeric_histogram(frame, ["nope"])
