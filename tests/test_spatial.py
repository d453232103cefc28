"""Grid-blocked radius join: hand cases, cell-boundary recall, and a
brute-force differential."""

import math

import pytest

from bid_evaluation_spark.operators.spatial import radius_join


def _pairs(spark, pts, r):
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    return {(row["id_a"], row["id_b"]): row["dist"]
            for row in radius_join(df, "pid", "x", "y", r).collect()}


def test_hand_case(spark):
    out = _pairs(spark, [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 5.0, 0.0)], 1.5)
    assert out == {(1, 2): 1.0}


def test_cross_cell_boundary_recall(spark):
    # neighbors in DIFFERENT cells (cell side = r = 1.0) must still pair
    out = _pairs(spark, [(1, 0.9, 0.9), (2, 1.05, 1.05)], 1.0)
    assert (1, 2) in out
    assert out[(1, 2)] == pytest.approx(math.hypot(0.15, 0.15), abs=1e-4)


def test_radius_inclusive(spark):
    out = _pairs(spark, [(1, 0.0, 0.0), (2, 2.0, 0.0)], 2.0)
    assert out == {(1, 2): 2.0}


def test_brute_force_differential(spark):
    pts = [(k, (k * 37 % 19) / 2.0, (k * 53 % 23) / 2.0)
           for k in range(60)]
    r = 1.7
    expect = {}
    for i, (ka, xa, ya) in enumerate(pts):
        for kb, xb, yb in pts[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                a, b = min(ka, kb), max(ka, kb)
                expect[(a, b)] = round(math.sqrt(d2) * 1e4) / 1e4
    got = _pairs(spark, pts, r)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=1e-4)


def test_nulls_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, 0.0), (3, 0.1, 0.0)],
        "pid long, x double, y double")
    out = {(row["id_a"], row["id_b"])
           for row in radius_join(df, "pid", "x", "y", 1.0).collect()}
    assert out == {(1, 3)}
    with pytest.raises(ValueError):
        radius_join(df, "pid", "x", "y", 0.0)
