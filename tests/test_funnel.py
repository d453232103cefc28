"""Session funnel: known micro-corpus, depth monotonicity, contracts."""

from datetime import datetime

import pytest

from bid_evaluation_spark.streaming.events import session_funnel


def _ts(m):
    return datetime(2026, 1, 1, 10, m)


def test_session_funnel_known_counts(spark):
    rows = [
        # user 1, session A: view + click + purchase  (depth 3)
        (1, _ts(0), 1, "view"), (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "purchase"),
        # user 1, session B (>30min later): view only  (depth 1)
        (4, _ts(40), 1, "view"),
        # user 2, one session: click+purchase but NO view (depth 0)
        (5, _ts(0), 2, "click"), (6, _ts(1), 2, "purchase"),
        # user 3: view + click (depth 2), order scrambled inside session
        (7, _ts(5), 3, "click"), (8, _ts(1), 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r["depth"]: (r["stage"], r["n_sessions"])
           for r in session_funnel(df).collect()}
    assert out == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_session_funnel_monotone_on_testdata(spark):
    from bid_evaluation_spark.sources.io import load_table
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    got = [r["n_sessions"] for r in
           session_funnel(df).orderBy("depth").collect()]
    assert len(got) == 3 and got[0] >= got[1] >= got[2] > 0


def test_session_funnel_empty_stages(spark):
    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string")
    with pytest.raises(ValueError, match="non-empty"):
        session_funnel(df, stages=())
