"""Event-stream window aggregations: tumbling, sliding (hopping), sessions.

The reference has no streaming surface at all (SURVEY §2.9); these are the
idiomatic Structured-Streaming equivalents mandated by the build plan
(SURVEY §7 phase E), designed batch-first: every aggregation is defined once
as a DataFrame transform that works identically on a static frame and on a
``readStream`` source — the Structured Streaming model's core property.

Scale notes: windowed aggregations shuffle on (window, key) with map-side
partial aggregation; watermarks bound state for streaming mode; session
windows in batch mode use the lag/cumsum pattern (two window functions over
(user, time) — one shuffle), and in streaming mode Spark's native
``session_window``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def tumbling_agg(events: DataFrame, duration: str = "1 hour",
                 ts_col: str = "ts", key_col: str = "event_type",
                 value_col: str = "value") -> DataFrame:
    """Tumbling-window counts and sums per key.

    Works on static and streaming frames alike (``F.window`` is the same op).
    """
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n_events", "sum_value", "avg_value",
        )
    )


def sliding_agg(events: DataFrame, duration: str = "6 hours",
                slide: str = "1 hour", ts_col: str = "ts",
                key_col: str = "event_type", value_col: str = "value") -> DataFrame:
    """Sliding (hopping) window counts/sums per key."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n_events", "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               ts_col: str = "ts", user_col: str = "user_id",
               value_col: str = "value",
               order_tiebreak: Optional[str] = "event_id") -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_seconds``.

    The classic lag → is-new flag → running-sum session id pattern; both
    window functions share one (user, time) sort so it costs a single
    shuffle. Returns one row per session.
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w_seq = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w_seq)
    # cast timestamp → double keeps fractional seconds (unix_timestamp would
    # truncate to whole seconds and mis-split sessions at sub-second gaps)
    is_new = (
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_seconds)
    ).cast("long")
    with_session = events.withColumn(
        "_session_id",
        F.sum(is_new).over(w_seq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_session.groupBy(user_col, "_session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("_session_id")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes",
                       ts_col: str = "ts", user_col: str = "user_id",
                       value_col: str = "value") -> DataFrame:
    """Sessionization via Spark's native ``session_window`` — one row per
    session with start/end/count/sum.

    Same output shape as :func:`sessionize` with one boundary difference:
    ``session_window`` closes a session when the gap is ``>= gap`` (window
    intervals are ``[start, end)`` with ``end = last_ts + gap``), while
    :func:`sessionize` splits on strictly ``> gap``. Events exactly at the
    boundary are vanishingly rare with sub-second timestamps; pick by mode:
    this form is the one that also runs on a ``readStream`` frame (native
    streaming state), the lag/cumsum form is the batch-SQL-portable one.
    """
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                       F.col(user_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


def stream_tumbling_counts(spark, source_path: str, schema,
                           duration: str = "1 hour",
                           watermark: str = "30 minutes",
                           ts_col: str = "ts", key_col: str = "event_type",
                           value_col: str = "value") -> DataFrame:
    """Streaming twin of :func:`tumbling_agg` over a file source.

    Late data beyond ``watermark`` is dropped and window state is bounded —
    the standard production shape. Consume with e.g.::

        q = (stream_tumbling_counts(spark, path, schema)
             .writeStream.format("memory").queryName("agg")
             .outputMode("complete").trigger(availableNow=True).start())
    """
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_path)
        .withWatermark(ts_col, watermark)
    )
    return tumbling_agg(stream, duration, ts_col, key_col, value_col)
