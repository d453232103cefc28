"""As-of (most-recent-match) join — an operator Spark's join vocabulary lacks.

``asof_join(left, right)`` attaches to every left row the latest right row of
the same key with ``right.ts <= left.ts`` (or strictly ``<`` with
``allow_exact=False``) — the time-series enrichment join (trades→quotes,
events→latest-state).

Spark-first design: NOT an inequality join (a theta join over (key, ts ranges)
explodes into a per-key cross product at scale). Instead both sides are
unioned, tagged, and sorted once per key — ``last(right_value, ignorenulls)``
over ``(key) ORDER BY (ts, tag) ROWS UNBOUNDED PRECEDING`` carries the most
recent right values forward onto the left rows. Cost: ONE shuffle of
(left + right) on the key, the same partitioning a windowed aggregation would
need anyway; no skew amplification (a hot key costs its own row count, not a
product).

DuckDB expresses the same operator natively (``ASOF JOIN``), which is the
oracle for the driver query ``asof_click_purchase_events``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", right_cols: Optional[Sequence[str]] = None,
              suffix: str = "_right", allow_exact: bool = True) -> DataFrame:
    """Left as-of join: all left rows + the latest matching right row's columns.

    Args:
        on: ordering (timestamp) column, present in both frames.
        by: equality key, present in both frames.
        right_cols: right payload columns to attach (default: all but on/by);
            each lands as ``{col}{suffix}``, plus ``{on}{suffix}`` with the
            matched right row's timestamp (null where no match yet).
        allow_exact: match right rows at exactly ``left.ts`` (ASOF ``>=``)
            or only strictly earlier (``>``).

    Null ``by`` keys group together here (window partitioning), whereas a SQL
    ASOF equality join would drop them — pre-filter nulls for SQL parity.
    """
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in (on, by)
    ]
    lcols = [c for c in left.columns if c not in (on, by)]
    rtypes = dict((f.name, f.dataType) for f in right.schema.fields)
    ltypes = dict((f.name, f.dataType) for f in left.schema.fields)

    # right rows sort before left rows at equal ts iff exact matches count
    l_tag, r_tag = (1, 0) if allow_exact else (0, 1)
    lsel = left.select(
        F.col(by), F.col(on), F.lit(l_tag).alias("_asof_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"{c}{suffix}") for c in rcols],
        F.lit(None).cast(rtypes[on]).alias(f"{on}{suffix}"),
    )
    rsel = right.select(
        F.col(by), F.col(on), F.lit(r_tag).alias("_asof_tag"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.col(on).alias(f"{on}{suffix}"),
    )
    u = lsel.unionByName(rsel)

    w = (Window.partitionBy(by).orderBy(F.col(on), F.col("_asof_tag"))
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = [F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
              for c in rcols + [on]]
    return (
        u.select(by, on, "_asof_tag", *lcols, *filled)
        .filter(F.col("_asof_tag") == l_tag)
        .drop("_asof_tag")
    )
