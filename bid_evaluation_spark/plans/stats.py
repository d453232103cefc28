"""Fused per-column statistics aggregation.

Reference semantics: ``bid_evaluation/criteria.py:19-29`` computes, per criterion
column, ``min, max, mean, median, std, q25, q75`` with pandas — i.e. *sample*
standard deviation (ddof=1) and linearly-interpolated quantiles.

Spark mapping (SURVEY §2.4-A1, §1.4-17):
- ``std``      → ``stddev_samp`` (ddof=1 parity),
- ``median``   → exact ``percentile(col, 0.5)`` (linear interpolation parity;
  deliberately NOT ``percentile_approx``),
- ``q25/q75``  → exact ``percentile(col, .25/.75)``.

Where the reference runs one full pandas pass per criterion (even when two
criteria read the same column), this engine batches every requested column's
seven statistics into ONE ``df.agg(...)`` job and collects a single row.
Collected values are then inlined as literals into the scoring Column
expressions (SURVEY §4.2: collect-to-literals keeps the whole post-agg scoring
pipeline inside one whole-stage-codegen span; cost is one driver round-trip per
evaluation, not per criterion).

At scale: the agg is a partial (map-side combined) aggregation over a columnar
scan that prunes to exactly the requested columns — O(|columns|) state per
task, no shuffle of row data, a single 1-row exchange.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

STAT_KEYS = ("min", "max", "mean", "median", "std", "q25", "q75")


def _stat_exprs(col: Column, prefix: str) -> List[Column]:
    """The seven reference statistics for one column, plus nothing else."""
    c = col.cast("double")
    return [
        F.min(c).alias(f"{prefix}__min"),
        F.max(c).alias(f"{prefix}__max"),
        F.avg(c).alias(f"{prefix}__mean"),
        F.percentile(c, F.lit(0.5)).alias(f"{prefix}__median"),
        F.stddev_samp(c).alias(f"{prefix}__std"),
        F.percentile(c, F.lit(0.25)).alias(f"{prefix}__q25"),
        F.percentile(c, F.lit(0.75)).alias(f"{prefix}__q75"),
    ]


def compute_stats(
    df: DataFrame,
    columns: Sequence[str],
    *,
    with_count: bool = False,
) -> Dict[str, Dict[str, Optional[float]]]:
    """Compute the reference's statistics bundle for ``columns`` in ONE job.

    Returns ``{column: {min,max,mean,median,std,q25,q75}}`` (floats or None for
    empty/all-null input). When ``with_count`` is set, the returned dict has an
    extra ``"__count__"`` entry holding the row count (used by the staged
    pipeline to detect an empty survivor set without an extra job).
    """
    uniq = list(dict.fromkeys(columns))  # preserve order, drop dups
    aggs: List[Column] = []
    for i, c in enumerate(uniq):
        aggs.extend(_stat_exprs(F.col(c), f"c{i}"))
    if with_count:
        aggs.append(F.count(F.lit(1)).alias("__count__"))
    if not aggs:
        return {"__count__": df.count()} if with_count else {}

    row = df.agg(*aggs).first().asDict()
    out: Dict[str, Dict[str, Optional[float]]] = {}
    for i, c in enumerate(uniq):
        out[c] = {k: row[f"c{i}__{k}"] for k in STAT_KEYS}
    if with_count:
        out["__count__"] = row["__count__"]
    return out


def stats_bundle_df(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """One-row DataFrame with ``{col}_{stat}`` columns for each requested column.

    The DataFrame-returning twin of :func:`compute_stats` — used when statistics
    should stay distributed (e.g. to ``crossJoin(broadcast(...))`` instead of a
    driver collect, or to expose the A1 stats bundle as a query).
    """
    aggs: List[Column] = []
    for c in columns:
        aggs.extend(_stat_exprs(F.col(c), c))
    return df.agg(*aggs)


def grouped_stats_df(df: DataFrame, group_col: str, columns: Iterable[str]) -> DataFrame:
    """Per-group statistics bundle: one row per ``group_col`` value.

    The scale path for evaluating many independent tenders/batches in one job
    (SURVEY §2.5 note): instead of collect-to-literals per batch, compute all
    batches' stats in one shuffle and broadcast-join them back.
    """
    aggs: List[Column] = []
    for c in columns:
        aggs.extend(_stat_exprs(F.col(c), c))
    return df.groupBy(group_col).agg(*aggs)


def stats_row_to_nested(row: Mapping[str, Optional[float]], columns: Iterable[str]) -> Dict[str, Dict[str, Optional[float]]]:
    """Reshape a flat ``{col}_{stat}`` mapping into ``{col: {stat: value}}``."""
    return {c: {k: row[f"{c}__{k}"] for k in STAT_KEYS} for c in columns}
