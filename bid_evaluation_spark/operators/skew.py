"""Skew-resilient aggregation: two-phase salted groupBy.

A straight ``groupBy(key)`` over a heavily skewed key distribution sends every
row of a hot key to one reducer — the classic straggler at 100 TB. Salting
splits each hot key across ``salt_buckets`` partial groups (phase 1 shuffles
``(key, salt)``, map-side combined), then merges the partials with a second,
tiny aggregation over one row per (key, salt).

Phase-2 merge must re-aggregate partial states, so only algebraic aggregates
are exposed: count, sum, min, max, and avg (carried as sum+count). AQE's skew
handling covers *joins*; this is the aggregation-side equivalent for when a
single group's row count itself is the problem.

The salted plan costs one extra (tiny) shuffle, so use it for skewed keys —
the differential test and the driver query assert bit-identical results with
the plain ``groupBy``.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

#: aggregate spec: {output_name: (agg_kind, input_column)}
AggSpec = Mapping[str, Tuple[str, str]]

_PHASE1 = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_PHASE2 = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(df: DataFrame, keys: Sequence[str], aggs: AggSpec,
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation, result-identical to
    ``df.groupBy(*keys).agg(...)`` for the supported aggregate kinds.

    ``aggs`` maps output column name → ``(kind, column)`` with kind in
    ``count | sum | min | max | avg``. ``count`` is a row count (its column
    operand is ignored, like ``COUNT(*)``); ``avg`` skips nulls (like
    ``AVG(col)``).
    """
    for name, (kind, _) in aggs.items():
        if kind not in ("count", "sum", "min", "max", "avg"):
            raise ValueError(f"unsupported aggregate kind for {name!r}: {kind}")

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )

    p1, p2, final = [], [], []
    for name, (kind, col) in aggs.items():
        if kind == "avg":  # algebraic: carry (sum, count) through the phases
            p1.append(F.sum(col).alias(f"{name}__s"))
            p1.append(F.count(col).alias(f"{name}__c"))
            p2.append(F.sum(f"{name}__s").alias(f"{name}__s"))
            p2.append(F.sum(f"{name}__c").alias(f"{name}__c"))
            final.append(
                F.try_divide(F.col(f"{name}__s"), F.col(f"{name}__c")).alias(name)
            )
        else:
            p1.append(_PHASE1[kind](col).alias(name))
            p2.append(_PHASE2[kind](name).alias(name))
            final.append(F.col(name))

    partial = salted.groupBy(*keys, "_salt").agg(*p1)
    merged = partial.groupBy(*keys).agg(*p2)
    return merged.select(*[F.col(k) for k in keys], *final)
