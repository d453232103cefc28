"""Data-layout optimization: Z-order (Morton) clustering keys for
multi-dimensional data skipping.

Beyond-reference operator (BASELINE.json north star): at 100 TB the scan
is the dominant cost, and parquet row-group/file min-max statistics only
prune when the layout is clustered on the filtered column. Sorting on ONE
column destroys locality on every other; interleaving the bits of several
quantized columns (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea) gives
every participating column bounded per-file ranges, so predicates on ANY
of them prune files.

Scale shape: one fused min/max aggregate (2·|cols| scalars to the driver,
inlined as literals), then the key is a pure Column expression —
quantize each column to ``bits`` levels and interleave bit i of column j
into position ``i·n + j`` (|cols|·bits shift/and/or terms inside one
whole-stage-codegen span, no Python, no shuffle). ``cluster_by_zorder``
adds the one range-partitioning exchange + within-partition sort that any
clustering rewrite needs.

Determinism: quantization is ``floor(((x − mn) / span) · (2^bits − 1))``
with exactly this operation order — an engine replaying the same IEEE
operations lands on identical keys bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _quantized(col: Column, mn: float, mx: float, bits: int) -> Column:
    levels = (1 << bits) - 1
    if mx <= mn:                      # constant (or empty) column
        return F.lit(0).cast("long")
    q = F.floor(((col.cast("double") - F.lit(mn)) / F.lit(mx - mn))
                * F.lit(float(levels))).cast("long")
    # clamp: nulls -> 0, out-of-fit values (streaming append) -> edges
    return F.least(F.greatest(F.coalesce(q, F.lit(0)), F.lit(0)),
                   F.lit(levels))


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16,
               out_col: str = "zkey") -> DataFrame:
    """Append a Morton (Z-order) clustering key interleaving ``cols``.

    ``bits`` per column; the key occupies ``bits × |cols|`` bits (≤ 63
    total). Column bounds come from one fused min/max aggregate and are
    inlined as literals, so the key expression itself is map-only.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a long")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_mx_{c}")]
    row = df.agg(*aggs).collect()[0]

    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        q = _quantized(F.col(c), float(mn if mn is not None else 0.0),
                       float(mx if mx is not None else 0.0), bits)
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)),
                            i * n + j))
    return df.withColumn(out_col, key)


def cluster_by_zorder(df: DataFrame, cols: Sequence[str],
                      num_partitions: int, bits: int = 16) -> DataFrame:
    """Range-partition + sort the frame by its Z-order key — the
    clustering rewrite before a parquet write, giving every ``cols``
    member bounded per-file ranges (multi-dimensional data skipping).
    The key column is dropped from the result; exactly ONE exchange.
    """
    keyed = zorder_key(df, cols, bits=bits, out_col="_zk")
    return (keyed.repartitionByRange(num_partitions, "_zk")
            .sortWithinPartitions("_zk").drop("_zk"))
