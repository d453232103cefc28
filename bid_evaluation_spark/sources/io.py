"""Sources & sinks.

Reference surface (SURVEY §2.1): in-memory DataFrames (S1), Excel scan/sink
for the report path (S2/S3), CSV sink (S4), YAML/JSON/dict config sources
(S5-S7 — implemented on the evaluators themselves). Primary data ingest for
the Spark engine is columnar parquet/CSV — ``spark.read`` with pushdown and
pruning; Excel remains a driver-side pandas bridge (config-scale files only,
exactly like the reference's Streamlit upload path).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

#: timestamp columns in the driver parquet, normalized to plain TIMESTAMP
#: (instant) regardless of how the driver generated them:
#:  - TIMESTAMP(NANOS) → Spark reads long (nanosAsLong); integer-div to µs
#:  - timestamp[us] without UTC adjustment → Spark ≥3.4 infers TIMESTAMP_NTZ;
#:    cast to TIMESTAMP (session tz is pinned UTC, so the epoch is unchanged
#:    and matches DuckDB's naive-timestamp reading)
_TS_COLUMNS: Dict[str, tuple] = {
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-testdata table with schema normalization."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _TS_COLUMNS.get(name, ()):
        if col not in df.columns:
            continue
        dtype = dict(df.dtypes)[col]
        if dtype == "bigint":
            # integer `div` — float division would round 1e18-ns values by ±1µs
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    """Load every testdata table (and register temp views of the same names)."""
    out = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# === Excel bridge (S2/S3) — config-scale report I/O via pandas ===

def read_excel(spark: SparkSession, path: str,
               sheet_name: Optional[str] = 0) -> DataFrame:
    """Excel scan bridged through pandas (reference demo ingest,
    ``demos/streamlit_demo.py:100-115``). For bid-table-scale inputs only —
    large data belongs in parquet/CSV. Uses the pandas Excel engine when one
    is installed; otherwise the stdlib reader in :mod:`.xlsx`."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:
        from .xlsx import read_xlsx

        pdf = read_xlsx(path, sheet_name=sheet_name)
    return spark.createDataFrame(pdf)


def excel_sheet_names(path: str) -> list:
    import pandas as pd

    try:
        with pd.ExcelFile(path) as xf:
            return list(xf.sheet_names)
    except ImportError:
        from .xlsx import sheet_names

        return sheet_names(path)


def write_results_excel(result: DataFrame, path: str,
                        statistics: Optional[dict] = None,
                        config: Optional[dict] = None,
                        max_rows: int = 100_000) -> None:
    """Multi-sheet results workbook: Results / Statistics / Configuration
    (reference ``demos/streamlit_demo.py:540-568``). Collects to the driver —
    guarded by ``max_rows`` because a report sink is not a data sink."""
    import json

    import pandas as pd

    sheets = {"Results": result.limit(max_rows).toPandas()}
    if statistics:
        rows = []
        for crit, st in statistics.items():
            if isinstance(st, dict) and all(not isinstance(v, dict) for v in st.values()):
                rows.append({"criterion": crit, **st})
            else:  # staged: {stage: {criterion: stats}}
                for sub, sub_stats in (st or {}).items():
                    rows.append({"stage": crit, "criterion": sub, **sub_stats})
        sheets["Statistics"] = pd.DataFrame(rows)
    if config:
        sheets["Configuration"] = pd.DataFrame(
            [{"configuration": json.dumps(config, indent=2)}]
        )
    try:
        with pd.ExcelWriter(path) as writer:
            for name, pdf in sheets.items():
                pdf.to_excel(writer, sheet_name=name, index=False)
    except (ImportError, ModuleNotFoundError):
        from .xlsx import write_xlsx

        write_xlsx(path, sheets)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (S4) — distributed write, header on."""
    df.write.mode(mode).option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: Optional[list] = None) -> None:
    """Parquet sink — the primary data sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          pos_col: str = "shuffle_pos",
                          mode: str = "overwrite") -> None:
    """Write a globally-ordered frame (e.g. the output of
    ``pipeline.shuffle_rows``) as ``n_shards`` contiguous, internally-ordered
    parquet shards — the training-data-loader layout, where each worker
    streams one shard sequentially and the concatenation of shards in range
    order replays the exact global permutation.

    ``repartitionByRange`` on the position column gives contiguous,
    non-overlapping shard ranges (one range-sampled exchange);
    ``sortWithinPartitions`` orders rows inside each shard with no further
    shuffle.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    (df.repartitionByRange(n_shards, F.col(pos_col))
       .sortWithinPartitions(pos_col)
       .write.mode(mode).parquet(path))


# === Bucketed tables (co-located joins — the repeated-big-join scale path) ===

def write_bucketed(df: DataFrame, table: str, bucket_cols,
                   num_buckets: int = 32, path: Optional[str] = None,
                   mode: str = "overwrite",
                   sort_cols: Optional[list] = None) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) parquet table.

    Bucketing pre-shuffles the data ONCE at write time: two tables bucketed
    by the same key into the same bucket count join with NO exchange on
    either side (sort-merge join reads co-located buckets; with sort_cols
    even the sort is pre-done). This is the right trade when a big fact
    table is joined on the same key by many downstream queries — e.g. a
    scored-bids table repeatedly joined to per-bid detail on the bid key.

    Spark bucketing rides the session catalog (``saveAsTable``); pass
    ``path`` to keep the data external at an explicit location.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a (bucketed) table registered in the session catalog."""
    return spark.table(table)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV source with an EXPLICIT schema (header on). At corpus scale
    schema inference is a full extra pass over the data — callers supply
    the DDL string; malformed rows null out (PERMISSIVE), matching
    Spark's default contract."""
    return spark.read.option("header", True).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format of most LLM-data tooling
    (one JSON object per line, distributed write, splittable reads)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema (same no-inference-pass
    rationale as :func:`read_csv`; inference on JSON additionally
    type-widens inconsistently across files)."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — second columnar format (built into Spark), same
    pushdown/pruning story as parquet for ORC-standardized estates."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — columnar, with predicate pushdown and column pruning
    (self-describing schema; no inference pass needed)."""
    return spark.read.orc(path)


def footer_stats(spark: SparkSession, path: str, columns) -> dict:
    """COUNT/MIN/MAX answered from parquet FOOTER statistics — zero data
    pages read. At 100 TB this is the difference between a metadata-only
    job (one task per file listing row-group stats) and a full-corpus
    scan; it is how a pipeline sizes itself (row counts, value ranges for
    bin/bucket planning) before touching data.

    Mechanics: Spark's parquet aggregate pushdown is a DataSource-v2-only
    feature, so the reader configs (`spark.sql.sources.useV1SourceList`,
    `spark.sql.parquet.aggregatePushdown`) are flipped for the duration of
    the call and restored after. The plan is ASSERTED to contain
    ``PushedAggregation`` before execution — if pushdown silently fell
    back to a scan (nested/string column, row-group without stats),
    this raises instead of quietly paying the full read.

    Returns ``{"count": n, "min_<col>": v, "max_<col>": v, ...}``.
    Numeric/date columns only by contract.
    """
    from pyspark.sql import functions as F

    conf = spark.conf
    old_v1 = conf.get("spark.sql.sources.useV1SourceList")
    old_push = conf.get("spark.sql.parquet.aggregatePushdown")
    try:
        conf.set("spark.sql.sources.useV1SourceList", "")
        conf.set("spark.sql.parquet.aggregatePushdown", "true")
        df = spark.read.parquet(path)
        aggs = [F.count(F.lit(1)).alias("count")]
        for c in columns:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        q = df.agg(*aggs)
        plan = q._jdf.queryExecution().executedPlan().toString()
        # an EMPTY "PushedAggregation: []" means the scan silently fell
        # back to reading data — only a populated list is a pushed plan
        if "PushedAggregation: [COUNT" not in plan \
                and "PushedAggregation: [MIN" not in plan \
                and "PushedAggregation: [Min" not in plan \
                and "PushedAggregation: [Count" not in plan:
            raise ValueError(
                f"aggregate pushdown did not engage for {path} "
                f"(columns {list(columns)}) — unsupported column type or "
                "missing row-group statistics; run a real scan instead")
        row = q.collect()[0]
        return row.asDict()
    finally:
        conf.set("spark.sql.sources.useV1SourceList", old_v1)
        conf.set("spark.sql.parquet.aggregatePushdown", old_push)
