"""Embedding-column maintenance: L2 normalization and int8 quantization —
map-only array transforms, no shuffle, no Python.

Beyond-reference operators (BASELINE.json north star: storage/IO economics
of an embedding corpus at 100 TB). Symmetric per-vector int8 quantization
cuts an `array<float>` column 4× (8× vs double) — at petabyte embedding
scale that is the difference between one and four racks of NVMe — while
keeping a per-vector ``scale`` so any consumer can dequantize. All
arithmetic is engine-portable (``round`` half-away-from-zero on identical
doubles), so exact DuckDB oracles exist for both operators.

Scale shape: every function here is a narrow projection — linear in rows,
zero shuffle, fully inside whole-stage codegen except the array lambda
bodies (element-count work, 64 ops/row — negligible next to the scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _norm


def l2_normalize(df: DataFrame, vec_col: str = "embedding",
                 out_col: str = None) -> DataFrame:
    """Scale each vector to unit L2 norm (zero vectors pass through
    unchanged rather than dividing by zero). Adds/overwrites ``out_col``
    (default: in place) plus a ``norm`` column with the original norm."""
    out_col = out_col or vec_col
    nrm = _norm(F.col(vec_col))
    scaled = F.when(nrm == 0.0, F.col(vec_col)).otherwise(
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm))
    # Single projection so the in-place case (out_col == vec_col) still sees
    # the source column while computing both the norm and the scaled vector.
    cols = [scaled.alias(out_col) if c == out_col else F.col(c)
            for c in df.columns]
    if out_col not in df.columns:
        cols.append(scaled.alias(out_col))
    return df.select(*cols, nrm.alias("norm"))


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  q_col: str = "q_embedding",
                  scale_col: str = "q_scale") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` ∈ [-127, 127]. All-zero vectors get
    scale 1.0 (quantize to zeros, dequantize exactly). Keeps the input
    column; adds ``(q_col: array<int>, scale_col: double)``."""
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(maxabs == 0.0, F.lit(1.0)).otherwise(maxabs / F.lit(127.0))
    q = F.transform(v, lambda x: F.round(x.cast("double") / scale)
                    .cast("int"))
    return df.select("*", q.alias(q_col), scale.alias(scale_col))


def dequantize_int8(df: DataFrame, q_col: str = "q_embedding",
                    scale_col: str = "q_scale",
                    out_col: str = "dq_embedding") -> DataFrame:
    """Inverse of :func:`quantize_int8`: ``x̂_i = q_i · scale`` as
    ``array<double>``."""
    s = F.col(scale_col)
    dq = F.transform(F.col(q_col), lambda q: q.cast("double") * s)
    return df.select("*", dq.alias(out_col))


def quantization_error(df: DataFrame, vec_col: str = "embedding",
                       dq_col: str = "dq_embedding") -> DataFrame:
    """Per-vector reconstruction diagnostics: ``max_abs_err`` (∞-norm of
    the residual) and ``l2_err`` (2-norm). The error bound for symmetric
    int8 is ``scale/2`` per element — assert it in tests, monitor it in
    pipelines."""
    v, d = F.col(vec_col), F.col(dq_col)
    resid = F.zip_with(v, d, lambda a, b: F.abs(a.cast("double") - b))
    return df.select(
        "*",
        F.array_max(resid).alias("max_abs_err"),
        _norm(resid).alias("l2_err"),
    )


def matryoshka_truncate(df: DataFrame, dim: int,
                        vec_col: str = "embedding",
                        out_col: str = None,
                        renormalize: bool = True) -> DataFrame:
    """Truncate Matryoshka-trained embeddings to their leading ``dim``
    dimensions and (by default) re-normalize to unit L2 (Kusupati et al.,
    NeurIPS 2022, public arXiv:2205.13147) — the storage/recall dial of an
    MRL embedding estate: 64→16 dims is a 4× scan shrink on every ANN
    query, applied as a pure projection at read time. Vectors shorter
    than ``dim`` become null (truncation is undefined, surfacing schema
    drift instead of mixed-length silently entering an index); zero
    truncated vectors stay zero rather than dividing by zero. Map-only,
    no Python, no shuffle."""
    if dim < 1:
        raise ValueError(f"dim must be positive, got {dim}")
    out_col = out_col or vec_col
    head = F.slice(F.col(vec_col).cast("array<double>"), 1, dim)
    if renormalize:
        nrm = F.sqrt(F.aggregate(head, F.lit(0.0),
                                 lambda a, x: a + x * x))
        head = F.when(nrm == 0.0, head).otherwise(
            F.transform(head, lambda x: x / nrm))
    res = F.when(F.size(F.col(vec_col)) >= dim, head)
    cols = [res.alias(out_col) if c == out_col else F.col(c)
            for c in df.columns]
    if out_col not in df.columns:
        cols.append(res.alias(out_col))
    return df.select(*cols)
