"""Product quantization: codebook encoding + asymmetric-distance top-k.

The compressed-vector ANN path (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public): split each d-dim vector
into ``m`` subvectors, quantize each against a ``ksub``-entry codebook,
and search by ADC — per query, precompute the ``m × ksub`` lookup table
of subspace distances, then score a compressed code by summing ``m``
table entries. At 100 TB this is the difference between scanning raw
float vectors (4·d bytes/row) and scanning ``m``-byte codes with the
query LUT broadcast: the corpus-side scan shrinks ~d·4/m ×.

Spark-first shape — NO Python in any per-row path (contrast the Arrow
kernels in `similarity.py`, which carry full vectors; here the codebook
is small and pinned, so everything stays a Catalyst expression):

- **Encode is a map-only codegen projection**: per subspace, squared
  distances to each codebook entry via ``zip_with`` + ordered
  ``aggregate`` fold, argmin by ``array_position(array_min)`` (first
  minimum — deterministic tie-break). One output row per (id, subspace).
- **ADC is one equi-join**: the per-query LUT is an exploded literal
  expression (queries × m × ksub rows, broadcast); codes join it on
  ``(subspace, code)``, one ``groupBy(query, neighbor)`` sums the m
  partial distances, and a per-query rank window cuts top-k. The rank
  orders on the 1e-6-quantized distance (float-sum association order
  differs across engines/partitions) with id tie-break — deterministic.

Codebooks are pinned numpy/py lists ``(m, ksub, dsub)`` — training them
is :func:`similarity.kmeans_centroids`' job, run per subspace.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _shape(codebooks: Sequence) -> tuple[int, int, int]:
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    for cb in codebooks:
        if len(cb) != ksub or any(len(c) != dsub for c in cb):
            raise ValueError("ragged codebook: need uniform (m, ksub, dsub)")
    return m, ksub, dsub


def _sqdist(sub: Column, cent: Sequence[float]) -> Column:
    """Ordered-fold squared L2 distance between a subvector column and one
    literal centroid — ``aggregate`` folds left in element order, so both
    engines (and every partition) compute the identical double."""
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(sub, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(df: DataFrame, codebooks: Sequence,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """PQ-encode vectors: returns one row per ``(id_col, subspace, code)``
    with ``code`` the argmin codebook entry for that subspace (first
    minimum on ties). Vectors shorter than ``m·dsub`` (or null) encode as
    ``code = -1`` in every subspace — corrupt rows stay visible instead
    of vanishing. Map-only; the whole distance/argmin tree is one codegen
    projection."""
    m, ksub, dsub = _shape(codebooks)
    v = F.col(vec_col).cast("array<double>")
    ok = F.size(v) >= m * dsub

    entries = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        dists = F.array(*[_sqdist(sub, codebooks[j][c]) for c in range(ksub)])
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        entries.append(F.struct(F.lit(j).alias("subspace"),
                                F.when(ok, code).otherwise(F.lit(-1))
                                .alias("code")))
    return (df.select(F.col(id_col), F.explode(F.array(*entries)).alias("e"))
            .select(id_col, F.col("e.subspace").alias("subspace"),
                    F.col("e.code").alias("code")))


def pq_adc_topk(queries: DataFrame, codes: DataFrame, codebooks: Sequence,
                k: int = 10, vec_col: str = "embedding",
                query_id: str = "vec_id", code_id: str = "vec_id",
                exclude_self: bool = True) -> DataFrame:
    """Asymmetric-distance top-k: exact query subvectors against the
    compressed corpus codes. Returns ``(query_id, neighbor_id, adc_dist,
    rank)`` with ``rank ≤ k`` per query.

    The per-query LUT (``m × ksub`` squared subspace distances) is an
    exploded literal projection on the (small) query side — Catalyst
    broadcasts it to the codes scan; scoring is ONE equi-join on
    ``(subspace, code)`` + one sum-agg; the rank window partitions by
    query. Codes with ``-1`` (corrupt source vectors) never match the
    LUT and drop out naturally."""
    m, ksub, dsub = _shape(codebooks)
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    v = F.col(vec_col).cast("array<double>")

    lut_entries = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        for c in range(ksub):
            lut_entries.append(F.struct(
                F.lit(j).alias("subspace"), F.lit(c).alias("code"),
                _sqdist(sub, codebooks[j][c]).alias("d")))
    lut = (queries.select(F.col(query_id).alias("query_id"),
                          F.explode(F.array(*lut_entries)).alias("e"))
           .select("query_id", "e.subspace", "e.code", "e.d"))

    cand = (codes.withColumnRenamed(code_id, "neighbor_id")
            .join(lut, ["subspace", "code"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("d").alias("adc_dist"),
                 F.count(F.lit(1)).alias("_m")))
    # codes that matched fewer than m subspaces (corrupt → -1) drop out
    cand = cand.filter(F.col("_m") == m).drop("_m")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    q6 = F.round(F.col("adc_dist") * F.lit(1e6)) / F.lit(1e6)
    w = Window.partitionBy("query_id").orderBy(q6.asc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def formula_codebook(m: int = 8, ksub: int = 16, dsub: int = 8) -> list:
    """Deterministic closed-form codebook for tests/oracles:
    ``C[j][c][t] = ((c·7 + t·3 + j·5) mod 13 − 6) / 4`` — every value an
    exact double, replayable as pure integer arithmetic in SQL."""
    return [[[((c * 7 + t * 3 + j * 5) % 13 - 6) / 4.0
              for t in range(dsub)] for c in range(ksub)] for j in range(m)]


def coarse_assign(df: DataFrame, centroids: Sequence,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  nprobe: int = 1) -> DataFrame:
    """Nearest coarse-centroid list id(s) per vector as pure codegen
    expressions (the Column-expression twin of `similarity.assign_clusters`
    — no Python, fully oracle-replayable under pinned centroids). With
    ``nprobe > 1`` each row explodes to its nprobe nearest lists
    (``array_sort`` on (dist, list) structs — distance-then-id tie-break).
    Returns ``(id_col, list_id)``; short/null vectors get list −1."""
    n_lists = len(centroids)
    dim = len(centroids[0])
    p = max(1, int(nprobe))
    v = F.col(vec_col).cast("array<double>")
    ok = F.size(v) >= dim

    entries = F.array(*[
        F.struct(_sqdist(v, centroids[c]).alias("d"),
                 F.lit(c).alias("c")) for c in range(n_lists)])
    probes = F.slice(F.array_sort(entries), 1, min(p, n_lists))
    lists = F.when(ok, F.transform(probes, lambda s: s["c"])
                   ).otherwise(F.array(F.lit(-1)))
    return (df.select(F.col(id_col), F.explode(lists).alias("list_id"))
            .select(id_col, F.col("list_id").cast("int").alias("list_id")))


def ivfpq_topk(queries: DataFrame, corpus: DataFrame, coarse: Sequence,
               codebooks: Sequence, k: int = 10, nprobe: int = 4,
               vec_col: str = "embedding", query_id: str = "vec_id",
               corpus_id: str = "vec_id",
               exclude_self: bool = True) -> DataFrame:
    """IVF-PQ approximate top-k — the canonical 100-TB ANN composition:
    the corpus lives as (coarse list id, m-byte PQ code); a query probes
    its ``nprobe`` nearest lists and ADC-scores only those candidates.
    Per-query work scales with ``nprobe/n_lists`` of the corpus × m bytes
    per candidate — neither raw vectors nor unprobed lists are touched.

    Everything is codegen + equi-joins: corpus assignment and codes are
    map-only projections (computable once and persisted as a real index —
    see `streaming/ivf.py` for the incremental maintenance pattern);
    probe→list is one equi-join; ADC is the (query, subspace, code) LUT
    join + sum-agg; ranking quantizes to 1e-6 with id tie-break. Returns
    ``(query_id, neighbor_id, adc_dist, rank ≤ k)``. Recall < 1 by
    construction (unprobed lists); codebooks/centroids are pinned inputs
    — train with `similarity.kmeans_centroids`."""
    m, ksub, dsub = _shape(codebooks)
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    assign = (coarse_assign(corpus, coarse, vec_col, corpus_id, nprobe=1)
              .withColumnRenamed(corpus_id, "neighbor_id"))
    codes = (pq_encode(corpus, codebooks, vec_col, corpus_id)
             .withColumnRenamed(corpus_id, "neighbor_id"))
    probes = (coarse_assign(queries, coarse, vec_col, query_id,
                            nprobe=nprobe)
              .withColumnRenamed(query_id, "query_id"))

    cand = probes.join(assign, ["list_id"]).select("query_id", "neighbor_id")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))

    v = F.col(vec_col).cast("array<double>")
    lut_entries = []
    for j in range(m):
        sub = F.slice(v, j * dsub + 1, dsub)
        for c in range(ksub):
            lut_entries.append(F.struct(
                F.lit(j).alias("subspace"), F.lit(c).alias("code"),
                _sqdist(sub, codebooks[j][c]).alias("d")))
    lut = (queries.select(F.col(query_id).alias("query_id"),
                          F.explode(F.array(*lut_entries)).alias("e"))
           .select("query_id", "e.subspace", "e.code", "e.d"))

    scored = (cand.join(codes, ["neighbor_id"])
              .join(lut, ["query_id", "subspace", "code"])
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum("d").alias("adc_dist"),
                   F.count(F.lit(1)).alias("_m"))
              .filter(F.col("_m") == m).drop("_m"))
    q6 = F.round(F.col("adc_dist") * F.lit(1e6)) / F.lit(1e6)
    w = Window.partitionBy("query_id").orderBy(q6.asc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def formula_coarse(n_lists: int = 16, dim: int = 64) -> list:
    """Deterministic closed-form coarse centroids for tests/oracles:
    ``((c·11 + t·7) mod 19 − 9) / 3`` — exact doubles, SQL-replayable."""
    return [[((c * 11 + t * 7) % 19 - 9) / 3.0 for t in range(dim)]
            for c in range(n_lists)]
