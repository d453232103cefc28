"""Late-interaction retrieval (ColBERT-style MaxSim) — the modern
middle ground between single-vector ANN (cheap, lossy) and
cross-encoders (accurate, unscalable): documents and queries keep
PER-TOKEN embeddings, and the score is

    MaxSim(q, d) = Σ_{query token t}  max_{doc token u} cos(t, u).

A 100-TB retrieval/dedup pipeline uses this as the rerank stage over
ANN candidates, so both shapes live here:

- **brute** (`n_candidates=0`): query tokens broadcast against the
  full doc-token table — the Q×N map-side shape shared with
  :func:`~.similarity.cosine_topk`, exact and shuffle-light (two
  partial-aggregated groupBys: per-(q,d,qt) max, per-(q,d) sum);
- **two-phase** (`n_candidates>0`): mean-pool tokens to one vector
  per doc/query, prune to ``n_candidates`` per query with pooled
  cosine, then run exact MaxSim ONLY on the candidate pairs — the
  at-scale path (pooled pruning is the standard ColBERT serving
  trick; recall loss is bounded by pooling quality, not by MaxSim).

All scoring is native Column math (``zip_with``/``aggregate``) — zero
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v * v))


def _cos(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _sum_pool(tokens: DataFrame, id_col: str,
              vec_col: str) -> DataFrame:
    """Sum-pooled vector per id (cosine is scale-invariant, so the
    sum pool ranks identically to the mean pool). posexplode →
    per-dimension sum → re-assemble sorted by position, so the array
    order never depends on shuffle arrival."""
    ex = tokens.select(F.col(id_col),
                       F.posexplode(F.col(vec_col))
                       .alias("_pos", "_val"))
    per_dim = (ex.groupBy(id_col, "_pos")
               .agg(F.sum("_val").alias("_s")))
    return (per_dim.groupBy(id_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
                lambda st: st["_s"]).alias("pooled")))


def pooled_candidates(doc_tokens: DataFrame, query_tokens: DataFrame,
                      n_candidates: int, *, doc_id: str = "doc_id",
                      query_id: str = "query_id",
                      vec_col: str = "vec",
                      exclude_self: bool = False) -> DataFrame:
    """Phase 1 of the two-phase path: the ``n_candidates`` best
    pooled-cosine docs per query (ties by ascending doc id) →
    ``(_q, _d)``. BY CONSTRUCTION the output is ≤ n_candidates rows
    per query (row_number cutoff), so the exact-MaxSim rerank joined
    onto it never widens beyond ``n_candidates × query_tokens ×
    doc_tokens_per_doc`` rows per query regardless of corpus size —
    the bound the scaling family measures and a test asserts."""
    dp = _sum_pool(doc_tokens, doc_id, vec_col).select(
        F.col(doc_id).alias("_d"), F.col("pooled").alias("_dp"))
    qp = _sum_pool(query_tokens, query_id, vec_col).select(
        F.col(query_id).alias("_q"), F.col("pooled").alias("_qp"))
    sims = dp.crossJoin(F.broadcast(qp)).select(
        "_q", "_d", _cos(F.col("_qp"), F.col("_dp")).alias("_s"))
    if exclude_self:
        sims = sims.filter(F.col("_q") != F.col("_d"))
    w0 = Window.partitionBy("_q").orderBy(F.desc("_s"), F.asc("_d"))
    return (sims.withColumn("_r", F.row_number().over(w0))
            .filter(F.col("_r") <= n_candidates)
            .select("_q", "_d"))


def maxsim_topk(doc_tokens: DataFrame, query_tokens: DataFrame,
                k: int = 5, *, n_candidates: int = 0,
                doc_id: str = "doc_id", query_id: str = "query_id",
                token_col: str = "token_idx",
                vec_col: str = "vec",
                exclude_self: bool = False) -> DataFrame:
    """Top-k docs per query by MaxSim → ``(query_id, doc_id, maxsim,
    rnk)``, rank ties broken by ascending doc id (deterministic).
    ``query_tokens`` must carry ``token_col`` distinguishing the
    query's tokens (the outer Σ runs over it).

    ``n_candidates>0`` enables the pooled-prune two-phase path; the
    candidate set per query is the ``n_candidates`` best pooled-cosine
    docs (ties by id), then exact MaxSim reranks them."""
    d = doc_tokens.select(F.col(doc_id).alias("_d"),
                          F.col(vec_col).alias("_dv"))
    q = query_tokens.select(F.col(query_id).alias("_q"),
                            F.col(token_col).alias("_qt"),
                            F.col(vec_col).alias("_qv"))

    if n_candidates > 0:
        cand = pooled_candidates(doc_tokens, query_tokens,
                                 n_candidates, doc_id=doc_id,
                                 query_id=query_id, vec_col=vec_col,
                                 exclude_self=exclude_self)
        pairs = d.join(cand, "_d").join(F.broadcast(q), "_q")
    else:
        pairs = d.crossJoin(F.broadcast(q))
        if exclude_self:
            pairs = pairs.filter(F.col("_q") != F.col("_d"))

    per_qt = (pairs
              .select("_q", "_d", "_qt",
                      _cos(F.col("_qv"), F.col("_dv")).alias("_c"))
              .groupBy("_q", "_d", "_qt")
              .agg(F.max("_c").alias("_m")))
    scores = (per_qt.groupBy("_q", "_d")
              .agg(F.sum("_m").alias("maxsim")))
    w = Window.partitionBy("_q").orderBy(F.desc("maxsim"), F.asc("_d"))
    return (scores.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("_q").alias(query_id),
                    F.col("_d").alias(doc_id),
                    "maxsim", F.col("rnk").cast("long").alias("rnk")))
