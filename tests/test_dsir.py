"""DSIR importance weighting + Gumbel resampling (operators/dsir.py).

Beyond-reference: data selection for pretraining mixtures
(arXiv:2302.03169)."""

from __future__ import annotations

import pytest

from bid_evaluation_spark.operators.dsir import (
    bucket_counts,
    dsir_logweights,
    dsir_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpora(spark):
    """Raw corpus mixing two sub-distributions; target matches one."""
    target = _docs(spark, [(100 + i, "alpha beta gamma alpha beta")
                           for i in range(4)])
    raw = _docs(spark, [(0, "alpha beta gamma beta"),
                        (1, "alpha beta alpha gamma"),
                        (2, "zebra quark xylo zebra"),
                        (3, "quark zebra xylo quark"),
                        (4, "")])
    return raw, target


def test_target_like_docs_weigh_higher(spark):
    raw, target = _corpora(spark)
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_logweights(raw, target, buckets=512).collect()}
    assert min(w[0], w[1]) > max(w[2], w[3])
    # feature-free doc keeps its row at exactly 0.0
    assert w[4] == 0.0


def test_identical_corpora_zero_weights(spark):
    """raw == target ⇒ every bucket ratio is exactly ln(x) − ln(x) = 0."""
    raw, _ = _corpora(spark)
    both = raw.filter("text <> ''")
    w = dsir_logweights(both, both, buckets=256).collect()
    assert all(r["log_weight"] == 0.0 for r in w)


def test_bucket_counts_bounded_and_bagged(spark):
    df = _docs(spark, [(0, "a a b")])
    rows = bucket_counts(df, ns=(1,), buckets=64).collect()
    assert sum(r["cnt"] for r in rows) == 3  # bag semantics: dup kept
    assert all(0 <= r["bucket"] < 64 for r in rows)


def test_sample_deterministic_and_biased(spark):
    raw, target = _corpora(spark)
    s1 = [r["doc_id"] for r in dsir_sample(raw, target, k=2,
                                           buckets=512).collect()]
    s2 = [r["doc_id"] for r in dsir_sample(raw, target, k=2,
                                           buckets=512).collect()]
    assert s1 == s2
    # the two target-like docs dominate a k=2 cut on this wide margin
    assert set(s1) <= {0, 1, 4}


def test_sample_edge_cases(spark):
    raw, target = _corpora(spark)
    assert dsir_sample(raw, target, k=0).count() == 0
    assert dsir_sample(raw, target, k=99).count() == raw.count()
    with pytest.raises(ValueError):
        dsir_sample(raw, target, k=-1)
    with pytest.raises(ValueError):
        dsir_logweights(raw, target, buckets=1)


def test_map_engine_matches_join_engine(spark, monkeypatch):
    # r13 dual engine: bounded-bucket literal-map scoring (zero joins)
    # vs the persisted-proxy join route — identical after the operator
    # contract's 4-decimal rounding (raw doubles differ ~1e-15 from sum
    # order / libm, which the oracle already tolerates)
    from bid_evaluation_spark.operators.cache import release_all
    raw, target = _corpora(spark)

    def rounded(rows):
        return sorted((r["doc_id"], r["n_features"],
                       round(r["log_weight"], 4)) for r in rows)

    m = rounded(dsir_logweights(raw, target, buckets=256).collect())
    monkeypatch.setenv("SPARK_GRAFT_FORCE_DISTRIBUTED", "1")
    j = rounded(dsir_logweights(raw, target, buckets=256).collect())
    release_all()
    assert m == j
    sm = [r["doc_id"] for r in dsir_sample(raw, target, k=3,
                                           buckets=256).collect()]
    release_all()
    monkeypatch.delenv("SPARK_GRAFT_FORCE_DISTRIBUTED")
    assert sm == [r["doc_id"] for r in dsir_sample(raw, target, k=3,
                                                   buckets=256).collect()]
