"""Round-7 wave: winnowing fingerprints, corpus overlap, script profile,
MMR re-ranking."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_winnow_coverage_theorem_and_edges(spark):
    """Any shared token run of k+w-1 yields >= 1 shared fingerprint
    (Schleimer et al. guarantee); short docs degrade gracefully."""
    from bid_evaluation_spark.operators.text import winnow_fingerprints

    rows = [(1, "a b c d e f g h"),
            (2, "x y a b c d e f"),       # shares run "a b c d e f" (k+w-1=6)
            (3, "a b"),                    # < k tokens -> []
            (4, "p q r"),                  # exactly k tokens -> 1 gram
            (5, ""), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["w"] for r in
           df.select("doc_id", winnow_fingerprints(F.col("text"), k=3, w=4)
                     .alias("w")).collect()}
    assert set(out[1]) & set(out[2]), "winnowing coverage theorem violated"
    assert out[3] == [] and out[5] == [] and out[6] == []
    assert len(out[4]) == 1  # single gram -> its hash is the fingerprint
    # density: ~2/(w+1) of grams selected, always >= 1 for >= k tokens
    assert 1 <= len(out[1]) <= 6
    with pytest.raises(ValueError):
        df.select(winnow_fingerprints(F.col("text"), k=0))


def test_corpus_overlap_counts_and_containment(spark):
    from bid_evaluation_spark.operators.dedup import corpus_overlap

    a = spark.createDataFrame([(1, "a b c d e"), (2, "f g h i")],
                              "doc_id long, text string")
    b = spark.createDataFrame([(1, "a b c d"), (2, "z z z z")],
                              "doc_id long, text string")
    r = corpus_overlap(a, b, k=3).collect()[0]
    # a: {abc,bcd,cde,fgh,ghi}; b: {abc,bcd,zzz}; common: {abc,bcd}
    assert (r["shingles_a"], r["shingles_b"], r["shingles_common"]) == (5, 3, 2)
    assert r["jaccard"] == pytest.approx(2 / 6, abs=1e-4)
    assert r["containment_a_in_b"] == pytest.approx(2 / 5, abs=1e-4)
    assert r["containment_b_in_a"] == pytest.approx(2 / 3, abs=1e-4)
    # disjoint corpora
    c = spark.createDataFrame([(9, "q r s t")], "doc_id long, text string")
    r2 = corpus_overlap(a, c, k=3).collect()[0]
    assert r2["shingles_common"] == 0 and r2["jaccard"] == 0.0
    with pytest.raises(ValueError):
        corpus_overlap(a, b, k=0)


def test_script_profile_classes_and_dominant(spark):
    from bid_evaluation_spark.operators.text import script_profile

    rows = [(1, "hello world 123"), (2, "Привет мир"), (3, "你好世界"),
            (4, "!!! ???"), (5, None), (6, "abc абв")]  # latin/cyr tie -> latin
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[1]["dominant_script"] == "latin" and out[1]["n_digit"] == 3
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[3]["dominant_script"] == "cjk" and out[3]["n_cjk"] == 4
    assert out[4]["dominant_script"] == "other"
    assert out[5]["dominant_script"] == "other" and out[5]["n_other"] is None
    # declaration-order tie: 3 latin vs 3 cyrillic -> latin (first maximal)
    assert out[6]["n_latin"] == 3 and out[6]["n_cyrillic"] == 3
    assert out[6]["dominant_script"] == "latin"
    # counts partition the text
    r = out[1]
    known = sum(r[f"n_{c}"] for c in ("latin", "digit", "cyrillic", "greek",
                                      "arabic", "hebrew", "devanagari",
                                      "cjk"))
    assert known + r["n_other"] == r["n_chars"]


def test_mmr_diversifies_and_bounds(spark):
    from bid_evaluation_spark.operators.retrieval import mmr_rerank

    cands = [
        (1, 10, 0.95, [1.0, 0.0, 0.0]),
        (1, 11, 0.94, [0.999, 0.01, 0.0]),   # near-dup of 10
        (1, 12, 0.80, [0.0, 1.0, 0.0]),      # diverse
        (1, 13, 0.70, [0.0, 0.0, 1.0]),      # diverse
        (2, 20, 0.50, [1.0, 1.0, 0.0]),      # lone candidate
    ]
    df = spark.createDataFrame(
        cands, "query_id long, doc_id long, rel double, "
               "embedding array<double>")
    out = mmr_rerank(df, select_k=3, lam=0.5).orderBy(
        "query_id", "rank").collect()
    got = [(r["query_id"], r["rank"], r["doc_id"]) for r in out]
    # rank 1 = max relevance; the near-duplicate is pushed below the
    # diverse candidates; short queries emit what they have
    assert got == [(1, 1, 10), (1, 2, 12), (1, 3, 13), (2, 1, 20)]

    # lam=1 degenerates to pure relevance ranking
    pure = mmr_rerank(df.filter(F.col("query_id") == 1), select_k=3,
                      lam=1.0).orderBy("rank").collect()
    assert [r["doc_id"] for r in pure] == [10, 11, 12]

    with pytest.raises(ValueError):
        mmr_rerank(df, select_k=0)
    with pytest.raises(ValueError):
        mmr_rerank(df, lam=1.5)
