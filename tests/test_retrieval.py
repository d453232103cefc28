"""BM25 / TF-IDF retrieval: hand-computed scores on a tiny corpus plus
contract checks (determinism, stats reuse)."""

import math

import pytest

from bid_evaluation_spark.operators import retrieval as R


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )


def test_corpus_term_stats(docs):
    s = R.corpus_term_stats(docs, ["apple", "cherry", "missing"])
    assert s["n_docs"] == 4
    assert s["avgdl"] == pytest.approx((3 + 2 + 4 + 3) / 4)
    assert s["df"] == {"apple": 1, "cherry": 2, "missing": 0}


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(docs):
    r = {x["doc_id"]: x["bm25"] for x in R.bm25_scores(docs, ["apple"]).collect()}
    avgdl = 3.0
    assert r[1] == pytest.approx(_bm25(2, 1, 4, 3, avgdl))
    assert r[2] == 0.0 and r[4] == 0.0


def test_bm25_multi_term_sum(docs):
    one = {x["doc_id"]: x["bm25"]
           for x in R.bm25_scores(docs, ["banana"]).collect()}
    two = {x["doc_id"]: x["bm25"]
           for x in R.bm25_scores(docs, ["banana", "cherry"]).collect()}
    ch = {x["doc_id"]: x["bm25"]
          for x in R.bm25_scores(docs, ["cherry"]).collect()}
    for d in one:
        assert two[d] == pytest.approx(one[d] + ch[d])


def test_bm25_topk_order_and_tiebreak(docs):
    top = R.bm25_topk(docs, ["cherry"], k=3).collect()
    assert [r["doc_id"] for r in top[:2]] == [3, 2]  # tf 3 beats tf 1
    # zero scorers tie → doc_id ascending
    assert top[2]["doc_id"] == 1 and top[2]["bm25"] == 0.0


def test_bm25_stats_reuse(docs):
    s = R.corpus_term_stats(docs, ["apple"])
    a = R.bm25_scores(docs, ["apple"], stats=s).collect()
    b = R.bm25_scores(docs, ["apple"]).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_tfidf_hand_computed(docs):
    r = {x["doc_id"]: x["tfidf"]
         for x in R.tfidf_scores(docs, ["cherry"]).collect()}
    idf = math.log(4 / (1 + 2))
    assert r[3] == pytest.approx(math.log(1 + 3) * idf)
    assert r[1] == 0.0


def test_bm25_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert R.bm25_scores(df, ["x"]).count() == 0


class TestRRFFusion:
    """Reciprocal Rank Fusion (retrieval.py::rrf_fuse)."""

    def _lists(self, spark):
        a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                                  "doc_id long, rank long")
        b = spark.createDataFrame([(3, 1), (2, 2), (9, 3)],
                                  "doc_id long, rank long")
        return a, b

    def test_known_values(self, spark):
        from bid_evaluation_spark.operators.retrieval import rrf_fuse

        a, b = self._lists(spark)
        rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
        import pytest as _pt
        # doc 2 and doc 3 both appear in both lists
        assert rows[2]["rrf_score"] == _pt.approx(2 / 62.0)
        assert rows[3]["rrf_score"] == _pt.approx(1 / 63.0 + 1 / 61.0)
        assert rows[1]["rrf_score"] == _pt.approx(1 / 61.0)
        assert rows[2]["n_lists"] == 2 and rows[1]["n_lists"] == 1
        assert rows[3]["best_rank"] == 1

    def test_ordering_and_topn(self, spark):
        from bid_evaluation_spark.operators.retrieval import rrf_fuse

        a, b = self._lists(spark)
        out = rrf_fuse([a, b], k=60, top_n=2).collect()
        assert len(out) == 2
        # consensus docs (2, 3) beat single-list docs
        assert {r["doc_id"] for r in out} == {2, 3}
        scores = [r["rrf_score"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_single_list_is_monotone(self, spark):
        from bid_evaluation_spark.operators.retrieval import rrf_fuse

        a, _ = self._lists(spark)
        out = rrf_fuse([a], k=10).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]

    def test_validation(self, spark):
        from bid_evaluation_spark.operators.retrieval import rrf_fuse
        import pytest as _pt

        a, _ = self._lists(spark)
        with _pt.raises(ValueError):
            rrf_fuse([], k=60)
        with _pt.raises(ValueError):
            rrf_fuse([a], k=0)
