"""Embedding maintenance ops (L2 normalize, int8 quantize/dequantize) and
the split/exact-k sampling operators."""

import math

import pytest
from pyspark.sql import functions as F

from bid_evaluation_spark.operators import embeddings as E
from bid_evaluation_spark.operators.pipeline import sample_exact_k, train_test_split


@pytest.fixture
def vecs(spark):
    return spark.createDataFrame(
        [
            (1, [3.0, 4.0]),
            (2, [0.0, 0.0]),
            (3, [-1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )


def by_id(df, key="vec_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_l2_normalize(vecs):
    r = by_id(E.l2_normalize(vecs))
    assert r[1]["norm"] == pytest.approx(5.0)
    assert r[1]["embedding"] == pytest.approx([0.6, 0.8])
    assert r[2]["embedding"] == [0.0, 0.0]  # zero vector untouched
    assert r[3]["norm"] == pytest.approx(math.sqrt(2))


def test_quantize_roundtrip_and_bound(vecs):
    q = E.quantize_int8(vecs)
    d = E.dequantize_int8(q)
    err = by_id(E.quantization_error(d))
    for i in (1, 2, 3):
        scale = err[i]["q_scale"]
        assert err[i]["max_abs_err"] <= scale / 2 + 1e-12
    r = by_id(q)
    assert r[1]["q_embedding"] == [round(3.0 / (4.0 / 127)), 127]
    assert r[2]["q_scale"] == 1.0 and r[2]["q_embedding"] == [0, 0]
    assert max(abs(v) for row in by_id(q).values()
               for v in row["q_embedding"]) <= 127


def test_quantize_keeps_payload(vecs):
    cols = E.quantize_int8(vecs).columns
    assert cols == ["vec_id", "embedding", "q_embedding", "q_scale"]


# --- splits / exact-k ---

@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string")


def test_train_test_split_partition(docs):
    out = train_test_split(docs, seed="s1")
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 200
    assert counts["train"] > counts.get("val", 0)
    # deterministic: same seed, same assignment
    again = train_test_split(docs, seed="s1")
    assert sorted(map(str, out.collect())) == sorted(map(str, again.collect()))


def test_train_test_split_stable_under_growth(docs):
    full = {r["doc_id"]: r["split"]
            for r in train_test_split(docs, seed="g").collect()}
    half = {r["doc_id"]: r["split"]
            for r in train_test_split(docs.filter("doc_id < 100"),
                                      seed="g").collect()}
    assert all(full[d] == s for d, s in half.items())


def test_train_test_split_validation(docs):
    with pytest.raises(ValueError):
        train_test_split(docs, {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError):
        train_test_split(docs, {"only": 1.0})


def test_sample_exact_k(docs):
    s = sample_exact_k(docs, 17, seed="k")
    assert s.count() == 17
    assert s.columns == docs.columns
    # deterministic + nested redraws differ
    s2 = sample_exact_k(docs, 17, seed="k")
    assert sorted(r["doc_id"] for r in s.collect()) == \
           sorted(r["doc_id"] for r in s2.collect())
    other = sample_exact_k(docs, 17, seed="other")
    assert sorted(r["doc_id"] for r in other.collect()) != \
           sorted(r["doc_id"] for r in s.collect())


def test_sample_exact_k_edges(docs):
    assert sample_exact_k(docs, 0).count() == 0
    assert sample_exact_k(docs, 1000).count() == 200  # k > n → all rows
    with pytest.raises(ValueError):
        sample_exact_k(docs, -1)
