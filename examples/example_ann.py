# example_ann.py — the ANN strategy ladder on one corpus (beyond reference)
"""Exact cosine top-k is the gold standard and the scale ceiling; LSH,
IVF, and IVF-PQ trade recall for corpus-scan economics. This demo runs
all four on the same embeddings and prints recall@5 against exact —
the decision table for picking a search path at a given scale.

Scale intuition: exact scans every vector for every query; LSH/IVF scan
one bucket/probed lists; IVF-PQ scans probed lists of m-byte codes
(≈32× smaller rows at d=64, m=8)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.pq import ivfpq_topk
from bid_evaluation_spark.operators.similarity import (
    cosine_topk, ivf_topk, lsh_topk)
from bid_evaluation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
K = 5

spark = get_spark("example-ann", master="local[4]", shuffle_partitions=4)
from bid_evaluation_spark.operators.embeddings import l2_normalize

# L2-normalize once so every strategy ranks the same geometry (on unit
# vectors, L2 order == cosine order — this is what makes PQ's L2-based
# ADC comparable to the cosine baseline)
emb = l2_normalize(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))     .drop("norm")
queries = emb.filter(F.col("vec_id") < 20)


def pairs(df, nid="neighbor_id"):
    return {(r["query_id"], r[nid]) for r in df.collect()}


t0 = time.time()
exact = pairs(cosine_topk(queries, emb, k=K))
t_exact = time.time() - t0

# train the IVF-PQ index: coarse centroids on full vectors, one k-means
# per subspace for the codebooks (the documented training path)
from bid_evaluation_spark.operators.similarity import kmeans_centroids

t0 = time.time()
coarse = [list(c) for c in kmeans_centroids(emb, "embedding", k=8, seed=1)]
codebooks = []
for j in range(8):
    sub = emb.select(F.slice(F.col("embedding").cast("array<double>"),
                             j * 8 + 1, 8).alias("sub"))
    codebooks.append([list(c) for c in
                      kmeans_centroids(sub, "sub", k=16, seed=10 + j)])
t_train = time.time() - t0
print(f"(IVF-PQ index training: {t_train:.2f}s — one-off, persisted in "
      "production)")

candidates = {
    "lsh (4 planes, 4 tables)": lambda: lsh_topk(
        queries, emb, k=K, num_planes=4, num_tables=4),
    "ivf (16 lists, probe 4)": lambda: ivf_topk(
        queries, emb, k=K, n_clusters=16, nprobe=4),
    "ivfpq (8 lists, trained 8x16 pq)": lambda: ivfpq_topk(
        queries, emb, coarse, codebooks, k=K, nprobe=4),
}

print(f"{'strategy':34s} {'recall@5':>8s} {'sec':>6s}")
print(f"{'exact cosine (baseline)':34s} {'1.000':>8s} {t_exact:6.2f}")
for name, fn in candidates.items():
    t0 = time.time()
    got = pairs(fn())
    dt = time.time() - t0
    recall = len(got & exact) / max(1, len(exact))
    print(f"{name:34s} {recall:8.3f} {dt:6.2f}")

# the standard refinement: wide compressed candidate sweep (cheap),
# exact re-rank on just those candidates (tiny)
from pyspark.sql import Window

t0 = time.time()
cand = ivfpq_topk(queries, emb, coarse, codebooks, k=20, nprobe=8)
qv = emb.select(F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("qe"))
nv = emb.select(F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("ne"))
dot = F.aggregate(F.zip_with(F.col("qe"), F.col("ne"),
                             lambda a, b: a * b),
                  F.lit(0.0), lambda s, x: s + x)
w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                           F.asc("neighbor_id"))
rer = (cand.join(qv, "query_id").join(nv, "neighbor_id")
       .withColumn("cos", dot)
       .withColumn("rk", F.row_number().over(w)).filter("rk <= 5"))
got = pairs(rer)
dt = time.time() - t0
recall = len(got & exact) / max(1, len(exact))
print(f"{'ivfpq k=20 -> exact re-rank top-5':34s} {recall:8.3f} {dt:6.2f}")

print("\nIVF-PQ alone ranks by COMPRESSED distance — its row shows the")
print("candidate economics; the re-rank row is the production shape:")
print("compressed sweep for candidates, exact distance on ~k of them.")
spark.stop()
