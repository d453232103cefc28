"""PageRank: analytic fixed points, numpy power-iteration parity, dangling
mass, weights, and early stop."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bid_evaluation_spark.operators.graph import pagerank


def _np_pagerank(nodes, edges, damping=0.85, iters=10):
    """Reference power iteration with the exact same formula."""
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, d, w in edges:
        outw[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outw == 0].sum()
        contrib = np.zeros(n)
        for s, d, w in edges:
            contrib[idx[d]] += r[idx[s]] * (w / outw[idx[s]])
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    return {r["node"]: r["rank"]
            for r in pagerank(df, weight="w", **kw).collect()}


def test_cycle_is_uniform(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    got = _run(spark, edges, max_iter=5)
    for v in "abc":
        assert got[v] == pytest.approx(1 / 3, abs=1e-12)


def test_matches_numpy_power_iteration(spark):
    edges = [("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0),
             ("c", "a", 1.0), ("d", "a", 1.0), ("b", "d", 3.0)]
    nodes = ["a", "b", "c", "d"]
    want = _np_pagerank(nodes, edges, iters=7)
    got = _run(spark, edges, max_iter=7)
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_redistributed(spark):
    # b has no out-edges: its rank must be redistributed, total stays 1
    edges = [("a", "b", 1.0), ("c", "b", 1.0)]
    want = _np_pagerank(["a", "b", "c"], edges, iters=6)
    got = _run(spark, edges, max_iter=6)
    for v in "abc":
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_unweighted_counts_parallel_edges(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, max_iter=4).collect()}
    want = _np_pagerank(["a", "b", "c"],
                        [("a", "b", 2.0), ("a", "c", 1.0)], iters=4)
    for v in "abc":
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_tol_early_stop_matches_converged(spark):
    edges = [("a", "b", 1.0), ("b", "a", 1.0), ("b", "c", 1.0),
             ("c", "a", 1.0)]
    full = _run(spark, edges, max_iter=60)
    early = _run(spark, edges, max_iter=60, tol=1e-10)
    for v in "abc":
        assert early[v] == pytest.approx(full[v], abs=1e-8)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string, w double")
    assert pagerank(df, weight="w").count() == 0


class TestTriangleCounts:
    def _brute(self, edges):
        from itertools import combinations
        adj = {}
        und = set()
        for a, b in edges:
            if a == b:
                continue
            und.add((min(a, b), max(a, b)))
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        tri = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            for x, y in combinations(sorted(nbrs), 2):
                if y in adj.get(x, ()):
                    tri[n] += 1
        out = {}
        for n in adj:
            d = len(adj[n])
            cc = 2.0 * tri[n] / (d * (d - 1)) if d >= 2 else None
            out[n] = (d, tri[n], cc)
        return out

    def test_crafted_and_random(self, spark):
        import random

        from bid_evaluation_spark.operators.graph import triangle_counts

        crafted = [(1, 2), (2, 3), (1, 3),          # triangle
                   (3, 4), (4, 5),                  # tail (no triangle)
                   (2, 1), (1, 1),                  # dup direction + loop
                   (6, 7), (7, 8), (6, 8), (6, 9), (7, 9), (8, 9)]  # K4
        rng = random.Random(3)
        rand = [(rng.randint(0, 25), rng.randint(0, 25)) for _ in range(150)]
        for edges in (crafted, rand):
            df = spark.createDataFrame(edges, "a long, b long")
            got = {r["node"]: (r["degree"], r["triangles"],
                               r["clustering_coeff"])
                   for r in triangle_counts(df, "a", "b").collect()}
            want = self._brute(edges)
            assert set(got) == set(want)
            for n in want:
                d, t, cc = want[n]
                gd, gt, gcc = got[n]
                assert (gd, gt) == (d, t), n
                if cc is None:
                    assert gcc is None
                else:
                    assert gcc == pytest.approx(cc, abs=1e-12)

    def test_k4_counts(self, spark):
        from bid_evaluation_spark.operators.graph import triangle_counts

        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        df = spark.createDataFrame(k4, "a long, b long")
        rows = triangle_counts(df, "a", "b").collect()
        assert all(r["triangles"] == 3 and r["degree"] == 3
                   and r["clustering_coeff"] == 1.0 for r in rows)
