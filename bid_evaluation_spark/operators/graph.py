"""Graph operators: PageRank over an edge DataFrame.

Beyond-reference operator (no counterpart in ``/root/reference``): iterative
link analysis is the canonical "driver-coordinated loop over pure DataFrame
rounds" shape — the same execution pattern as the connected-components pass
in :mod:`.dedup`, with lineage truncated every round (localCheckpoint) so the
plan stays flat no matter how many iterations run. At 100 TB the per-round
cost is one equi-join (edges ⋈ ranks on src, both hash-partitioned on the
join key) plus one groupBy(dst) — no collect of ranks or edges, no
cartesian anything; the driver sees only the scalar dangling mass and the
convergence delta per round.

Semantics (the classic formulation, exactly mirrored by the unrolled SQL
oracle in ``__spark_entry__.py``):

    rank₀(v)   = 1 / N
    rankᵢ₊₁(v) = (1-d)/N + d · ( Σ_{(u,v)∈E} rankᵢ(u) · w(u,v)/outw(u)
                                  + dangling_massᵢ / N )

where ``outw(u)`` is u's total out-weight and ``dangling_massᵢ`` the rank
mass sitting on nodes with no out-edges (redistributed uniformly — total
rank stays 1 every round).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: Optional[str] = None, damping: float = 0.85,
             max_iter: int = 10, tol: Optional[float] = None) -> DataFrame:
    """PageRank over a (weighted) directed edge list → ``(node, rank)``.

    ``weight=None`` treats every edge as weight 1 (parallel edges count).
    With ``tol`` set, iteration stops early once the max absolute rank change
    of a round drops below it (one extra tiny join per round to measure);
    otherwise exactly ``max_iter`` rounds run — the mode the SQL oracle
    unrolls.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"),
                     w.alias("_w"))

    nodes = (e.select(F.col("_src").alias("node"))
             .union(e.select(F.col("_dst").alias("node")))
             .distinct().persist())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0).cast("double"))

    outw = e.groupBy("_src").agg(F.sum("_w").alias("_ow")).persist()
    # edges pre-normalized once: contribution factor w/outw never changes
    norm_e = (e.join(outw, on="_src")
              .select("_src", "_dst", (F.col("_w") / F.col("_ow")).alias("_f"))
              .persist())
    has_out = outw.select(F.col("_src").alias("node"))
    # If every node has out-edges, dangling mass is identically 0 — decide
    # ONCE here and skip the per-round anti-join + collect (one Spark action
    # per iteration saved; on small graphs that action is half the runtime).
    any_dangling = outw.count() < n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n).cast("double"))
    base = (1.0 - damping) / n

    for _ in range(max_iter):
        # scalar: rank mass on dangling nodes (no out-edges), redistributed
        if any_dangling:
            dangling = (ranks.join(has_out, on="node", how="left_anti")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                        .collect()[0][0])
        else:
            dangling = 0.0
        contrib = (norm_e.join(ranks, norm_e["_src"] == ranks["node"])
                   .groupBy(F.col("_dst").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("_f")).alias("_c")))
        stepped = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.lit(dangling / n))).alias("rank"),
            )
            # truncate lineage every round — the rank frame feeds the next
            # round's join twice over; without this the plan doubles per
            # iteration (see near_duplicate_clusters)
            .localCheckpoint()
        )
        if tol is not None:
            delta = (stepped.alias("a")
                     .join(ranks.alias("b"), on="node")
                     .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
                     .collect()[0][0])
            ranks = stepped
            if delta is not None and delta < tol:
                break
        else:
            ranks = stepped

    nodes.unpersist()
    outw.unpersist()
    norm_e.unpersist()
    return ranks


def triangle_counts(edges: DataFrame, a_col: str = "a", b_col: str = "b"
                    ) -> DataFrame:
    """Per-node triangle counts and local clustering coefficients over an
    undirected simple graph (``(a, b)`` pairs; direction/duplicates/self
    -loops are normalized away first).

    The classic degree-ordered algorithm, join-shaped: orient every edge
    from its lower-(degree, id) endpoint to the higher one, join oriented
    edges with themselves on the wedge midpoint, then verify the closing
    edge with one more equi-join. Degree orientation bounds each node's
    out-degree by O(sqrt(m)) on any graph (arboricity bound), so the
    wedge join's fan-out — the term that explodes on celebrity nodes in
    the naive formulation — stays polynomial-free at scale. Three
    equi-joins + aggregations, no cartesian.

    Returns ``(node, degree, triangles, clustering_coeff)`` for every
    node with at least one edge (coefficient null when degree < 2).
    """
    a, b = F.col(a_col), F.col(b_col)
    und = (edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
           .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
           .distinct()
           .persist())
    deg = (und.select(F.col("u").alias("n"))
           .unionAll(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
           .persist())

    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    keyed = und.join(du, "u").join(dv, "v")
    lower_first = ((F.col("du") < F.col("dv"))
                   | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))))
    oriented = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("d"))

    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = (e1.join(e2, F.col("e1.d") == F.col("e2.s"))
              .select(F.col("e1.s").alias("x"), F.col("e1.d").alias("y"),
                      F.col("e2.d").alias("z")))
    closing = und.select(F.least("u", "v").alias("cu"),
                         F.greatest("u", "v").alias("cv"))
    tris = wedges.join(
        closing, (F.least("x", "z") == F.col("cu"))
        & (F.greatest("x", "z") == F.col("cv"))).select("x", "y", "z")

    per_node = (tris.select(F.explode(F.array("x", "y", "z")).alias("n"))
                .groupBy("n").agg(F.count(F.lit(1)).alias("triangles")))
    out = (deg.join(per_node, "n", "left")
           .select(F.col("n").alias("node"), F.col("deg").alias("degree"),
                   F.coalesce("triangles", F.lit(0)).cast("long")
                   .alias("triangles"),
                   F.when(F.col("deg") >= 2,
                          2.0 * F.coalesce("triangles", F.lit(0))
                          / (F.col("deg") * (F.col("deg") - 1)))
                   .alias("clustering_coeff")))
    # und/deg stay persisted: each feeds 2-3 branches of the RETURNED lazy
    # plan (unpersisting here, before materialization, would cache nothing
    # — NOTES lesson #8); both are O(edges)/O(nodes) key-only frames.
    return out
