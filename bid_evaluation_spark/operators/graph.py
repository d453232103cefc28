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


def textrank_keywords(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", window: int = 2,
                      n_iters: int = 3, damping: float = 0.85,
                      top_k: int = 5) -> DataFrame:
    """Per-document TextRank keyword extraction (Mihalcea & Tarau, EMNLP
    2004): an undirected co-occurrence graph over each document's token
    sequence (tokens within ``window`` positions share an edge, weight =
    co-occurrence count) scored by ``n_iters`` damped PageRank rounds,
    top ``top_k`` words per document returned as ``(id_col, word, rank,
    rk)``.

    This is the GROUPED variant of :func:`pagerank`: every frame carries
    the document id, so one corpus-wide plan ranks millions of small
    per-document graphs simultaneously — shuffles key on ``(doc, word)``,
    per-round cost is one equi-join plus one groupBy, and no collect
    happens anywhere (the corpus-level model loop in ``pagerank`` would
    need a driver round-trip per document; this needs zero). Undirected
    edges mean no dangling mass — every node has out-weight, so rounds
    are pure joins. Lineage is truncated per round (localCheckpoint, the
    repo-wide iterative-loop rule). Documents with fewer than two tokens
    have no edges and yield no keywords.

    Ranking determinism: the top-k window orders by the 1e-6-ROUNDED
    rank with the word as tiebreak (raw float ranks are a cross-engine
    knife edge); ``rank`` is returned rounded the same way, which is the
    surface the unrolled SQL oracle checks.
    """
    from .text import tokens

    t = tokens(F.lower(F.col(text_col)))
    toks = df.select(F.col(id_col).alias("_doc"), t.alias("_t")) \
        .filter(F.size("_t") >= 2)
    # co-occurrence pairs by zipping shifted slices (NOTES lesson #1: no
    # per-element indexing inside HOF lambdas). zip_with names the lambda
    # output fields explicitly, so no arrays_zip field-name guessing.
    pair_arrays = []
    for off in range(1, window):
        ln = F.size("_t") - off
        pair_arrays.append(
            F.zip_with(F.slice("_t", 1, ln), F.slice("_t", off + 1, ln),
                       lambda a, b: F.struct(a.alias("a"), b.alias("b"))))
    zipped = pair_arrays[0] if len(pair_arrays) == 1 else \
        F.concat(*pair_arrays)
    pairs = (toks.select("_doc", F.explode(zipped).alias("_p"))
             .select("_doc", F.col("_p.a").alias("_a"),
                     F.col("_p.b").alias("_b")))

    und = pairs.select("_doc", F.col("_a").alias("_src"),
                       F.col("_b").alias("_dst")).unionByName(
        pairs.select("_doc", F.col("_b").alias("_src"),
                     F.col("_a").alias("_dst")))
    edges = (und.groupBy("_doc", "_src", "_dst")
             .agg(F.count(F.lit(1)).cast("double").alias("_w")))
    outw = edges.groupBy("_doc", "_src").agg(F.sum("_w").alias("_ow"))
    ne = (edges.join(outw, on=["_doc", "_src"])
          .select("_doc", "_src", "_dst",
                  (F.col("_w") / F.col("_ow")).alias("_f"))
          .persist())
    nodes = edges.select("_doc", F.col("_src").alias("_word")).distinct() \
        .persist()
    nn = nodes.groupBy("_doc").agg(
        F.count(F.lit(1)).cast("double").alias("_n"))

    ranks = (nodes.join(nn, on="_doc")
             .select("_doc", "_word",
                     (F.lit(1.0) / F.col("_n")).alias("_rank"))
             .localCheckpoint())
    base = 1.0 - damping
    for _ in range(n_iters):
        r = (ranks.withColumnRenamed("_doc", "_rd")
             .withColumnRenamed("_word", "_rw"))
        contrib = (ne.join(r, (F.col("_doc") == F.col("_rd"))
                           & (F.col("_src") == F.col("_rw")))
                   .groupBy("_doc", "_dst")
                   .agg(F.sum(F.col("_rank") * F.col("_f")).alias("_c"))
                   .select(F.col("_doc").alias("_cd"),
                           F.col("_dst").alias("_cw"), "_c"))
        ranks = (nodes.join(nn, on="_doc")
                 .join(contrib, (F.col("_doc") == F.col("_cd"))
                       & (F.col("_word") == F.col("_cw")), "left")
                 .select("_doc", "_word",
                         (F.lit(base) / F.col("_n") + F.lit(damping)
                          * F.coalesce(F.col("_c"), F.lit(0.0)))
                         .alias("_rank"))
                 .localCheckpoint())

    from pyspark.sql import Window
    # +1e-3 pre-round nudge (at the 1e6 scale, i.e. +1e-9 on the rank):
    # PageRank values are RATIONALS, so scores landing exactly on a
    # x.5·1e-6 grid boundary are common — there the round() outcome
    # flips with partition-order sum noise (~1e-10 at this scale) and a
    # deterministic oracle disagrees one run in N. The nudge is 10^7×
    # the noise and 500× smaller than the grid step, so it moves every
    # boundary rational deterministically up without affecting any
    # non-boundary value. The SQL oracle applies the identical nudge.
    r6 = F.round(F.col("_rank") * 1e6 + F.lit(1e-3)) / 1e6 + F.lit(0.0)
    w = Window.partitionBy("_doc").orderBy(F.col("_r6").desc(), "_word")
    out = (ranks.withColumn("_r6", r6)
           .withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= top_k)
           .select(F.col("_doc").alias(id_col),
                   F.col("_word").alias("word"),
                   F.col("_r6").alias("rank"),
                   F.col("_rk").cast("long").alias("rk")))
    ne.unpersist()
    nodes.unpersist()
    return out


def bfs_distances(edges: DataFrame, seeds: DataFrame,
                  src: str = "src", dst: str = "dst",
                  node_col: str = "node", max_hops: int = 3,
                  directed: bool = True) -> DataFrame:
    """Min-hop BFS distance from a seed set → ``(node, dist)`` for every
    node reachable within ``max_hops`` (seeds at 0; unreachable nodes
    absent). Frontier-expansion semantics: hop ``h`` adds exactly the
    nodes first reached at ``h``, so the emitted distance IS the minimum
    — no min-aggregation over late arrivals needed.

    Scale shape: each round is one equi-join (frontier ⋈ edges on the
    source key — frontier is the SMALL side and shrinks as the graph
    saturates; AQE broadcasts it) + one distinct + one anti-join against
    the visited set, both keyed on the node. No collect of nodes or
    edges; the driver only drives the loop counter. Lineage truncates
    every round (localCheckpoint) so the plan stays flat for any hop
    count — the same pattern as :func:`pagerank` and the
    connected-components pass in :mod:`.dedup`. Exactly ``max_hops``
    rounds run (an empty frontier still joins cheaply), the mode the
    unrolled SQL oracle replays.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.unionByName(e.select(F.col("_d").alias("_s"),
                                   F.col("_s").alias("_d")))
    e = (e.filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
         .distinct().persist())

    dist = (seeds.select(F.col(node_col).alias("node")).distinct()
            .withColumn("dist", F.lit(0).cast("long"))
            .localCheckpoint())
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        new = (frontier.join(e, frontier["node"] == e["_s"])
               .select(F.col("_d").alias("node")).distinct()
               .join(dist.select("node"), "node", "left_anti")
               .localCheckpoint())
        dist = (dist.unionByName(
            new.withColumn("dist", F.lit(h).cast("long")))
            .localCheckpoint())
        frontier = new
    e.unpersist()
    return dist


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_iter: int = 3,
                      directed: bool = False) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) →
    ``(node, label)`` after exactly ``max_iter`` rounds. Labels start as
    the node's own id; each round every node takes the most frequent
    label among its in-neighbors, ties broken by the SMALLEST label
    (deterministic — the property that lets the unrolled SQL oracle
    replay rounds exactly). Nodes with no in-neighbors keep their label.

    Scale shape per round: one equi-join (edges ⋈ labels on the source,
    both hash-partitioned on it) + one groupBy(node, label) count + one
    per-node argmax window (partition = node, bounded by the node's
    DISTINCT neighbor-label count, ≤ degree). Lineage truncates every
    round (localCheckpoint), same as :func:`pagerank`. Community
    detection for near-dup clusters where connected components
    over-merge via hub nodes.
    """
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.unionByName(e.select(F.col("_d").alias("_s"),
                                   F.col("_s").alias("_d")))
    e = (e.filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
         .distinct().persist())
    nodes = (e.select(F.col("_s").alias("node"))
             .unionByName(e.select(F.col("_d").alias("node")))
             .distinct().persist())

    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("_n").orderBy(F.col("_c").desc(),
                                         F.col("label").asc())
    for _ in range(max_iter):
        votes = (e.join(labels, e["_s"] == labels["node"])
                 .groupBy(F.col("_d").alias("_n"), "label")
                 .agg(F.count(F.lit(1)).alias("_c")))
        best = (votes.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(F.col("_n").alias("node"),
                        F.col("label").alias("_new")))
        labels = (nodes.join(best, "node", "left")
                  .select("node",
                          F.coalesce(F.col("_new"),
                                     F.col("node")).alias("label"))
                  .localCheckpoint())
    e.unpersist()
    nodes.unpersist()
    return labels


def k_core(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
           n_rounds: Optional[int] = None) -> DataFrame:
    """k-core decomposition (undirected): iteratively peel nodes of
    degree < k until the remaining subgraph has min degree ≥ k; returns
    the survivors as ``(node, degree)`` (degree WITHIN the core).

    ``n_rounds=None`` peels to the fixpoint (one driver-side scalar
    count per round decides convergence); a fixed ``n_rounds`` runs
    exactly that many peels — the mode the unrolled SQL oracle replays
    (a partial peel is a well-defined superset of the core).

    Scale shape per peel: one degree groupBy + two semi-joins filtering
    the edge list to surviving endpoints — all keyed on the node /
    endpoint columns, no collect of nodes or edges, lineage truncated
    per round. Peels needed in practice ≪ nodes (each round removes
    whole degree-layers at once).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    e = (e.unionByName(e.select(F.col("_d").alias("_s"),
                                F.col("_s").alias("_d")))
         .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull()
                 & (F.col("_s") != F.col("_d")))
         .distinct().localCheckpoint())

    def deg(ed):
        return ed.groupBy(F.col("_s").alias("node")).agg(
            F.count(F.lit(1)).cast("long").alias("degree"))

    rounds = 0
    while True:
        d = deg(e)
        keep = d.filter(F.col("degree") >= k).select("node")
        rounds += 1
        if n_rounds is not None:
            e = (e.join(keep, e["_s"] == keep["node"], "left_semi")
                 .join(keep, e["_d"] == keep["node"], "left_semi")
                 .localCheckpoint())
            if rounds >= n_rounds:
                return deg(e)
            continue
        n_before = e.count()
        e2 = (e.join(keep, e["_s"] == keep["node"], "left_semi")
              .join(keep, e["_d"] == keep["node"], "left_semi")
              .localCheckpoint())
        if e2.count() == n_before:
            return deg(e2)
        e = e2


def link_prediction(incidence: DataFrame, container_col: str,
                    node_col: str, max_container_size: int = 64,
                    min_common: int = 1) -> DataFrame:
    """Link-prediction scores between nodes that share containers, from a
    bipartite incidence table (container, node) → ``(node_a, node_b,
    common, adamic_adar, jaccard)`` with ``node_a < node_b``.

    Classic neighborhood scores (Liben-Nowell & Kleinberg CIKM 2003)
    computed on the bipartite projection: ``common`` = #shared
    containers, ``adamic_adar = Σ_shared 1/ln(|container|)`` (smaller
    shared containers are stronger evidence; |container| ≥ 2 whenever a
    pair exists, so the log is never ≤ 0), ``jaccard = common /
    (deg_a + deg_b − common)`` with degrees counted on the SAME capped
    incidence.

    Scale: the only quadratic step is per-container pair generation,
    bounded by ``max_container_size``² — hub containers (a part in
    every order) are dropped, the standard blocking device used by the
    basket/PPJoin operators.  Shuffles: one groupBy(container), one
    pair-keyed groupBy, two broadcast-ready degree joins.  Rounds the
    float scores to 4 decimals.
    """
    if max_container_size < 2:
        raise ValueError("max_container_size must be >= 2")
    inc = (incidence
           .select(F.col(container_col).alias("_c"),
                   F.col(node_col).alias("_n"))
           .filter(F.col("_c").isNotNull() & F.col("_n").isNotNull())
           .distinct())
    sized = inc.join(
        inc.groupBy("_c").agg(F.count(F.lit(1)).alias("_sz"))
           .filter(F.col("_sz") <= max_container_size),
        "_c")
    deg = sized.groupBy(F.col("_n").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree"))
    a = sized.select("_c", F.col("_n").alias("node_a"), "_sz")
    b = sized.select("_c", F.col("_n").alias("node_b"))
    pairs = (a.join(b, "_c")
             .filter(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.count(F.lit(1)).cast("long").alias("common"),
                  F.sum(1.0 / F.log(F.col("_sz").cast("double")))
                   .alias("_aa"))
             .filter(F.col("common") >= int(min_common)))
    da = deg.select(F.col("node").alias("node_a"),
                    F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("node_b"),
                    F.col("degree").alias("_db"))
    r4 = lambda e: F.round(e * 1e4) / 1e4 + F.lit(0.0)  # noqa: E731
    return (pairs.join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "common",
                    r4(F.col("_aa")).alias("adamic_adar"),
                    r4(F.col("common").cast("double")
                       / (F.col("_da") + F.col("_db")
                          - F.col("common")).cast("double"))
                    .alias("jaccard")))


def powerlaw_alpha(degrees: DataFrame, degree_col: str = "degree",
                   d_min: int = 1) -> DataFrame:
    """Continuous-approximation MLE of the power-law exponent over a
    degree (or frequency) table (Clauset–Shalizi–Newman 2009, eq. 3.1):

        α̂ = 1 + n / Σ ln(d / (d_min − 1/2)),   d ≥ d_min

    → one row ``(n, d_min, alpha, mean_deg, max_deg)`` (floats 4
    decimals).  The quick heavy-tail diagnostic for degree / token /
    item-popularity distributions — α near 2 means the usual "a few
    hubs dominate" regime where hub caps and salting earn their keep.
    ONE aggregate over the degree table (which is already an aggregate
    of the edge list); no sorting, no fitting loop.
    """
    if d_min < 1:
        raise ValueError(f"d_min must be >= 1, got {d_min}")
    d = F.col(degree_col).cast("double")
    kept = degrees.filter(d.isNotNull() & (d >= float(d_min)))
    r4 = lambda e: F.round(e * 1e4) / 1e4 + F.lit(0.0)  # noqa: E731
    denom = F.sum(F.log(d / F.lit(float(d_min) - 0.5)))
    agg = kept.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        denom.alias("_den"),
        F.avg(d).alias("_mean"),
        F.max(d).alias("_max"))
    return agg.select(
        "n", F.lit(int(d_min)).cast("long").alias("d_min"),
        F.when(F.col("_den") > 0,
               r4(F.lit(1.0) + F.col("n").cast("double") / F.col("_den")))
        .alias("alpha"),
        r4(F.col("_mean")).alias("mean_deg"),
        F.col("_max").cast("long").alias("max_deg"))
