#!/usr/bin/env python
"""Scaling-law harness: measured log-log growth exponents for the
heaviest operator families.

SCALE.md argues complexity; this measures it. Each family runs at three
scales — sf0.01, sf0.1, and a synthetic ~10× blow-up of sf0.1 — and the
harness fits the growth exponent between consecutive scales
(``log(t2/t1) / log(n2/n1)``) plus a least-squares slope over all three
points. A family whose largest-pair exponent exceeds its stated
complexity bound (column ``stated``) by more than ``SLACK`` is flagged.

The synthetic blow-up preserves each table's STATISTICAL SHAPE so the
exponent measures the operator, not a density artifact:

- ``documents``: 10 copies per doc; copy i's text goes through a
  copy-specific letter ``translate`` so copies are NOT near-duplicates
  of each other (same token/shingle structure, disjoint shingle sets)
  — near-dup pair volume and winnow bucket sizes scale ~linearly.
- ``orders``/``lineitem``: keys remapped to ``key*16 + i`` so joined
  graph structure replicates as 10 DISJOINT copies (components
  multiply, never densify); prices jittered per copy.
- dbscan points: the coordinate modulus scales with ``sqrt(n)`` so
  point DENSITY (points per ε-cell) is constant across scales —
  otherwise the ε-pair count grows quadratically by construction.

Usage: python tools/bench_scaling.py [out.json] [family ...]
Writes the measurement JSON (default ``artifacts/scaling_result.json``)
and prints one row per family. SCALING.md is authored from this output.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bid_evaluation_spark.session import get_spark

SF1 = "/root/testdata/sf0.01"
SF2 = "/root/testdata/sf0.1"
SYNTH = os.environ.get("SPARK_GRAFT_SCALING_DIR",
                       "/tmp/spark_graft_scaling_10x")
COPIES = 10
SLACK = 0.3  # flag when measured exponent > stated + SLACK

#: letter rotations for per-copy text perturbation — copy i maps the
#: alphabet i places forward, so identical source tokens land in
#: disjoint shingle spaces per copy (copies are not near-duplicates)
_ABC = "abcdefghijklmnopqrstuvwxyz"


def _rot(i):
    return _ABC[i % 26:] + _ABC[:i % 26]


#: bump when build_synth's output changes shape — stale caches rebuild
_SYNTH_VERSION = "v2-graph-keys"


def build_synth(spark):
    """Materialize the ~10× blow-up of sf0.1 once (parquet under SYNTH)."""
    os.makedirs(SYNTH, exist_ok=True)
    done = os.path.join(SYNTH, "_DONE")
    if os.path.exists(done) and open(done).read().strip() == _SYNTH_VERSION:
        return
    docs = spark.read.parquet(f"{SF2}/documents.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(docs.select(
            (F.col("doc_id") * 16 + i).alias("doc_id"),
            F.translate(F.col("text"), _ABC + _ABC.upper(),
                        _rot(i) + _rot(i).upper()).alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{SYNTH}/documents.parquet")

    orders = spark.read.parquet(f"{SF2}/orders.parquet")
    oparts = []
    for i in range(COPIES):
        oparts.append(orders.select(
            (F.col("o_orderkey") * 16 + i).alias("o_orderkey"),
            (F.col("o_custkey") * 16 + i).alias("o_custkey"),
            (F.col("o_totalprice") + i * 1e-4).alias("o_totalprice")))
    oo = oparts[0]
    for p in oparts[1:]:
        oo = oo.unionByName(p)
    oo.write.mode("overwrite").parquet(f"{SYNTH}/orders.parquet")

    li = spark.read.parquet(f"{SF2}/lineitem.parquet")
    lparts = []
    for i in range(COPIES):
        lparts.append(li.select(
            (F.col("l_orderkey") * 16 + i).alias("l_orderkey"),
            # supplier/part keys remapped the same way: the bipartite
            # part-supplier graph replicates as 10 DISJOINT copies
            # (components multiply, never densify)
            (F.col("l_suppkey") * 16 + i).alias("l_suppkey"),
            (F.col("l_partkey") * 16 + i).alias("l_partkey"),
            (F.col("l_extendedprice") + i * 1e-4)
            .alias("l_extendedprice")))
    ll = lparts[0]
    for p in lparts[1:]:
        ll = ll.unionByName(p)
    ll.write.mode("overwrite").parquet(f"{SYNTH}/lineitem.parquet")

    part = spark.read.parquet(f"{SF2}/part.parquet")
    pparts = [part.select((F.col("p_partkey") * 16 + i).alias("p_partkey"))
              for i in range(COPIES)]
    pp = pparts[0]
    for p in pparts[1:]:
        pp = pp.unionByName(p)
    pp.write.mode("overwrite").parquet(f"{SYNTH}/part.parquet")
    open(done, "w").write(_SYNTH_VERSION + "\n")


def _docs(spark, base):
    return spark.read.parquet(f"{base}/documents.parquet")


# --- family runners: (spark, base) -> (n_input_rows, result_row_count) ---

def fam_minhash(spark, base):
    from bid_evaluation_spark.operators.dedup import minhash_near_duplicates
    d = _docs(spark, base)
    n = d.count()
    return n, minhash_near_duplicates(d, threshold=0.2, num_perm=64,
                                      bands=16).count()


def fam_cc_twophase(spark, base):
    # bipartite customer-order membership graph: linear edges, star-ish
    # components that replicate disjointly under the key remap
    from bid_evaluation_spark.operators.dedup import near_duplicate_clusters
    o = spark.read.parquet(f"{base}/orders.parquet")
    edges = o.select(F.col("o_custkey").alias("a_id"),
                     (F.col("o_orderkey") + F.lit(1) * 10**12).alias("b_id"))
    n = edges.count()
    return n, near_duplicate_clusters(edges, algorithm="twophase").count()


def fam_dbscan(spark, base):
    from bid_evaluation_spark.operators.spatial import dbscan
    part = spark.read.parquet(f"{base}/part.parquet")
    n = part.count()
    # constant density: area scales with n (modulus ~ sqrt(n))
    m = max(100, int(1000 * math.sqrt(n / 20000.0)) | 1)
    pts = part.select(
        F.col("p_partkey").alias("pid"),
        ((F.col("p_partkey") * 37 % m) / 10.0).alias("x"),
        ((F.col("p_partkey") * 61 % m) / 10.0).alias("y"))
    return n, dbscan(pts, "pid", "x", "y", eps=1.5, min_pts=4).count()


def fam_textrank(spark, base):
    from bid_evaluation_spark.operators.graph import textrank_keywords
    d = _docs(spark, base)
    return d.count(), textrank_keywords(d, n_iters=2, window=2,
                                        top_k=3).count()


def fam_winnow_pairs(spark, base):
    from bid_evaluation_spark.operators.text import winnow_candidate_pairs
    d = _docs(spark, base)
    return d.count(), winnow_candidate_pairs(d, k=3, w=4, min_shared=2,
                                             max_doc_freq=50).count()


def fam_span_dedup(spark, base):
    from bid_evaluation_spark.operators.spans import duplicated_span_stats
    d = _docs(spark, base)
    return d.count(), duplicated_span_stats(d, span=10, stride=5).count()


def fam_span_removal(spark, base):
    # the r11 ExactSubstr REMOVAL (heavier than span stats: the doc is
    # rebuilt from surviving tokens via native transform/filter) at the
    # registry query's window shape
    from bid_evaluation_spark.operators.spans import (
        remove_duplicated_spans)
    d = _docs(spark, base)
    return d.count(), remove_duplicated_spans(d, span=10,
                                              stride=5).count()


#: standing-index cache for fam_incremental_minhash: pass 1 builds and
#: persists the index (discarded by measure()'s min), pass 2 measures
#: the PRODUCTION shape — a fixed delta joining an already-materialized
#: index that scales 10x per step
_IDX_CACHE: dict = {}


def fam_incremental_minhash(spark, base):
    from bid_evaluation_spark.operators.dedup import (
        incremental_minhash_candidates, minhash_index_table)
    d = _docs(spark, base)
    n = d.count()
    if base not in _IDX_CACHE:
        idx = minhash_index_table(d).persist()
        idx.count()
        _IDX_CACHE[base] = idx
    # ~200-doc delta at every scale (the fixed daily crawl slice)
    step = max(1, n // 200)
    delta = d.filter(F.col("doc_id") % step == 0)
    return n, incremental_minhash_candidates(delta,
                                             _IDX_CACHE[base]).count()


def fam_media_funnel(spark, base):
    # the r12 flagship composition at corpus shape: one Arrow pass
    # (sniff + routed decode + features over the 19-class fixture
    # corpus) + the linear dHash groupBy-min + the verdict join —
    # cost must scale with file count alone (pure map + two small
    # shuffles)
    import __spark_entry__ as entry
    from bid_evaluation_spark.operators.cache import release_all
    from bid_evaluation_spark.operators.mediafunnel import media_funnel

    media = entry._media_funnel_fixture(spark, base)
    n = media.count()
    out = media_funnel(media).count()
    release_all()
    return n, out


def fam_bpe_train(spark, base):
    from bid_evaluation_spark.operators.bpe import bpe_train
    d = _docs(spark, base)
    n = d.count()
    merges = bpe_train(d, n_merges=20, min_count=2)
    return n, len(merges)


def fam_stream_neardup(spark, base):
    # batch twin of the streaming near-dup filter: banding + bucket-min
    from bid_evaluation_spark.operators.dedup import neardup_mark_ordered
    d = _docs(spark, base)
    return d.count(), neardup_mark_ordered(d).count()


def fam_media_codec_fp(spark, base):
    # round-9 lossy codec + fingerprint kernels: constant-size ADPCM
    # payload generated per doc, decoded (sample-sequential Python loop —
    # the most plausible super-linear suspect) and fingerprinted; cost
    # must scale with the document count alone
    import numpy as np
    import pandas as pd

    from bid_evaluation_spark.operators.adpcm import encode_wav_adpcm
    from bid_evaluation_spark.operators.audiofp import audio_fingerprint

    d = _docs(spark, base).select("doc_id")

    def gen(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                h = 10 + int(did) % 7 * 2
                sgn = 1 - 2 * ((np.arange(2048) // h) % 2)
                payloads.append(encode_wav_adpcm(0.5 * sgn, rate=8000))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.mapInPandas(gen, "media_id long, payload binary")
    return d.count(), audio_fingerprint(media).count()


def _ps_edges(spark, base):
    """Undirected part-supplier bipartite edges — the registry graph
    queries' construction (namespaced string nodes). Under the synth
    key remap both endpoints shift by *16+i, so the graph replicates as
    disjoint copies."""
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    return li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"))


def fam_graph_bfs(spark, base):
    # fixed 3 hops → measured exponent is pure per-row/per-frontier
    # growth; seeds are a FIXED FRACTION of suppliers (suppkey % 7 == 0)
    # so frontier volume scales with the graph instead of pinning to a
    # constant seed set that would explore one component per copy
    from bid_evaluation_spark.operators.graph import bfs_distances
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    edges = _ps_edges(spark, base)
    seeds = (li.filter(F.col("l_suppkey") % 7 == 0)
             .select(F.concat(F.lit("s"), F.col("l_suppkey"))
                     .alias("node")).distinct())
    n = li.count()
    return n, bfs_distances(edges, seeds, max_hops=3,
                            directed=False).count()


def fam_graph_lpa(spark, base):
    # fixed 2 synchronous rounds (registry constants) — per-round cost
    # is one edges⋈labels join + one vote groupBy + one argmax window
    from bid_evaluation_spark.operators.graph import label_propagation
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    n = li.count()
    return n, label_propagation(_ps_edges(spark, base), max_iter=2,
                                directed=False).count()


def fam_graph_kcore(spark, base):
    # fixed 3 peel rounds, k=30 (registry constants) — per-round cost is
    # one degree groupBy + two endpoint semi-joins
    from bid_evaluation_spark.operators.graph import k_core
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    n = li.count()
    return n, k_core(_ps_edges(spark, base), k=30, n_rounds=3).count()


def fam_web_ingest(spark, base):
    # round-9 web wave: per-doc HTML fixture -> anchor parse kernel ->
    # host-graph aggregation; constant parse work per row, one shuffle
    import pandas as pd

    from bid_evaluation_spark.operators.linkgraph import (
        extract_links, host_graph)

    d = _docs(spark, base).select("doc_id")

    def gen(batches):
        for pdf in batches:
            urls, pages = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                urls.append(f"http://h{did % 97}.example/p/{did}")
                pages.append(
                    f'<a href="http://h{(did + 1) % 97}.example/x">n</a>'
                    '<a href="/self">s</a>'
                    f'<a href="//h{(did + 2) % 97}.example/y">p</a>')
            yield pd.DataFrame({"url": urls, "html": pages})

    pages = d.mapInPandas(gen, "url string, html string")
    return d.count(), host_graph(extract_links(pages)).count()


def fam_video_shot_hash(spark, base):
    # round-10 composition kernel: AVI decode -> scene cuts -> per-shot
    # pHash in ONE Arrow pass; constant-size clip per doc so cost must
    # scale with the document count alone (the banded join half of
    # video_neardup is measured separately by phash_banded_join)
    import numpy as np
    import pandas as pd

    from bid_evaluation_spark.operators.avi import encode_avi_mjpeg
    from bid_evaluation_spark.operators.videodedup import shot_phashes

    d = _docs(spark, base).select("doc_id")

    def gen(batches):
        y, x = np.mgrid[0:16, 0:16]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = []
                for i in range(2):
                    b = 1 + (did + 7 * i) % 14
                    p = np.round(7 * np.cos(2 * np.pi * x
                                            * (1 + did % 5) / 16)
                                 * np.cos(2 * np.pi * y * (1 + i) / 16))
                    frames += [(16 * b + 8 + p).astype(np.uint8)] * 2
                payloads.append(encode_avi_mjpeg(frames, quality=90))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = d.mapInPandas(gen, "media_id long, payload binary")
    return d.count(), shot_phashes(media, strict=True).count()


def fam_phash_banded_join(spark, base):
    # the cross-item half of image/video near-dup: banded-Hamming
    # equi-join in the 16-bit-band corpus-scale layout. Hash clusters
    # of ~10 equal values (true-dup structure replicates linearly);
    # everything else is xxhash64-uniform, so the accidental-candidate
    # term is the documented n_bands*n^2/2^band_bits worst case.
    from bid_evaluation_spark.operators.phash import phash_neardup_pairs

    d = _docs(spark, base).select("doc_id")
    n = d.count()
    hashes = d.select(
        F.col("doc_id").alias("media_id"),
        F.xxhash64((F.col("doc_id") % F.lit(max(1, n // 10)))
                   .cast("string")).alias("phash"))
    return n, phash_neardup_pairs(hashes, max_hamming=3,
                                  band_bits=16).count()


def fam_audio_match(spark, base):
    # landmark-hash retrieval with a GROWING index and a fixed query
    # load (the production shape: the index scales with the corpus,
    # per-query cost grows with bucket size n / hash_space) — collision
    # skew shows up as a super-linear tail if buckets go hot
    import numpy as np
    import pandas as pd

    from bid_evaluation_spark.operators.audiomatch import (
        audio_landmarks, match_clips)
    from bid_evaluation_spark.operators.wav import encode_wav

    d = _docs(spark, base).select("doc_id")
    n = d.count()

    def gen(batches):
        t = np.arange(2048)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rng = np.random.default_rng(did)
                bins = rng.choice(np.arange(12, 112), size=4,
                                  replace=False)
                xx = sum(0.4 * np.sin(2 * np.pi * (b * 31.25) * t
                                      / 8000.0) for b in bins)
                rows.append({"media_id": did,
                             "payload": encode_wav(
                                 (np.clip(xx, -1, 1) * 32000)
                                 .astype(np.int16), rate=8000)})
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = d.mapInPandas(gen, "media_id long, payload binary")
    index_lms = audio_landmarks(media)
    # fixed 200-clip query set: gain-scaled copies of the first clips
    queries = media.filter(F.col("media_id") < 200)
    query_lms = audio_landmarks(queries).select(
        (F.col("media_id") + 10**9).alias("media_id"), "lm_hash", "t")
    return n, match_clips(index_lms, query_lms, min_votes=20).count()


def fam_unigram_train(spark, base):
    # SentencePiece-style EM: corpus collapses to distinct words first,
    # then per-round one lattice kernel + one integer groupBy — cost
    # scales with DISTINCT words (the alphabet-rotated synth copies
    # multiply the distinct-word set ~10x, the honest blow-up)
    from bid_evaluation_spark.operators.unigram import unigram_train
    d = _docs(spark, base)
    vocab = unigram_train(d, vocab_size=40, n_iters=2,
                          max_piece_len=3, seed_size=150)
    return d.count(), len(vocab)


def fam_quantile_match(spark, base):
    from bid_evaluation_spark.operators.analytics import quantile_match
    od = spark.read.parquet(f"{base}/orders.parquet")
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    n = od.count() + li.count()
    return n, quantile_match(od, "o_totalprice", li, "l_extendedprice",
                             n_segments=8, out_col="m").count()


#: family -> (runner, stated complexity exponent in input size, rationale)
def fam_maxsim_twophase(spark, base):
    # the r10 late-interaction rerank at corpus shape: doc-token table
    # grows with the corpus (4 tokens x 8 dims per doc, native exprs),
    # query load fixed (16 queries x 4 tokens). Phase 1 (pool + pooled
    # Q x N prune) is linear in docs; phase 2 (exact MaxSim) is pinned
    # to n_candidates per query by pooled_candidates' row_number
    # cutoff, so total growth must be ~linear no matter the corpus
    from bid_evaluation_spark.operators.lateinteraction import maxsim_topk

    d = _docs(spark, base).select("doc_id")
    n = d.count()
    toks = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("token_idx")
    ).withColumn("vec", F.expr(
        "transform(sequence(0, 7), j -> "
        "cos(doc_id * 0.7 + token_idx * 1.3 + j * 0.41))"))
    qs = spark.range(16).select(
        F.col("id").alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("token_idx")
    ).withColumn("vec", F.expr(
        "transform(sequence(0, 7), j -> "
        "cos(query_id * 0.9 + token_idx * 1.7 + j * 0.53))"))
    return n, maxsim_topk(toks, qs, k=10, n_candidates=50).count()


def fam_cosine_topk(spark, base):
    # r12 Arrow per-batch top-k frontier kernel: FIXED 50-query load,
    # corpus vectors scale with docs — per-batch frontier work is
    # linear in corpus rows (queries broadcast once per task)
    from bid_evaluation_spark.operators.similarity import cosine_topk

    d = _docs(spark, base).select("doc_id")
    n = d.count()
    emb = d.select(F.col("doc_id").alias("vec_id"), F.expr(
        "transform(sequence(0, 15), j -> cos(doc_id * 0.37 + j * 0.73))"
    ).alias("embedding"))
    qs = spark.range(50).select(
        (F.col("id") + F.lit(10) ** 9).alias("vec_id"), F.expr(
            "transform(sequence(0, 15), j -> cos(id * 0.53 + j * 0.41))"
        ).alias("embedding"))
    return n, cosine_topk(qs, emb, k=10, exclude_self=False).count()


def fam_repetition(spark, base):
    # r12 partition kernel: one id-hash shuffle + per-doc numpy gram
    # counting — per-doc work constant under the rotated-alphabet copies
    from bid_evaluation_spark.operators.quality import (
        ngram_repetition_stats)

    d = _docs(spark, base)
    n = d.count()
    return n, ngram_repetition_stats(d, ns=(1, 2)).count()


def fam_trend_test(spark, base):
    # r12 per-group numpy kernel below the pair probe: groups are
    # customers (cardinality scales, per-group size bounded) so MK/
    # Theil-Sen pair volume grows linearly with orders
    from bid_evaluation_spark.operators.timeseries import trend_test

    od = spark.read.parquet(f"{base}/orders.parquet")
    n = od.count()
    return n, trend_test(od, "o_custkey", "o_orderkey",
                         "o_totalprice").count()


def fam_fuzzy_join(spark, base):
    # r12 dual engine ACROSS ITS CROSSOVER: numbered supplier-style
    # names (left exact, right zero-padded variant at edit distance
    # <= 2) — sf0.01/sf0.1 fit the batch-DP kernel caps, the 10x synth
    # exceeds them and takes the q-gram join route, so this family
    # times the dispatch seam itself
    from bid_evaluation_spark.operators.fuzzy import fuzzy_join

    li = spark.read.parquet(f"{base}/lineitem.parquet")
    keys = li.select(F.col("l_suppkey").alias("id")).distinct()
    n = keys.count()
    left = keys.select("id", F.concat(
        F.lit("supplier#"), F.col("id").cast("string")).alias("name"))
    right = keys.select((F.col("id") + F.lit(10) ** 9).alias("id"),
                        F.concat(F.lit("supplier#0"),
                                 F.col("id").cast("string")).alias("name"))
    return n, fuzzy_join(left, right, text_col="name", max_dist=2).count()


FAMILIES = {
    "minhash_lsh": (fam_minhash, 1.0,
                    "map-only signatures + banded buckets; candidate "
                    "volume ~ sum(bucket^2) with dup structure replicated "
                    "linearly"),
    "cc_twophase": (fam_cc_twophase, 1.0,
                    "O(E log^2 n) rounds; rounds grow ~log, per-round "
                    "work linear in E"),
    "dbscan": (fam_dbscan, 1.0,
               "cell-blocked eps-join at constant density + two-phase CC"),
    "textrank": (fam_textrank, 1.0,
                 "per-doc co-occurrence graphs, fixed iteration count"),
    "winnow_pairs": (fam_winnow_pairs, 1.0,
                     "map-only fingerprints + capped inverted-index "
                     "self-join (max_doc_freq bounds bucket^2)"),
    "span_dedup": (fam_span_dedup, 1.0,
                   "one groupBy(hash) + one join + one per-doc agg"),
    "span_removal": (fam_span_removal, 1.0,
                     "span stats' one hash shuffle + a native per-doc "
                     "rebuild (O(tokens x dup_starts) codegen "
                     "comparison, dup_starts bounded per doc)"),
    "media_funnel": (fam_media_funnel, 1.0,
                     "one Arrow routing/decode kernel per file + a "
                     "partial-aggregated dHash groupBy-min + the "
                     "manifest join; per-file work constant by "
                     "fixture construction"),
    "incremental_minhash": (fam_incremental_minhash, 1.0,
                            "fixed delta vs 10x-scaling standing "
                            "index: delta shingles map-only; the "
                            "banded equi-join touches only the "
                            "delta's buckets, whose size grows with "
                            "corpus density (~linear under the "
                            "rotated-alphabet blow-up); index build "
                            "excluded (pass-1 cached, the production "
                            "amortization)"),
    "bpe_train": (fam_bpe_train, 1.0,
                  "fixed merge count; each round one corpus-vocab scan"),
    "quantile_match": (fam_quantile_match, 1.0,
                       "n log n sort for landmarks + map-only transform "
                       "(log factor absorbed by SLACK)"),
    "stream_neardup": (fam_stream_neardup, 1.0,
                       "map-only portable banding + bucket-min groupBy "
                       "(no pair materialization; dup structure "
                       "replicates linearly in the synth corpus)"),
    "media_codec_fp": (fam_media_codec_fp, 1.0,
                       "constant-size ADPCM encode+decode+fingerprint "
                       "per row inside one Arrow kernel — pure map, "
                       "no shuffle"),
    "graph_bfs": (fam_graph_bfs, 1.0,
                  "3 fixed hops x (frontier join + anti-join); seeds a "
                  "fixed fraction of suppliers so frontier volume "
                  "scales with the graph; rounds fixed -> exponent is "
                  "pure per-row growth"),
    "graph_lpa": (fam_graph_lpa, 1.0,
                  "2 fixed synchronous rounds x (edges-labels join + "
                  "vote groupBy + per-node argmax window)"),
    "graph_kcore": (fam_graph_kcore, 1.0,
                    "3 fixed peel rounds x (degree groupBy + two "
                    "endpoint semi-joins), lineage truncated per round"),
    "web_ingest": (fam_web_ingest, 1.0,
                   "constant anchor-parse work per page in one Arrow "
                   "kernel + one host-pair groupBy; edge count linear "
                   "in pages by construction"),
    "video_shot_hash": (fam_video_shot_hash, 1.0,
                        "constant-size AVI decode + segment + per-shot "
                        "pHash per row inside one Arrow kernel — pure "
                        "map, no shuffle"),
    "phash_banded_join": (fam_phash_banded_join, 1.5,
                          "linear banding + bounded true-dup pairs + "
                          "an accidental-candidate term n_bands*n^2/"
                          "2^band_bits; at 16-bit bands the quadratic "
                          "term passes the linear term only beyond "
                          "~10M rows, so measured growth at these "
                          "scales must stay well under 1.5"),
    "maxsim_twophase": (fam_maxsim_twophase, 1.0,
                        "pool + fixed-Q pooled prune linear in docs; "
                        "exact rerank pinned to n_candidates per query "
                        "by the row_number cutoff (log factor of the "
                        "per-query prune sort absorbed by SLACK)"),
    "audio_match": (fam_audio_match, 1.0,
                    "landmark extraction linear in clips; fixed query "
                    "load joins against buckets of size n/|hash "
                    "space| (~266k hashes), so query cost grows "
                    "linearly with the index too"),
    "unigram_train": (fam_unigram_train, 1.0,
                      "fixed EM rounds x (one lattice kernel over "
                      "DISTINCT words + one integer groupBy); distinct "
                      "words grow ~linearly under the rotated-alphabet "
                      "blow-up"),
}


def measure(spark, runner, base, passes=2):
    best, n, rows = None, None, None
    for _ in range(passes):
        t0 = time.time()
        n, rows = runner(spark, base)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return n, rows, best


def main():
    args = sys.argv[1:]
    out_path = (args[0] if args and args[0].endswith(".json")
                else "artifacts/scaling_result.json")
    only = set(a for a in args if not a.endswith(".json"))
    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    build_synth(spark)
    scales = [("sf0.01", SF1), ("sf0.1", SF2), ("synth10x", SYNTH)]
    results = {}
    for fam, (runner, stated, why) in FAMILIES.items():
        if only and fam not in only:
            continue
        pts = []
        for label, base in scales:
            n, rows, sec = measure(spark, runner, base)
            pts.append({"scale": label, "n": n, "rows": rows,
                        "sec": round(sec, 3)})
            print(f"{fam:16s} {label:9s} n={n:>8d} rows={rows:>8d} "
                  f"{sec:7.2f}s", flush=True)
        exps = []
        for a, b in zip(pts, pts[1:]):
            exps.append(round(math.log(b["sec"] / a["sec"])
                              / math.log(b["n"] / a["n"]), 3))
        xs = [math.log(p["n"]) for p in pts]
        ys = [math.log(p["sec"]) for p in pts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        fit = round(sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                    / sum((x - mx) ** 2 for x in xs), 3)
        flagged = exps[-1] > stated + SLACK
        results[fam] = {"points": pts, "pair_exponents": exps,
                        "fit_exponent": fit, "stated": stated,
                        "flagged": flagged, "why": why}
        print(f"{fam:16s} exponents pair={exps} fit={fit} "
              f"stated<={stated} {'FLAG' if flagged else 'ok'}",
              flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    n_flag = sum(1 for r in results.values() if r["flagged"])
    print(f"{len(results)} families, {n_flag} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
