#!/usr/bin/env python
"""Measured demo: StreamingNearDup state stays bounded by the UNIQUE
corpus while ingest grows.

Streams the sf0.1 documents table as batch 0, then N-1 further batches
of EXACT COPIES under fresh ids (a crawl that keeps re-fetching the
same pages — the adversarial case for dedup-on-ingest state). The claim
under test (SCALE.md round-8 section): per-batch wall time and state
row count are flat in the number of batches, because near-duplicates
never enter the band state — state follows the unique corpus, not the
cumulative ingest.

Usage: python tools/demo_stream_neardup.py [n_batches] [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bid_evaluation_spark.session import get_spark
from bid_evaluation_spark.streaming.neardup import StreamingNearDup


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("demo-stream-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    n0 = docs.count()
    root = tempfile.mkdtemp(prefix="neardup_demo_")
    nd = StreamingNearDup(spark, root)
    total_ingested = 0
    for b in range(n_batches):
        batch = docs.select(
            (F.col("doc_id") + b * 10_000_000).alias("doc_id"), "text")
        t0 = time.time()
        nd.process_batch(batch, batch_id=b)
        dt = time.time() - t0
        total_ingested += n0
        state_rows = nd.state().count()
        n_dup = nd.flags().filter(
            (F.col("batch_id") == b) & F.col("is_near_dup")).count()
        print(f"batch {b}: {dt:6.2f}s  ingested={total_ingested:>7d}  "
              f"state_rows={state_rows:>7d}  retained={nd.n_retained:>7d}  "
              f"dups_this_batch={n_dup}", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
