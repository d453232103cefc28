# example_llm_curation.py — end-to-end LLM training-data curation (beyond reference)
"""The whole curation funnel on one corpus, every stage an oracled operator:

1. URL canonicalization dedup — drop crawl re-fetches of the same page;
2. span-level exact-substring stats — flag boilerplate-heavy documents
   (Lee et al. keep-first policy);
3. bigram-LM perplexity — score quality against a trusted half;
4. DSIR importance weights — re-weight toward the target distribution;
5. leakage-safe split — near-dup-aware train/val/test labels;
6. token-budget packing — training-ready blocks.

Each stage is a DataFrame → DataFrame transform, so the funnel is ONE lazy
plan per output and Catalyst sees through all of it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.dsir import dsir_logweights
from bid_evaluation_spark.operators.lm import perplexity, train_bigram_lm
from bid_evaluation_spark.operators.pipeline import pack_sequences  # noqa: E501
from bid_evaluation_spark.operators.spans import duplicated_span_stats
from bid_evaluation_spark.operators.web import url_dedup
from bid_evaluation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("example-llm-curation", master="local[4]",
                  shuffle_partitions=4)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

# 1. crawl dedup: synthesize re-fetch URLs (same page, different tracking)
d = F.col("doc_id")
urls = docs.withColumn("url", F.concat(
    F.lit("https://www.site"), (d % 25).cast("string"), F.lit(".com/page/"),
    (d % 50).cast("string"),
    F.when(d % 2 == 0, F.lit("?utm_source=feed")).otherwise(F.lit(""))))
deduped = url_dedup(urls)
print(f"URL dedup: {docs.count()} -> {deduped.count()} docs")

# 2. boilerplate flagging: duplicated-span ratio
span_stats = duplicated_span_stats(deduped, span=10, stride=5)
clean = (deduped.join(span_stats.filter(F.col("dup_ratio") <= 0.5)
                      .select("doc_id"), "doc_id"))
print(f"span filter (dup_ratio <= 0.5): -> {clean.count()} docs")

# 3. LM quality score: train on even ids, score everything
uni, big = train_bigram_lm(clean.filter(d % 2 == 0))
scored = perplexity(clean, uni, big)
kept = clean.join(scored.filter(F.col("ppl") <= 200).select("doc_id"),
                  "doc_id")
print("perplexity deciles of the kept pool:")
scored.join(kept.select("doc_id"), "doc_id").agg(
    F.expr("percentile(ppl, array(0.1, 0.5, 0.9))").alias("p10_50_90")
).show(truncate=False)

# 4. DSIR: weight toward the 'en' slice as the target distribution
weights = dsir_logweights(kept, kept.filter(F.col("lang") == "en"))
print("DSIR log-weight summary (raw pool vs en target):")
weights.agg(F.min("log_weight"), F.avg("log_weight"),
            F.max("log_weight")).show()

# 5-6. split + pack the selected documents
from bid_evaluation_spark.operators.pipeline import train_test_split

labeled = train_test_split(kept, seed="curation")
train = labeled.filter(F.col("split") == "train")
packed = pack_sequences(train, max_tokens=512, shard_col="source",
                        order_col="doc_id")
print("packed training sequences per shard (first 5):")
packed.groupBy("source", "seq_id").agg(
    F.count("*").alias("docs")).orderBy("source", "seq_id").show(5)

spark.stop()
