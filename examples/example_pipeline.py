# example_pipeline.py — end-to-end training-data prep with the pipeline
# operators (beyond-reference suite): dedup → quality gates (heuristic +
# unigram-LM perplexity) → decontaminate → deterministic sample → domain
# mixture → chunk/pack → global shuffle → shard write. Runs on the driver
# testdata.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from bid_evaluation_spark.operators.pipeline import (
    chunk_documents, decontaminate, hash_sample, lm_quality_score,
    mixture_sample, pack_sequences, shuffle_rows, top_ngrams,
)
from bid_evaluation_spark.operators.text import fingerprint_md5, quality_score
from bid_evaluation_spark.session import get_spark

spark = get_spark("example-pipeline", master="local[4]", shuffle_partitions=4)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
print(f"corpus: {docs.count()} documents")

# 1. exact dedup — canonical row per normalized-text fingerprint
w = Window.partitionBy("_fp")
docs = (
    docs.withColumn("_fp", fingerprint_md5("text"))
    .withColumn("_keep", F.min("doc_id").over(w))
    .filter(F.col("doc_id") == F.col("_keep"))
    .drop("_fp", "_keep")
)

# 2. quality gates — heuristic 0-100 score as a plain Column predicate,
#    then a CCNet-style unigram-LM perplexity cut (drop the worst 10%)
docs = docs.filter(quality_score() >= 40)
lm = lm_quality_score(docs)
cut = lm.agg(F.expr("percentile(lm_nll, 0.9)")).first()[0]
docs = (docs.join(lm.select("doc_id", "lm_nll"), "doc_id")
        .filter(F.col("lm_nll").isNull() | (F.col("lm_nll") <= cut))
        .drop("lm_nll"))

# 2b. context-aware upgrade: bigram-LM cut separates word salad that the
#     unigram model scores as normal prose (drop the worst 10%)
from bid_evaluation_spark.operators.pipeline import bigram_lm_quality_score
lm2 = bigram_lm_quality_score(docs)
cut2 = lm2.agg(F.expr("percentile(lm2_nll, 0.9)")).first()[0]
docs = (docs.join(lm2.select("doc_id", "lm2_nll"), "doc_id")
        .filter(F.col("lm2_nll").isNull() | (F.col("lm2_nll") <= cut2))
        .drop("lm2_nll"))

# 2c. domain-level gate: drop WHOLE sources whose average quality is low —
#     a good page on a spammy domain goes too (that asymmetry is the point)
from bid_evaluation_spark.operators.pipeline import filter_by_group_score
docs = filter_by_group_score(
    docs.withColumn("_q", quality_score()), "source", "_q", min_avg=35.0,
).drop("_q", "group_avg_score")

# 2d. model-based audit: a Naive Bayes classifier trained on the corpus's
#     own (text, lang) pairs; metadata/prediction disagreements are the
#     rows a human (or a stricter gate) should look at
from bid_evaluation_spark.operators.classify import nb_classify
pred = nb_classify(docs, label_col="lang", id_col="doc_id")
disagree = (docs.join(pred.select("doc_id", "pred_label"), "doc_id")
            .filter(F.col("pred_label") != F.col("lang")).count())
print(f"lang metadata vs NB prediction disagreements: {disagree}")

# 3. decontaminate against a held-out eval slice (doc_id % 10 == 0) —
#    the broadcast-Bloom variant: identical results, and at the real
#    100-TB-train / benchmark-eval shape the train-side shingles are
#    dropped map-side BEFORE the candidate shuffle
from bid_evaluation_spark.operators.pipeline import decontaminate_bloom
train = docs.filter(F.col("doc_id") % 10 != 0)
eval_slice = docs.filter(F.col("doc_id") % 10 == 0)
contaminated = decontaminate_bloom(train, eval_slice, threshold=0.3)
train = train.join(
    contaminated.select("train_id").distinct(),
    train.doc_id == F.col("train_id"), "left_anti",
)

# 4. deterministic, reproducible 50% sample (md5-threshold, not rand),
#    then thin toward a target language mixture (4:2:2:1:1)
train = hash_sample(train, 0.5, key_col="doc_id", seed="demo")
train = mixture_sample(train, {"en": 4, "de": 2, "es": 2, "fr": 1, "zh": 1},
                       group_col="lang", seed="demo")
print(f"after dedup + quality + decontamination + sample + mixture: "
      f"{train.count()}")
train.groupBy("lang").count().orderBy("lang").show()

# 5a. chunk for embedding/indexing ...
chunks = chunk_documents(train, chunk_tokens=64, overlap=16)
print(f"chunks: {chunks.count()}")

# 5b. ... or pack into fixed-budget training sequences per source shard
packed = pack_sequences(train, max_tokens=512, shard_col="source")
packed.groupBy("source", "seq_id").agg(
    F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
).orderBy("source", "seq_id").show(10)

# 6. seeded global shuffle → contiguous ordered training shards
from bid_evaluation_spark.sources.io import write_training_shards

shard_dir = os.path.join(os.environ.get("TMPDIR", "/tmp"), "demo_shards")
write_training_shards(shuffle_rows(train, seed="epoch0"), shard_dir,
                      n_shards=4)
print(f"shards written: {shard_dir} "
      f"({spark.read.parquet(shard_dir).count()} rows)")

# bonus: bounded-memory corpus profile — count-min heavy hitters and an
# HLL distinct-token estimate (both deterministic md5 sketches whose
# partial aggregation IS the merge step)
from bid_evaluation_spark.operators.sketch import cms_topk, hll_distinct
from bid_evaluation_spark.operators.text import tokens

cms_topk(train, k=5, with_exact=True).show()
toks = train.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
hll_distinct(toks, "t", with_exact=True).show()

# bonus: corpus vocabulary two ways — top word bigrams, and a trained
# BPE subword vocabulary (one corpus shuffle + merge rounds over the
# word-frequency table) applied back as per-doc token counts
top_ngrams(train, n=2, k=10).show(truncate=False)

from bid_evaluation_spark.operators.bpe import bpe_token_count, bpe_train
merges = bpe_train(train, n_merges=30)
print(f"BPE merges learned: {merges[:10]} ...")
train.select("doc_id", bpe_token_count(F.col("text"), merges)
             .alias("n_bpe_tokens")).show(5)

spark.stop()
