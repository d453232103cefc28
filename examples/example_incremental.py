# example_incremental.py — incremental corpus refresh (beyond reference)
"""A new document delivery merged into a kept corpus, end to end:

1. diff the delivery against the current snapshot (CDC classification),
2. upsert the changed/new rows,
3. drop documents that exactly duplicate the kept corpus,
4. re-profile key skew and language diversity of the result.

Every step is one of the engine's oracled operators; this script wires
them the way a nightly 100-TB refresh would (each arrow is one or two
shuffles, no driver-side row loops).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.analytics import category_diversity
from bid_evaluation_spark.operators.cdc import apply_upsert, snapshot_diff
from bid_evaluation_spark.operators.dedup import dedup_against_corpus
from bid_evaluation_spark.operators.profile import key_skew_report
from bid_evaluation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("example-incremental", master="local[4]",
                  shuffle_partitions=4)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

# Simulate yesterday's snapshot and today's delivery from one table:
# the delivery re-sends half the corpus (some edited) plus new docs.
kept = docs.filter(F.col("doc_id") % 3 != 0)
delivery = (docs.filter(F.col("doc_id") % 2 == 0)
            .withColumn("text", F.when(F.col("doc_id") % 10 == 0,
                                       F.concat(F.col("text"), F.lit(" v2")))
                        .otherwise(F.col("text"))))

diff = snapshot_diff(kept, delivery, ["doc_id"], ["text"])
diff.groupBy("change_type").count().orderBy("change_type").show()

# Only ship the rows the diff proved new/changed into the merge — the
# unchanged re-sends never enter the upsert shuffle.
changed_ids = (diff.filter(F.col("change_type").isin("inserted", "changed"))
               .select("doc_id"))
updates = delivery.join(changed_ids, "doc_id", "left_semi")
merged = apply_upsert(kept, updates, ["doc_id"])

fresh_only = dedup_against_corpus(
    delivery.select("doc_id", "text"), kept.select("doc_id", "text"))
print("delivery rows:", delivery.count(),
      "not already in corpus:", fresh_only.count(),
      "merged snapshot:", merged.count())

key_skew_report(merged, "lang", top_k=5, target_rows_per_task=100).show()
category_diversity(merged, "source", "lang").orderBy("source").show(5)
spark.stop()
