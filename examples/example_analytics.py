# example_analytics.py — decision analytics after scoring (beyond reference)
"""The analysis loop AFTER the engine ranks bids: which suppliers are
undominated on (price, quality)? How concentrated is spend? How much do
two scoring configurations agree? Every step is an oracled operator."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from bid_evaluation_spark.operators.analytics import (
    gini_by_group, normalize_scores, pareto_frontier_2d)
from bid_evaluation_spark.operators.metrics import rank_biased_overlap
from bid_evaluation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("example-analytics", master="local[4]",
                  shuffle_partitions=4)
part = spark.read.parquet(f"{SF_DIR}/part.parquet")
orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
supplier = spark.read.parquet(f"{SF_DIR}/supplier.parquet")

print("Pareto frontier — undominated parts (min price, max size):")
(pareto_frontier_2d(part, "p_retailprice", "p_size")
 .select("p_partkey", "p_retailprice", "p_size")
 .orderBy("p_retailprice").show(5))

print("Spend concentration (Gini) per order priority:")
gini_by_group(orders, "o_orderpriority", "o_totalprice").orderBy(
    "o_orderpriority").show()

print("Per-priority min-max normalized order value (sample):")
normalize_scores(orders, "o_totalprice", "o_orderpriority",
                 method="minmax", out_col="value_norm").select(
    "o_orderkey", "o_orderpriority", "value_norm").show(5)

print("Agreement between two supplier rankings (rank-biased overlap):")
wa = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
wb = Window.orderBy(F.asc("s_nationkey"), F.desc("s_acctbal"),
                    F.asc("s_suppkey"))
ra = supplier.select("s_suppkey", F.row_number().over(wa).alias("rnk"))
rb = supplier.select("s_suppkey", F.row_number().over(wb).alias("rnk"))
rank_biased_overlap(ra, rb, "s_suppkey", p=0.9).show()
spark.stop()
