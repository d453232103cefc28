# example_drift.py — data drift monitoring + remediation (beyond reference)
"""The weekly corpus-health check: compare this delivery's distributions
against the reference window (PSI / KS / W1 for numerics, chi-square for
categoricals), then REMEDIATE a drifted score column by quantile-matching
it back onto the reference scale. Every step is an oracled operator."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bid_evaluation_spark.operators.analytics import quantile_match
from bid_evaluation_spark.operators.metrics import (
    chi_square_drift, ks_statistic, psi_drift, wasserstein_1d)
from bid_evaluation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("example-drift", master="local[4]", shuffle_partitions=4)
orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

ref = orders.filter(F.col("o_orderkey") % 2 == 0)
cur = (orders.filter(F.col("o_orderkey") % 2 == 1)
       .withColumn("o_totalprice", F.col("o_totalprice") * 1.15))

print("PSI per bin (reference-quantile bands):")
psi = psi_drift(ref, cur, "o_totalprice", n_bins=5)
psi.orderBy("bin").show()
print("total PSI:", psi.agg(F.sum("psi_term")).collect()[0][0])

print("KS (does it differ?) and W1 (by how much, in price units):")
ks_statistic(ref, cur, "o_totalprice").show()
wasserstein_1d(ref, cur, "o_totalprice").show()

print("Categorical drift of the language mix (chi-square + Cramér's V):")
chi_square_drift(docs.filter(F.col("doc_id") % 2 == 0),
                 docs.filter(F.col("doc_id") % 2 == 1), "lang").show()

print("Remediation: quantile-match the drifted prices back, then re-check:")
fixed = quantile_match(cur, "o_totalprice", ref, "o_totalprice",
                       n_segments=16, out_col="price_fixed")
after = ks_statistic(ref, fixed.select(F.col("price_fixed")
                                       .alias("o_totalprice")),
                     "o_totalprice")
after.show()
spark.stop()
