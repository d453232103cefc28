# example_simple.py — Spark equivalent of reference examples/example_simple.py
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bid_evaluation_spark import (
    Evaluator, LinearCriterion, DirectScoreCriterion,
    ThresholdCriterion, MinimumRatioCriterion,
)
from bid_evaluation_spark.session import get_spark

spark = get_spark("example-simple", master="local[4]", shuffle_partitions=4)

bids = spark.createDataFrame(
    [("Company A", 50_000_000, 8, 85, 4, 2),
     ("Company B", 45_000_000, 10, 90, 5, 4),
     ("Company C", 52_000_000, 6, 75, 3, 1),
     ("Company D", 48_000_000, 12, 88, 6, 3)],
    "vendor string, bid_amount long, experience long, methodology long, "
    "team long, certifications long",
)

evaluator = Evaluator(normalize_weights=True)
evaluator.add_criterion("experience",
    LinearCriterion("experience", weight=0.15, higher_is_better=True))
evaluator.add_criterion("methodology",
    DirectScoreCriterion("methodology", weight=0.25, input_scale=100))
evaluator.add_criterion("team",
    ThresholdCriterion("team", weight=0.10, thresholds=[
        (0, 3, 60), (3, 5, 80), (5, float("inf"), 100)]))
evaluator.add_criterion("certifications",
    ThresholdCriterion("certifications", weight=0.10, thresholds=[
        (0, 2, 50), (2, 4, 75), (4, 6, 90), (6, float("inf"), 100)]))
evaluator.add_criterion("bid_amount",
    MinimumRatioCriterion("economic_bid", weight=0.40))

print("\n=== EVALUATION CONFIGURATION ===")
print(evaluator.summary().to_string(index=False))
print(f"\nTotal weight: {evaluator.get_total_weight():.2f}")

result = evaluator.evaluate(bids)

print("\n=== EVALUATION RESULTS ===")
result.select("vendor", "ranking", F.round("final_score", 2).alias("final_score")).show()

print("=== DETAILED BREAKDOWN ===")
detail_cols = [c for c in result.columns if c.startswith("score_")]
result.select("vendor", *detail_cols).show()

spark.stop()
