# example_custom.py — Spark equivalent of reference examples/example_custom.py
"""Custom criteria: the SAME pandas `(values, stats) -> scores` functions the
reference uses run here unchanged, as Arrow-vectorized pandas UDFs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typing import Dict

import pandas as pd

from bid_evaluation_spark import Evaluator, CustomCriterion, MinimumRatioCriterion
from bid_evaluation_spark.session import get_spark


def evaluate_budget_proximity(values: pd.Series, stats: Dict) -> pd.Series:
    """Rewards bids close to the reference budget; penalizes extremes."""
    reference_budget = 50_000_000
    percentage_difference = abs((values - reference_budget) / reference_budget) * 100
    return (100 - percentage_difference * 2).clip(lower=0)


def evaluate_delivery_time(values: pd.Series, stats: Dict) -> pd.Series:
    """Sweet spot 30-45 days; penalty for suspicious speed or slowness."""
    ideal_min, ideal_max = 30, 45
    scores = pd.Series(100.0, index=values.index)
    too_fast = values < ideal_min
    scores[too_fast] = 100 - ((ideal_min - values[too_fast]) * 3)
    too_slow = values > ideal_max
    scores[too_slow] = 100 - ((values[too_slow] - ideal_max) * 2)
    return scores.clip(lower=0)


spark = get_spark("example-custom", master="local[4]", shuffle_partitions=4)

bids = spark.createDataFrame(
    [("Company A", 50_000_000, 8.5, 25, 12),
     ("Company B", 45_000_000, 9.2, 35, 24),
     ("Company C", 52_000_000, 7.8, 60, 12),
     ("Company D", 48_000_000, 8.9, 40, 18)],
    "vendor string, bid_amount long, quality_score double, "
    "delivery_days long, warranty_months long",
)

evaluator = Evaluator(normalize_weights=True)
evaluator.add_criterion("bid_amount", MinimumRatioCriterion("price", weight=0.30))
evaluator.add_criterion("quality_score",
    CustomCriterion("budget_fit", weight=0.25,
                    evaluation_function=lambda v, s: v * 10))
evaluator.add_criterion("delivery_days",
    CustomCriterion("delivery", weight=0.25,
                    evaluation_function=evaluate_delivery_time))
evaluator.add_criterion("warranty_months",
    CustomCriterion("warranty", weight=0.20,
                    evaluation_function=lambda v, s: (v / 24 * 100).clip(upper=100)))

result = evaluator.evaluate(bids)
result.select("vendor", "ranking", "final_score").show()
spark.stop()
