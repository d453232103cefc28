# example_hybrid.py — Spark equivalent of reference examples/example_hybrid.py
"""Config-built evaluator extended fluently (custom criteria can't come from
config — add them afterwards, same rule as the reference)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bid_evaluation_spark import Evaluator
from bid_evaluation_spark.session import get_spark

spark = get_spark("example-hybrid", master="local[4]", shuffle_partitions=4)

bids = spark.createDataFrame(
    [("Company A", 50_000_000, 8, 85),
     ("Company B", 45_000_000, 10, 90),
     ("Company C", 52_000_000, 6, 75)],
    "vendor string, bid_amount long, experience long, methodology long",
)

config = {
    "experience": {"type": "linear", "weight": 0.20, "higher_is_better": True},
    "bid_amount": {"type": "min_ratio", "weight": 0.40},
}

evaluator = Evaluator.from_config(config)
# extend fluently with a custom pandas criterion
evaluator.custom(
    "methodology", 0.40,
    lambda values, stats: (values - stats["min"]) / (stats["max"] - stats["min"]) * 100,
    name="methodology_rel",
)

result = evaluator.evaluate(bids)
result.select("vendor", "ranking", "final_score").show()
spark.stop()
