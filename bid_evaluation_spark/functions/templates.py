"""Pre-built custom-criteria templates as native Column expressions.

Reference: ``bid_evaluation/custom_templates.py`` — six pandas template
functions plus a UI-renderable registry with parameter schemas
(``custom_templates.py:170-258``). Here every template is a pure Spark Column
expression (no UDF, stays in whole-stage codegen); the registry preserves the
same names, defaults and parameter metadata so demo-style configs using the
``template`` criterion vocabulary work unchanged.

All templates return scores clipped to [0, 100] exactly like the reference
(pandas ``.clip(0, 100)`` ⇒ ``least(greatest(x, 0), 100)``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

from pyspark.sql import Column, functions as F

Stats = Mapping[str, Any]


def _lit(v: Any) -> Column:
    if isinstance(v, Column):
        return v
    return F.lit(None).cast("double") if v is None else F.lit(float(v))


def _clip01_100(x: Column) -> Column:
    return F.least(F.greatest(x, F.lit(0.0)), F.lit(100.0))


def budget_proximity(col: Column, stats: Stats, target: float = 100000) -> Column:
    """Closeness to a target budget (reference ``custom_templates.py:11-25``):
    ``clip((1 - |v - target| / target) * 100, 0, 100)``."""
    t = F.lit(float(target))
    deviation = F.abs(col.cast("double") - t) / t
    return _clip01_100((F.lit(1.0) - deviation) * F.lit(100.0))


def sweet_spot_range(col: Column, stats: Stats,
                     min_ideal: float = 30, max_ideal: float = 60) -> Column:
    """100 inside [min_ideal, max_ideal], linear falloff outside, clipped
    (reference ``custom_templates.py:28-57``)."""
    v = col.cast("double")
    lo, hi = F.lit(float(min_ideal)), F.lit(float(max_ideal))
    below = _clip01_100(F.lit(100.0) - (lo - v) / lo * F.lit(100.0))
    above = _clip01_100(F.lit(100.0) - (v - hi) / hi * F.lit(100.0))
    return F.when(v < lo, below).when(v > hi, above).otherwise(F.lit(100.0))


def penalty_function(col: Column, stats: Stats, base_score: float = 100,
                     threshold: float = 50, penalty_per_unit: float = 2) -> Column:
    """Base score minus penalties above a threshold, clipped
    (reference ``custom_templates.py:60-82``)."""
    v = col.cast("double")
    base, t, p = F.lit(float(base_score)), F.lit(float(threshold)), F.lit(float(penalty_per_unit))
    return _clip01_100(F.when(v > t, base - (v - t) * p).otherwise(base))


def bonus_tiers(col: Column, stats: Stats, base_score: float = 50,
                tier1_threshold: float = 5, tier1_bonus: float = 20,
                tier2_threshold: float = 10, tier2_bonus: float = 30) -> Column:
    """Base score plus cumulative tier bonuses, clipped
    (reference ``custom_templates.py:85-115``)."""
    v = col.cast("double")
    score = (
        F.lit(float(base_score))
        + F.when(v >= F.lit(float(tier1_threshold)), F.lit(float(tier1_bonus))).otherwise(F.lit(0.0))
        + F.when(v >= F.lit(float(tier2_threshold)), F.lit(float(tier2_bonus))).otherwise(F.lit(0.0))
    )
    return _clip01_100(score)


def percentage_of_best(col: Column, stats: Stats, higher_is_better: bool = True) -> Column:
    """Percentage relative to the best value, clipped
    (reference ``custom_templates.py:118-136``)."""
    v = col.cast("double")
    if higher_is_better:
        return _clip01_100(F.try_divide(v, _lit(stats["max"])) * F.lit(100.0))
    return _clip01_100(F.try_divide(_lit(stats["min"]), v) * F.lit(100.0))


def distance_from_mean(col: Column, stats: Stats, prefer_above: bool = True) -> Column:
    """Z-score mapped to [0,100] via ``(±z + 3) / 6 * 100``; constant column
    (std == 0) ⇒ 100 for all (reference ``custom_templates.py:139-167``)."""
    mean, std = _lit(stats["mean"]), _lit(stats["std"])
    z = (col.cast("double") - mean) / std
    normalized = (z + F.lit(3.0)) / F.lit(6.0) if prefer_above else (-z + F.lit(3.0)) / F.lit(6.0)
    return (
        F.when(std.isNull() | (std == F.lit(0.0)), F.lit(100.0))
        .otherwise(_clip01_100(normalized * F.lit(100.0)))
    )


#: Registry mirroring the reference's ``TEMPLATES`` dict
#: (``custom_templates.py:170-227``): same keys, display names, descriptions
#: and parameter schemas, with Column-factory functions and a ``needs_stats``
#: flag the planner uses to skip unneeded aggregations.
TEMPLATES: Dict[str, Dict[str, Any]] = {
    "budget_proximity": {
        "function": budget_proximity,
        "needs_stats": False,
        "name": "Budget Proximity",
        "description": "Score based on closeness to target budget",
        "parameters": {
            "target": {"type": "float", "default": 100000, "label": "Target Value"},
        },
    },
    "sweet_spot_range": {
        "function": sweet_spot_range,
        "needs_stats": False,
        "name": "Sweet Spot Range",
        "description": "Highest score within ideal range, drops outside",
        "parameters": {
            "min_ideal": {"type": "float", "default": 30, "label": "Minimum Ideal"},
            "max_ideal": {"type": "float", "default": 60, "label": "Maximum Ideal"},
        },
    },
    "penalty_function": {
        "function": penalty_function,
        "needs_stats": False,
        "name": "Penalty Function",
        "description": "Base score minus penalties for exceeding threshold",
        "parameters": {
            "base_score": {"type": "float", "default": 100, "label": "Base Score"},
            "threshold": {"type": "float", "default": 50, "label": "Penalty Threshold"},
            "penalty_per_unit": {"type": "float", "default": 2, "label": "Penalty Per Unit"},
        },
    },
    "bonus_tiers": {
        "function": bonus_tiers,
        "needs_stats": False,
        "name": "Bonus Tiers",
        "description": "Base score plus bonuses for meeting tier thresholds",
        "parameters": {
            "base_score": {"type": "float", "default": 50, "label": "Base Score"},
            "tier1_threshold": {"type": "float", "default": 5, "label": "Tier 1 Threshold"},
            "tier1_bonus": {"type": "float", "default": 20, "label": "Tier 1 Bonus"},
            "tier2_threshold": {"type": "float", "default": 10, "label": "Tier 2 Threshold"},
            "tier2_bonus": {"type": "float", "default": 30, "label": "Tier 2 Bonus"},
        },
    },
    "percentage_of_best": {
        "function": percentage_of_best,
        "needs_stats": True,
        "name": "Percentage of Best",
        "description": "Score as percentage relative to the best value",
        "parameters": {
            "higher_is_better": {"type": "bool", "default": True, "label": "Higher is Better"},
        },
    },
    "distance_from_mean": {
        "function": distance_from_mean,
        "needs_stats": True,
        "name": "Distance from Mean",
        "description": "Score based on distance from mean",
        "parameters": {
            "prefer_above": {"type": "bool", "default": True, "label": "Prefer Above Mean"},
        },
    },
}


def get_template_names() -> list:
    """List of available template names (reference ``custom_templates.py:230-232``)."""
    return list(TEMPLATES.keys())


def get_template_info(template_name: str) -> Optional[dict]:
    """Info dict for a template (reference ``custom_templates.py:235-237``)."""
    return TEMPLATES.get(template_name)


def apply_template(template_name: str, col: Column, stats: Stats, **kwargs: Any) -> Column:
    """Apply a template by name (reference ``custom_templates.py:240-258``)."""
    template = TEMPLATES.get(template_name)
    if template is None:
        raise ValueError(f"Unknown template: {template_name}")
    func: Callable[..., Column] = template["function"]
    return func(col, stats, **kwargs)
