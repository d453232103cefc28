"""Hot-loaded Python-module scoring functions (SURVEY.md §2.1 S8;
reference demos/streamlit_demo.py:56-86)."""

from __future__ import annotations

import textwrap

import pytest

from bid_evaluation_spark import Evaluator
from bid_evaluation_spark.sources.udf_loader import (
    load_custom_functions,
    load_module_functions,
)

MODULE_A = '''
import numpy as np

def double_score(values, stats):
    """Two-arg scoring function."""
    return values * 2.0

def minus_min(values, stats):
    return values - stats["min"]

def identity(values):
    """One-arg variant — stats-free."""
    return values * 1.0

def _private_helper(values, stats):
    return values

NOT_A_FUNCTION = 42
'''

MODULE_B = '''
def double_score(values, stats):
    return values * 3.0
'''

BROKEN = "this is not valid python ("


@pytest.fixture
def udf_dir(tmp_path):
    (tmp_path / "a_mod.py").write_text(textwrap.dedent(MODULE_A))
    (tmp_path / "b_mod.py").write_text(textwrap.dedent(MODULE_B))
    (tmp_path / "z_broken.py").write_text(BROKEN)
    (tmp_path / "_skipped.py").write_text(textwrap.dedent(MODULE_B))
    return str(tmp_path)


def test_module_function_discovery(udf_dir):
    fns = load_module_functions(udf_dir + "/a_mod.py")
    assert set(fns) == {"double_score", "minus_min", "identity"}


def test_directory_scan_collision_and_errors(udf_dir):
    fns = load_custom_functions(udf_dir)
    # later file wins the name collision; broken + underscore files skipped
    import pandas as pd

    assert fns["double_score"](pd.Series([1.0]), {})[0] == 3.0
    assert set(fns) == {"double_score", "minus_min", "identity"}


def test_missing_directory_is_empty():
    assert load_custom_functions("/nonexistent/dir") == {}


def test_loaded_function_as_custom_criterion(spark, udf_dir, bids_3):
    fns = load_custom_functions(udf_dir)
    res = (
        Evaluator()
        .custom("experience", 1.0, fns["minus_min"])
        .evaluate(bids_3)
    )
    got = {r["vendor"]: r["score_experience"] for r in res.collect()}
    # minus_min: experience − min(experience)=5 → A:5, B:0, C:3
    assert got == {"A": 5.0, "B": 0.0, "C": 3.0}


def test_one_arg_function_as_custom_criterion(spark, udf_dir, bids_3):
    fns = load_custom_functions(udf_dir)
    res = (
        Evaluator()
        .custom("experience", 0.5, fns["identity"])
        .evaluate(bids_3)
    )
    got = {r["vendor"]: r["score_experience"] for r in res.collect()}
    assert got == {"A": 5.0, "B": 2.5, "C": 4.0}
