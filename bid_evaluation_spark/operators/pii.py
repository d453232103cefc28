"""PII detection and redaction over text columns — native regex Column
expressions, no Python in the hot path.

Beyond-reference operator (BASELINE.json north star: the PII-scrubbing pass
a training-data pipeline runs before publishing or training). Regex-based
detectors for the classic structured identifiers (emails, IPv4 addresses,
US-style SSNs and phone numbers); free-text PII (names, addresses) needs an
NER model and is explicitly out of scope here.

Patterns are written in the portable subset shared by Java regex (Spark) and
RE2 (DuckDB, Go): no lookaround, no backreferences — so redaction has an
exact cross-engine oracle. Scale shape: map-only projection, one
``regexp_count`` + chained ``regexp_replace`` per pattern, whole-stage
codegen, no shuffle.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

#: (name, pattern, replacement) applied in order; counts use the ORIGINAL
#: text, replacements chain (each runs on the previous result).
DEFAULT_PII_PATTERNS: Tuple[Tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(df: DataFrame, text_col: str = "text",
               patterns: Sequence[Tuple[str, str, str]] = DEFAULT_PII_PATTERNS,
               ) -> DataFrame:
    """Append one ``n_<name>`` match-count column per pattern (counted on
    the unmodified text; patterns are counted independently)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
         .alias(f"n_{name}")
        for name, pat, _ in patterns
    ]
    return df.select("*", *counts)


def redact_pii(df: DataFrame, text_col: str = "text",
               patterns: Sequence[Tuple[str, str, str]] = DEFAULT_PII_PATTERNS,
               with_counts: bool = True) -> DataFrame:
    """Replace every pattern match with its placeholder, in pattern order
    (each replacement runs on the previous pattern's output, so e.g. the
    email rule consumes its address before the IPv4 rule could see digits
    inside it). With ``with_counts``, also append ``n_<name>`` columns
    counted on the ORIGINAL text."""
    red = F.col(text_col)
    for _, pat, rep in patterns:
        red = F.regexp_replace(red, pat, rep)
    counts = []
    if with_counts:
        counts = [
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
             .alias(f"n_{name}")
            for name, pat, _ in patterns
        ]
    keep = [c for c in df.columns if c != text_col]
    return df.select(*keep, red.alias(text_col), *counts)
