"""Data-quality constraint checking (Deequ-style, DataFrame-native).

A production ingestion pipeline validates every batch before it reaches
training: completeness (null fraction), uniqueness, value ranges, set
membership. Each constraint compiles to a conditional aggregate over ONE
shared scan — checking 20 constraints costs one pass with map-side
partial aggregation, not 20 jobs (the naive per-check `df.filter(...)
.count()` loop is 20 scans).

No reference analogue (go-streams ships no validation operators); this
is part of the beyond-reference training-pipeline surface (SURVEY §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violation`` marks each BAD row."""
    name: str
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"{col}_in_range",
                 ~F.col(col).between(F.lit(lo), F.lit(hi)))


def is_in(col: str, allowed: Sequence) -> Check:
    return Check(f"{col}_is_in", ~F.col(col).isin(list(allowed)))


def matches(col: str, regex: str) -> Check:
    return Check(f"{col}_matches", ~F.col(col).rlike(regex))


def check_report(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run every check in ONE aggregation pass.

    Returns one row per check: ``(check, n_rows, n_violations,
    violation_frac)`` — long format via a single Expand over the
    aggregated counters (constant-size state per check).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in checks:
        aggs.append(F.count(F.when(c.violation, F.lit(1))).alias(c.name))
    row = df.agg(*aggs)
    pairs = []
    for c in checks:
        pairs.extend([F.lit(c.name), F.col(c.name)])
    stacked = row.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(checks)), *pairs).alias("check", "n_violations"))
    return stacked.select(
        "check", "n_rows", "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6)
         .alias("violation_frac"))


def uniqueness_report(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Duplicate-key accounting: ``(n_keys, n_dup_keys, n_dup_rows)``.

    Separate from :func:`check_report` because uniqueness needs a keyed
    aggregate (one shuffle on the key), not a global conditional count.
    """
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count(F.when(F.col("c") > 1, F.lit(1))).alias("n_dup_keys"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
         .cast("long").alias("n_dup_rows"))
