"""Declarative data-quality expectations.

The reference has no validation beyond DB constraints and record-count
logging (SURVEY §5); production pipelines — and especially training-data
pipelines — gate loads on explicit expectations. Each check compiles to
one predicate counted in a single pass (one job for the whole suite, not
one per rule), so a 100 TB table pays one scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    violation: Column  # TRUE ⇢ the row violates the rule


def not_null(*cols: str) -> Expectation:
    if not cols:
        raise ValueError("not_null requires at least one column")
    cond = None
    for c in cols:
        x = F.col(c).isNull()
        cond = x if cond is None else (cond | x)
    return Expectation(f"not_null({', '.join(cols)})", cond)


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col}, {lo}, {hi})",
        F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def values_in(col: str, allowed: list) -> Expectation:
    # the allowed list is part of the name: two values_in rules on the
    # same column must not collide (colliding names would silently drop
    # one rule's violations in run_expectations)
    return Expectation(
        f"values_in({col}, {allowed!r})",
        F.col(col).isNotNull() & ~F.col(col).isin(allowed),
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches({col}, {pattern})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def run_expectations(df: DataFrame, expectations: list[Expectation]) -> dict[str, int]:
    """One aggregation pass: violation count per expectation (the
    driver-side dict view of :func:`expectations_report` — one
    implementation, two shapes)."""
    return {
        r.expectation: int(r.n_violations)
        for r in expectations_report(df, expectations).collect()
    }


def enforce(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Raise on any violation; return ``df`` unchanged when clean (use as
    a gate in front of a sink)."""
    report = run_expectations(df, expectations)
    bad = {k: v for k, v in report.items() if v > 0}
    if bad:
        raise AssertionError(f"data-quality violations: {bad}")
    return df


def referential(fact: DataFrame, col: str, dim: DataFrame, dim_col: str) -> int:
    """Count of DISTINCT fact values absent from the dimension (anti-join —
    this one is a join, not a predicate, so it runs separately)."""
    return (
        fact.select(F.col(col)).where(F.col(col).isNotNull()).distinct()
        .join(dim.select(F.col(dim_col).alias(col)).distinct(), col, "left_anti")
        .count()
    )


def expectations_report(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """run_expectations as a DataFrame (no driver-side .first()): one row
    per expectation — (expectation, n_violations, n_rows). Still a single
    aggregation pass (integer sums hash-aggregate cleanly); the explode
    only reshapes the one result row."""
    if not expectations:
        raise ValueError("at least one expectation required")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate expectation names would shadow results: {dupes}")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(e.violation, 1).otherwise(0)).alias(f"__v{i}")
        for i, e in enumerate(expectations)
    ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(e.name).alias("expectation"),
            F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long").alias("n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
        )
        for i, e in enumerate(expectations)
    ]
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
