"""Calendar / month-bucketing helpers (SURVEY.md §2.8 F1-F6).

The reference leans on Postgres DATE_TRUNC / INTERVAL / generate_series and
pandas strftime; these are the Spark-native equivalents. All helpers are
pure column expressions (JVM-side, codegen'd) — no UDFs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def month_floor(col) -> Column:
    """DATE_TRUNC('month', x) returning DateType.

    Reference: kpi_receita_farmer_m_passado/extract.py:43.
    """
    return F.trunc(col, "month")


def month_fmt(col) -> Column:
    """Format a month key as 'MM/yyyy' (reference strftime('%m/%Y'),
    kpi_receita_farmer_m_passado/transform.py:52)."""
    return F.date_format(col, "MM/yyyy")


def month_window(as_of: dt.date, months_back: int) -> tuple[Column, Column]:
    """Half-open trailing window [first day of (as_of month - N), first day
    of as_of month) — the reference's closed-months predicate
    (kpi_receita_farmer_m_passado/extract.py:54-55)."""
    cur = month_floor(F.lit(as_of))
    return F.add_months(cur, -months_back), cur


def month_series(
    spark: SparkSession, start: dt.date, stop: dt.date
) -> DataFrame:
    """generate_series(start, stop, interval 1 month) as a one-column
    DataFrame ``mes`` (reference kpi_receita_cliente/extract.py:41-47).

    Tiny driver-side-free sequence: sequence() + explode stays in the JVM.
    Degenerate windows (start > stop) return an EMPTY frame like
    generate_series — Spark's sequence() would raise instead.
    """
    if start.replace(day=1) > stop.replace(day=1):
        return spark.createDataFrame([], "mes date")
    return spark.range(1).select(
        F.explode(
            F.sequence(
                month_floor(F.lit(start)),
                month_floor(F.lit(stop)),
                F.expr("interval 1 month"),
            )
        ).alias("mes")
    )


def safe_cast(col, to_type: str) -> Column:
    """pd.to_numeric(errors='coerce') parity (SURVEY §2.8 F11): invalid
    values become NULL instead of raising — under Spark's default ANSI
    mode a plain cast of bad input would error the job, which is not the
    reference's defensive-coercion behavior
    (kpi_receita_farmer_m_passado/extract.py:73-75)."""
    c = col if isinstance(col, Column) else F.col(col)
    return c.try_cast(to_type)
