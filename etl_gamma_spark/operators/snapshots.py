"""Greatest-snapshot-per-month operators (SURVEY.md §2.4 A5, §2.3 J7).

The reference's positivador_historical is a daily per-client snapshot table;
every month is represented by its *latest* snapshot date:

  * window form: ``MAX(record_date) OVER (PARTITION BY DATE_TRUNC('month',
    record_date))`` + DISTINCT — reference
    kpi_receita_farmer_m_presente/extract.py:30-36,
    kpi_receita_cliente/extract.py:92-100;
  * scalar-subquery form: ``WHERE record_date = (SELECT MAX(record_date)
    ...)`` — reference kpi_fechamento_m_presente/extract.py:112-116.

Spark-first: a groupBy().agg(max) produces the same (month, last-date) set
with one partial-aggregated shuffle over a tiny key space (#months), and
the join back to the snapshot table broadcasts the aggregate — no window
materialization over the full fact, no DISTINCT. At 100 TB the snapshot
table is large; this plan touches it twice (agg scan + filtered join scan)
but both scans prune columns and the join side is a broadcast of ~#months
rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import month_floor


def latest_snapshot_dates(
    snapshots: DataFrame,
    date_col: str = "record_date",
    month: dt.date | None = None,
) -> DataFrame:
    """(mes, ultima_data): the latest snapshot date of each month.

    ``month`` restricts to a single month (the reference's
    ``DATE_TRUNC('month', record_date) = DATE_TRUNC('month', NOW())``).
    """
    df = snapshots
    if month is not None:
        # floor the literal too: a mid-month date would otherwise silently
        # match nothing (the reference truncates BOTH sides)
        df = df.filter(month_floor(F.col(date_col)) == F.lit(month.replace(day=1)))
    return df.groupBy(month_floor(F.col(date_col)).alias("mes")).agg(
        F.max(date_col).alias("ultima_data")
    )


def latest_snapshot_rows(
    snapshots: DataFrame,
    date_col: str = "record_date",
    month: dt.date | None = None,
) -> DataFrame:
    """Snapshot rows restricted to each month's latest snapshot date.

    Equivalent to the reference's ``JOIN ... ON udm.ultima_data =
    ph.record_date`` pattern (kpi_fechamento_m_presente/extract.py:89-91).
    """
    # rename the helper month key before joining: leaking a 'mes' column
    # would collide with snapshot tables that already carry one
    dates = latest_snapshot_dates(snapshots, date_col, month).withColumnRenamed(
        "mes", "__snap_mes"
    )
    cond = F.col(date_col) == F.col("ultima_data")
    return (
        snapshots.join(F.broadcast(dates), cond, "inner")
        .drop("ultima_data", "__snap_mes")
    )
