"""Client→farmer responsibility periods and point-in-time interval joins.

Reference: utils/client_responsibility.py (period derivation :34-104; the
O(rows × periods) pandas ``apply`` interval matching :161-283 that this
module replaces with relational non-equi joins); the same period SQL is
re-derived inline at kpi_fechamento_m_presente/extract.py:132-163.

Semantics (half-open, SCD-2-like):
  * a period is [start_date, end_date) with NULL end = open-ended;
  * membership: start <= d AND (end IS NULL OR d < end)
    (client_responsibility.py:151,213);
  * periods = union of
      1. never-transferred clients: [creation_date, NULL) at the client's
         original farmer (anti-join against FARMER transfers),
      2. per transfer, new farmer: [transfer_date, next transfer_date),
      3. per transfer, old farmer: [prev transfer_date | creation_date,
         transfer_date).

Determinism note: the reference orders its LEAD/LAG windows by
``transfer_date`` alone, which is nondeterministic when a client has two
transfers on the same date. This engine refines the order to
(transfer_date, new_farmer_id, old_farmer_id) — a total order — so results
are reproducible; for data without same-day transfers this is identical to
the reference.

Scale posture: the periods table is dimension-sized (≤ a few rows per
client), so the non-equi joins broadcast it; Catalyst executes a
BroadcastNestedLoopJoin for the pure range predicate, but we keep the
equi-key (client_id) in the join condition so Spark can use a broadcast
HASH join on client_id with the range conditions as post-join filters —
O(|fact|) work, no cartesian blowup, no shuffle of the fact table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import bcast_attach


def _farmer_transfers(transfers: DataFrame) -> DataFrame:
    return transfers.filter(F.col("transfer_type") == "FARMER")


def _transfer_window():
    # total order; see determinism note above
    return Window.partitionBy("client_id").orderBy(
        "transfer_date", "new_farmer_id", "old_farmer_id"
    )


def client_farmer_periods(
    clients: DataFrame,
    transfers: DataFrame,
    employees: DataFrame | None = None,
    *,
    start_date: dt.date | None = None,
    end_date: dt.date | None = None,
) -> DataFrame:
    """Build the responsibility-period dimension.

    Columns: client_id, farmer_id (int), start_date, end_date (nullable),
    farmer_name (when ``employees`` given; LEFT JOIN like the reference).
    """
    ft = _farmer_transfers(transfers)

    # 1. never transferred → original farmer, open-ended (J4 anti-join)
    original = (
        clients.join(ft.select("client_id").distinct(), "client_id", "left_anti")
        .select(
            "client_id",
            F.col("farmer_id").cast("int").alias("farmer_id"),
            F.col("creation_date").alias("start_date"),
            F.lit(None).cast("date").alias("end_date"),
        )
    )

    # 2. receiving farmer: [transfer_date, next transfer_date) (W1 LEAD)
    new_periods = (
        ft.filter(F.col("new_farmer_id").isNotNull())
        .withColumn("end_date", F.lead("transfer_date").over(_transfer_window()))
        .select(
            "client_id",
            F.col("new_farmer_id").cast("int").alias("farmer_id"),
            F.col("transfer_date").alias("start_date"),
            "end_date",
        )
    )

    # 3. giving farmer: [prev transfer_date | creation_date, transfer_date)
    #    (W2 LAG + correlated creation_date resolved as a broadcast join)
    old_periods = (
        ft.filter(F.col("old_farmer_id").isNotNull())
        .withColumn("prev_transfer", F.lag("transfer_date").over(_transfer_window()))
        .join(
            F.broadcast(clients.select("client_id", "creation_date")),
            "client_id",
            "left",
        )
        .select(
            "client_id",
            F.col("old_farmer_id").cast("int").alias("farmer_id"),
            F.coalesce("prev_transfer", "creation_date").alias("start_date"),
            F.col("transfer_date").alias("end_date"),
        )
    )

    periods = original.unionByName(new_periods).unionByName(old_periods)

    # optional date-range pruning (client_responsibility.py:94-100)
    if start_date is not None:
        periods = periods.filter(
            F.col("end_date").isNull() | (F.col("end_date") >= F.lit(start_date))
        )
    if end_date is not None:
        periods = periods.filter(F.col("start_date") <= F.lit(end_date))

    if employees is not None:
        periods = periods.join(
            F.broadcast(
                employees.select(
                    F.col("employee_id"), F.col("name").alias("farmer_name")
                )
            ),
            periods.farmer_id == F.col("employee_id"),
            "left",
        ).drop("employee_id")

    return periods


def _membership_cond(fact: DataFrame, periods: DataFrame, date_col: str):
    d = fact[date_col]
    return (
        (fact["client_id"] == periods["client_id"])
        & (periods["start_date"] <= d)
        & (periods["end_date"].isNull() | (d < periods["end_date"]))
    )


def filter_by_responsibility(
    fact: DataFrame,
    periods: DataFrame,
    date_col: str,
    farmer_id: int | None = None,
) -> DataFrame:
    """Semi-join: keep fact rows whose (client, date) falls inside a period
    (optionally: a period of one given farmer).

    Replaces the reference's per-row pandas ``is_in_period`` apply
    (client_responsibility.py:205-219) with a broadcast left-semi join.
    """
    p = periods
    if farmer_id is not None:
        p = p.filter(F.col("farmer_id") == F.lit(farmer_id))
    p = p.select("client_id", "start_date", "end_date")
    return fact.join(F.broadcast(p), _membership_cond(fact, p, date_col), "left_semi")


def add_responsible_farmer(
    fact: DataFrame,
    periods: DataFrame,
    date_col: str,
) -> DataFrame:
    """Enrichment: add responsible_farmer_id / responsible_farmer_name.

    Replaces client_responsibility.py:262-276. The reference takes the
    *first* matching period in (client_id, start_date) scan order; we make
    that deterministic: among matching periods pick MIN(start_date), then
    MIN(farmer_id). Implemented as a distinct (client, date) lookup joined
    against broadcast periods, ranked, then equi-joined back — the fact
    table itself is never duplicated or shuffled on a range key.
    """
    keys = fact.select("client_id", date_col).distinct()
    p = periods.select("client_id", "farmer_id", "start_date", "end_date", "farmer_name")
    matched = keys.join(F.broadcast(p), _membership_cond(keys, p, date_col), "left").select(
        keys["client_id"].alias("k_client_id"),
        keys[date_col].alias("k_date"),
        p["farmer_id"].alias("responsible_farmer_id"),
        p["farmer_name"].alias("responsible_farmer_name"),
        p["start_date"].alias("p_start"),
    )
    w = Window.partitionBy("k_client_id", "k_date").orderBy(
        F.col("p_start").asc_nulls_last(), F.col("responsible_farmer_id").asc_nulls_last()
    )
    best = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k_client_id", "k_date", "responsible_farmer_id", "responsible_farmer_name")
    )
    return fact.join(
        F.broadcast(best),
        (fact["client_id"] == best["k_client_id"]) & (fact[date_col] == best["k_date"]),
        "left",
    ).drop("k_client_id", "k_date")


def filter_by_responsibility_bucketed(
    fact: DataFrame,
    periods: DataFrame,
    date_col: str,
    farmer_id: int | None = None,
) -> DataFrame:
    """Scale-path variant of :func:`filter_by_responsibility` for when the
    period dimension outgrows broadcast (SURVEY.md §4's "bucketed
    range-join"): explode each period across the month buckets it spans,
    then EQUI-join on (client_id, month_bucket) with the half-open range
    check as a residual filter.

    Both sides shuffle-partition on the same composite key, so the join is
    a plain hash join — no nested-loop, no broadcast requirement. Period
    explosion is bounded: a period spanning M months yields M rows.

    Open-ended periods are clamped to the fact's max date (computed as a
    1-row broadcast, never collected). Zero-length periods [d, d) match
    nothing and are dropped up front (also keeps Spark's sequence() from
    generating a descending range).
    """
    bound = fact.agg(F.max(date_col).alias("__max_d"))
    p = periods
    if farmer_id is not None:
        p = p.filter(F.col("farmer_id") == F.lit(farmer_id))
    p = (
        bcast_attach(p, bound, "start_date", "__max_d")
        .filter(F.col("start_date") <= F.col("__max_d"))
        .withColumn("__end_eff", F.coalesce(F.col("end_date"), F.date_add(F.col("__max_d"), 1)))
        .filter(F.col("start_date") < F.col("__end_eff"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.trunc("start_date", "month"),
                    F.trunc(F.date_sub(F.col("__end_eff"), 1), "month"),
                    F.expr("interval 1 month"),
                )
            ),
        )
        .select("client_id", "start_date", "end_date", "__bucket")
    )
    f = fact.withColumn("__bucket", F.trunc(F.col(date_col), "month"))
    cond = (
        (f["client_id"] == p["client_id"])
        & (f["__bucket"] == p["__bucket"])
        & (p["start_date"] <= f[date_col])
        & (p["end_date"].isNull() | (f[date_col] < p["end_date"]))
    )
    return f.join(p, cond, "left_semi").drop("__bucket")


def get_responsible_farmer(
    periods: DataFrame, client_id: int, date: dt.date
) -> tuple[int | None, str | None]:
    """Single-point lookup API (reference client_responsibility.py:122-159):
    which farmer was responsible for ``client_id`` on ``date``.

    For repeated lookups pass a cached ``periods``; the filter prunes to
    one client before collecting (≤ a handful of rows)."""
    rows = (
        periods.filter(
            (F.col("client_id") == client_id)
            & (F.col("start_date") <= F.lit(date))
            & (F.col("end_date").isNull() | (F.lit(date) < F.col("end_date")))
        )
        .orderBy(F.col("start_date").asc_nulls_last(), F.col("farmer_id").asc_nulls_last())
        .select("farmer_id", "farmer_name")
        .take(1)
    )
    if not rows:
        return None, None
    return rows[0].farmer_id, rows[0].farmer_name
