"""Pipeline: monthly revenue & commission per farmer, trailing closed months.

Reference: kpis/farmer/receita/kpi_receita_farmer_m_passado/
  extract.py:41-64 (3-way join + month-window filter + 4 SUMs),
  transform.py:38-52 (rounding, MM/YYYY formatting), load.py (fonte flag).

Spark-first shape: the fact scan keeps only the filter-relevant months
(predicate pushdown reaches the parquet scan), both dimensions are
broadcast (they are small per the reference's data model — clients and
employees are dimension tables), so the only shuffle is the final
hash-aggregate on (mes, farmer_id) — which is also the minimum possible.
At 100 TB the fact table is the only big input; partial aggregation
(map-side combine) happens before the exchange.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import month_floor, month_fmt, month_window
from ..rates import NET_COMMISSION_FACTOR


def receita_farmer_m_passado(
    revenue: DataFrame,
    clients: DataFrame,
    employees: DataFrame,
    *,
    as_of: dt.date,
    months_back: int = 11,
    farmer_id: int | None = None,
) -> DataFrame:
    lower, cur_month = month_window(as_of, months_back)

    fact = revenue.filter(
        (F.col("record_date") >= lower)
        & (month_floor(F.col("record_date")) < cur_month)
    )

    # clients.farmer_id is TEXT holding an int — cast before the join,
    # exactly as the reference does in every query (extract.py:44,52).
    # The raw text key is kept for GROUPING: the reference groups by the
    # TEXT column (extract.py:54), so two spellings of one id ('7'/'07')
    # stay separate rows — grouping on the cast would merge them.
    cli = clients.select(
        "client_id",
        F.col("farmer_id").alias("farmer_text"),
        F.col("farmer_id").cast("int").alias("farmer_key"),
    )
    if farmer_id is not None:
        # optional-predicate variant (SURVEY §2.2 P5) — a plain conditional
        # filter; no dynamic SQL string building needed.
        cli = cli.filter(F.col("farmer_key") == F.lit(farmer_id))

    emp = employees.select(
        F.col("employee_id"), F.col("name").alias("employee_name")
    )

    joined = (
        fact.join(F.broadcast(cli), "client_id")
        .join(F.broadcast(emp), F.col("farmer_key") == F.col("employee_id"))
    )

    out = (
        joined.groupBy(
            month_floor(F.col("record_date")).alias("mes"),
            F.col("farmer_text"),
            F.col("employee_name"),
        )
        .agg(
            F.expr("CAST(SUM(gross_revenue) AS DECIMAL(18,2))").alias("receita_bruta"),
            F.expr("CAST(SUM(net_revenue) AS DECIMAL(18,2))").alias("receita_liquida"),
            F.expr("CAST(SUM(gross_commission) AS DECIMAL(18,2))").alias("comissao_bruta"),
            # net commission factor applied pre-sum, rounded once at the
            # end (decimal arithmetic is exact, so round placement only
            # matters at the final 2dp cut — matches reference output)
            F.expr(
                f"CAST(ROUND(SUM(gross_commission * {NET_COMMISSION_FACTOR}), 2)"
                " AS DECIMAL(18,2))"
            ).alias("comissao_liquida"),
        )
        .select(
            "mes",
            month_fmt(F.col("mes")).alias("mes_formatado"),
            F.col("farmer_text").cast("int").alias("farmer_id"),
            "employee_name",
            "receita_bruta",
            "receita_liquida",
            "comissao_bruta",
            "comissao_liquida",
            F.lit("historical").alias("fonte"),
        )
    )
    return out
