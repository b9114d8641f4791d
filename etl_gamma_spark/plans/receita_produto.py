"""Pipeline: revenue by (month, category, product, farmer).

Reference: kpis/farmer/receita/kpi_receita_produto_f_m_passado/
  extract.py:45-75 (5-key GROUP BY over the 3-way join, trailing-months
  window), transform.py:36-67 (closed-month filter P8, NULL→'OUTROS'
  bucketing F10, round 2dp, positive-revenue filter P7, categoria/produto
  rename).

Scale posture: same single-shuffle aggregate as receita_farmer_m_passado,
just on a wider key; dims broadcast. Note the reference builds this query
with f-string interpolation (SQL-injection-prone, extract.py:60,66) — a
parameterized DataFrame plan has no such surface.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import month_floor, month_fmt, month_window
from ..rates import NET_COMMISSION_FACTOR


def receita_produto_f_m_passado(
    revenue: DataFrame,
    clients: DataFrame,
    employees: DataFrame,
    *,
    as_of: dt.date,
    months_back: int = 11,
    farmer_id: int | None = None,
) -> DataFrame:
    lower, cur = month_window(as_of, months_back)

    fact = revenue.filter(
        (F.col("record_date") >= lower)
        & (month_floor(F.col("record_date")) < cur)
    )
    # raw keys for grouping (reference extract.py:69-75 groups the
    # NULL-able category/product and the TEXT farmer_id; relabelling to
    # 'OUTROS' happens AFTER aggregation in transform.py:42-50 — grouping
    # on coalesced keys would merge a NULL group with a literal 'OUTROS')
    cli = clients.select(
        "client_id",
        F.col("farmer_id").alias("farmer_text"),
        F.col("farmer_id").cast("int").alias("farmer_key"),
    )
    if farmer_id is not None:
        cli = cli.filter(F.col("farmer_key") == F.lit(farmer_id))
    emp = employees.select("employee_id", F.col("name").alias("employee_name"))

    out = (
        fact.join(F.broadcast(cli), "client_id")
        .join(F.broadcast(emp), F.col("farmer_key") == F.col("employee_id"))
        .groupBy(
            month_floor(F.col("record_date")).alias("mes"),
            F.col("category"),
            F.col("product"),
            F.col("farmer_text"),
            F.col("employee_name"),
        )
        .agg(
            F.expr("CAST(SUM(gross_revenue) AS DECIMAL(18,2))").alias("receita_bruta"),
            F.expr("CAST(SUM(net_revenue) AS DECIMAL(18,2))").alias("receita_liquida"),
            F.expr("CAST(SUM(gross_commission) AS DECIMAL(18,2))").alias("comissao_bruta"),
            F.expr(
                f"CAST(ROUND(SUM(gross_commission * {NET_COMMISSION_FACTOR}), 2)"
                " AS DECIMAL(18,2))"
            ).alias("comissao_liquida"),
        )
        # P7: keep only positive revenue (transform.py:63)
        .filter(F.col("receita_bruta") > 0)
        .select(
            "mes",
            month_fmt(F.col("mes")).alias("mes_formatado"),
            F.coalesce(F.col("category"), F.lit("OUTROS")).alias("categoria"),
            F.coalesce(F.col("product"), F.lit("OUTROS")).alias("produto"),
            F.col("farmer_text").cast("int").alias("farmer_id"),
            "employee_name",
            "receita_bruta",
            "receita_liquida",
            "comissao_bruta",
            "comissao_liquida",
        )
    )
    return out
