"""Pipeline: in-flight current-month revenue, blending three sources.

Reference: kpis/farmer/receita/kpi_receita_farmer_m_presente/
  extract.py:29-105 (latest-snapshot CTE + weighted positivador sums +
  LEFT JOIN coe/op monthly aggregates), transform.py (round 2dp +
  MM/YYYY month format).

Output grain: one row per month (the current month), columns
(mes, mes_formatado, receita_bruta, receita_liquida=NULL, comissao_bruta,
comissao_liquida) — receita_liquida is NULL::numeric in the reference
(extract.py:73).

Scale posture: three independent aggregations (positivador / coe / op),
each reduced to a ~1-row aggregate before the LEFT JOINs, which AQE turns
into broadcasts. The snapshot restriction uses the broadcast
latest-snapshot join (operators/snapshots.py), never a window over the
full fact.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import month_floor, month_fmt
from ..operators.snapshots import latest_snapshot_rows
from ..rates import RATE_BOVESPA_FUTURES, RATE_COE_STRUCT, RATE_FIXED_INCOME_RENT, RATE_NET

# weighted positivador revenue / commission expressions (extract.py:65-89)
POS_REVENUE_EXPR = """
COALESCE(bovespa_revenue, 0) + COALESCE(futures_revenue, 0)
+ COALESCE(bank_fixed_income_revenue, 0) + COALESCE(private_fixed_income_revenue, 0)
+ COALESCE(public_fixed_income_revenue, 0) + COALESCE(rent_revenue, 0)
"""
POS_COMMISSION_EXPR = f"""
(COALESCE(bovespa_revenue, 0) * {RATE_BOVESPA_FUTURES})
+ (COALESCE(futures_revenue, 0) * {RATE_BOVESPA_FUTURES})
+ (COALESCE(bank_fixed_income_revenue, 0) * {RATE_FIXED_INCOME_RENT})
+ (COALESCE(private_fixed_income_revenue, 0) * {RATE_FIXED_INCOME_RENT})
+ (COALESCE(public_fixed_income_revenue, 0) * {RATE_FIXED_INCOME_RENT})
+ (COALESCE(rent_revenue, 0) * {RATE_FIXED_INCOME_RENT})
"""
# COE revenue: financial_value * commission_percentage / 100; the division
# is expressed as * 0.01 so the arithmetic stays exact decimal (identical
# in Spark and DuckDB; decimal division rounding rules differ by engine).
COE_REVENUE_EXPR = "financial_value * commission_percentage * 0.01"


def _dim_joined(fact: DataFrame, clients: DataFrame, employees: DataFrame) -> DataFrame:
    """fact ⋈ clients ⋈ employees on the text-cast farmer key (J1)."""
    cli = clients.select("client_id", F.col("farmer_id").cast("int").alias("farmer_key"))
    emp = employees.select("employee_id")
    return fact.join(F.broadcast(cli), "client_id").join(
        F.broadcast(emp), F.col("farmer_key") == F.col("employee_id")
    )


def receita_farmer_m_presente(
    positivador: DataFrame,
    coe: DataFrame,
    operacoes: DataFrame,
    clients: DataFrame,
    employees: DataFrame,
    *,
    as_of: dt.date,
) -> DataFrame:
    cur = month_floor(F.lit(as_of))

    # positivador: latest snapshot of the current month, weighted rates
    pos = latest_snapshot_rows(
        positivador.filter(month_floor(F.col("record_date")) == cur)
    )
    pos_agg = (
        _dim_joined(pos, clients, employees)
        .groupBy(month_floor(F.col("record_date")).alias("mes"))
        .agg(
            F.expr(f"SUM({POS_REVENUE_EXPR}) AS receita_pos"),
            F.expr(f"SUM({POS_COMMISSION_EXPR}) AS comissao_pos"),
        )
    )

    # COE: current-month liquidated operations (left-joined aggregate, J2)
    coe_agg = (
        _dim_joined(
            coe.filter(
                (F.col("status") == "Liquidada")
                & (month_floor(F.col("date")) == cur)
            ),
            clients,
            employees,
        )
        .groupBy(month_floor(F.col("date")).alias("mes"))
        .agg(
            F.expr(f"SUM({COE_REVENUE_EXPR}) AS receita_coe"),
            F.expr(f"SUM(({COE_REVENUE_EXPR}) * {RATE_COE_STRUCT}) AS comissao_coe"),
            F.expr(
                f"SUM(({COE_REVENUE_EXPR}) * {RATE_COE_STRUCT} * {RATE_NET})"
                " AS liquida_coe"
            ),
        )
    )

    # structured operations: current-month non-cancelled
    op_agg = (
        _dim_joined(
            operacoes.filter(
                (F.col("status_operacao") != "Cancelado")
                & (month_floor(F.col("data")) == cur)
            ),
            clients,
            employees,
        )
        .groupBy(month_floor(F.col("data")).alias("mes"))
        .agg(
            F.expr("SUM(comissao) AS receita_op"),
            F.expr(f"SUM(comissao * {RATE_COE_STRUCT}) AS comissao_op"),
            F.expr(f"SUM(comissao * {RATE_COE_STRUCT} * {RATE_NET}) AS liquida_op"),
        )
    )

    # the three aggregates are ≤ 1 row per month — broadcast the joined
    # sides explicitly instead of waiting for AQE runtime conversion
    out = (
        pos_agg.join(F.broadcast(coe_agg), "mes", "left")
        .join(F.broadcast(op_agg), "mes", "left")
        .select(
            "mes",
            month_fmt(F.col("mes")).alias("mes_formatado"),
            F.expr(
                "CAST(ROUND(receita_pos + COALESCE(receita_coe, 0)"
                " + COALESCE(receita_op, 0), 2) AS DECIMAL(18,2))"
            ).alias("receita_bruta"),
            F.lit(None).cast("decimal(18,2)").alias("receita_liquida"),
            F.expr(
                "CAST(ROUND(comissao_pos + COALESCE(comissao_coe, 0)"
                " + COALESCE(comissao_op, 0), 2) AS DECIMAL(18,2))"
            ).alias("comissao_bruta"),
            F.expr(
                f"CAST(ROUND(comissao_pos * {RATE_NET} + COALESCE(liquida_coe, 0)"
                " + COALESCE(liquida_op, 0), 2) AS DECIMAL(18,2))"
            ).alias("comissao_liquida"),
        )
    )
    return out
