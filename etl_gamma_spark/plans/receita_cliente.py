"""Pipeline: row-level revenue detail per client per operation type.

Reference: kpis/farmer/receita/kpi_receita_cliente/
  extract.py:75-177 (positivador detail over latest-snapshot-per-month),
  :179-247 (COE detail), :249-317 (structured-ops detail) — three
  extractors pre-shaped to a 15-column common schema with typed NULL/0
  padding; transform.py:33-86 (concat + month columns + fillna(0) +
  round 2dp), :89-129 (sort + updated_at stamp).

Spark-first: each source is a lazy DataFrame normalized to the common
schema and combined with unionByName — one job, three parallel branches,
no driver-side materialization. The optional farmer scoping reuses the
responsibility interval semi-join (operators/responsibility.py) instead of
the reference's O(rows × periods) pandas apply.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import month_floor, month_fmt
from ..operators.responsibility import filter_by_responsibility
from ..operators.snapshots import latest_snapshot_rows
from ..rates import RATE_COE_STRUCT, RATE_NET
from .receita_farmer_presente import (
    COE_REVENUE_EXPR,
    POS_COMMISSION_EXPR,
    POS_REVENUE_EXPR,
)

MONEY_COLS = (
    "valor_financeiro", "percentual_comissao", "receita_bruta",
    "comissao_bruta", "comissao_liquida", "churn", "patrimony", "net_capture",
)


def _with_dims(fact: DataFrame, clients: DataFrame, employees: DataFrame) -> DataFrame:
    cli = clients.select(
        "client_id",
        F.col("name").alias("nome_cliente"),
        F.col("farmer_id").cast("int").alias("farmer_key"),
    )
    emp = employees.select("employee_id", F.col("name").alias("nome_farmer"))
    return fact.join(F.broadcast(cli), "client_id").join(
        F.broadcast(emp), F.col("farmer_key") == F.col("employee_id")
    )


def _dec0() -> F.Column:
    return F.lit(0).cast("decimal(18,2)")


def _decnull() -> F.Column:
    return F.lit(None).cast("decimal(18,2)")


def receita_cliente(
    positivador: DataFrame,
    coe: DataFrame,
    operacoes: DataFrame,
    clients: DataFrame,
    employees: DataFrame,
    *,
    data_inicio: dt.date,
    data_fim: dt.date,
    farmer_id: int | None = None,
    periods: DataFrame | None = None,
) -> DataFrame:
    """Union of the three normalized detail sources (U2), optionally
    responsibility-scoped (J5) when ``farmer_id`` and ``periods`` given."""

    if farmer_id is not None and periods is None:
        # silently returning every farmer's rows for a single-farmer query
        # would be data corruption, not a default
        raise ValueError("farmer_id scoping requires a periods DataFrame")

    def in_range(col: str) -> F.Column:
        return F.col(col).between(F.lit(data_inicio), F.lit(data_fim))

    # --- branch 1: positivador (latest snapshot per month) ------------
    pos = latest_snapshot_rows(positivador.filter(in_range("record_date")))
    pos_detail = _with_dims(pos, clients, employees).select(
        F.lit("Positivador").alias("tipo_operacao"),
        F.col("record_date").alias("data_operacao"),
        "client_id",
        "nome_cliente",
        F.col("farmer_key").alias("farmer_id"),
        "nome_farmer",
        _dec0().alias("valor_financeiro"),
        _dec0().alias("percentual_comissao"),
        F.expr(f"CAST(ROUND({POS_REVENUE_EXPR}, 2) AS DECIMAL(18,2))").alias("receita_bruta"),
        F.expr(f"CAST(ROUND({POS_COMMISSION_EXPR}, 2) AS DECIMAL(18,2))").alias("comissao_bruta"),
        F.expr(
            f"CAST(ROUND(({POS_COMMISSION_EXPR}) * {RATE_NET}, 2) AS DECIMAL(18,2))"
        ).alias("comissao_liquida"),
        F.lit(None).cast("string").alias("status"),
        F.col("churn").cast("decimal(18,2)").alias("churn"),
        F.col("patrimony").cast("decimal(18,2)").alias("patrimony"),
        F.col("net_capture").cast("decimal(18,2)").alias("net_capture"),
    )

    # --- branch 2: COE ('Liquidada' only) ------------------------------
    coe_detail = _with_dims(
        coe.filter((F.col("status") == "Liquidada") & in_range("date")),
        clients,
        employees,
    ).select(
        F.lit("COE").alias("tipo_operacao"),
        F.col("date").alias("data_operacao"),
        "client_id",
        "nome_cliente",
        F.col("farmer_key").alias("farmer_id"),
        "nome_farmer",
        F.col("financial_value").cast("decimal(18,2)").alias("valor_financeiro"),
        F.col("commission_percentage").cast("decimal(18,2)").alias("percentual_comissao"),
        F.expr(f"CAST(ROUND({COE_REVENUE_EXPR}, 2) AS DECIMAL(18,2))").alias("receita_bruta"),
        F.expr(
            f"CAST(ROUND(({COE_REVENUE_EXPR}) * {RATE_COE_STRUCT}, 2) AS DECIMAL(18,2))"
        ).alias("comissao_bruta"),
        F.expr(
            f"CAST(ROUND(({COE_REVENUE_EXPR}) * {RATE_COE_STRUCT} * {RATE_NET}, 2)"
            " AS DECIMAL(18,2))"
        ).alias("comissao_liquida"),
        "status",
        _decnull().alias("churn"),
        _decnull().alias("patrimony"),
        _decnull().alias("net_capture"),
    )

    # --- branch 3: structured operations (non-cancelled) ---------------
    op_detail = _with_dims(
        operacoes.filter((F.col("status_operacao") != "Cancelado") & in_range("data")),
        clients,
        employees,
    ).select(
        F.lit("Operação Estruturada").alias("tipo_operacao"),
        F.col("data").alias("data_operacao"),
        "client_id",
        "nome_cliente",
        F.col("farmer_key").alias("farmer_id"),
        "nome_farmer",
        _dec0().alias("valor_financeiro"),
        _dec0().alias("percentual_comissao"),
        F.col("comissao").cast("decimal(18,2)").alias("receita_bruta"),
        F.expr(f"CAST(ROUND(comissao * {RATE_COE_STRUCT}, 2) AS DECIMAL(18,2))").alias("comissao_bruta"),
        F.expr(
            f"CAST(ROUND(comissao * {RATE_COE_STRUCT} * {RATE_NET}, 2) AS DECIMAL(18,2))"
        ).alias("comissao_liquida"),
        F.col("status_operacao").alias("status"),
        _decnull().alias("churn"),
        _decnull().alias("patrimony"),
        _decnull().alias("net_capture"),
    )

    combined = pos_detail.unionByName(coe_detail).unionByName(op_detail)

    if farmer_id is not None and periods is not None:
        combined = filter_by_responsibility(combined, periods, "data_operacao", farmer_id)

    # transform: month cols + fillna(0) on numerics (transform.py:68-79)
    out = combined.select(
        "*",
        month_floor(F.col("data_operacao")).alias("mes"),
        month_fmt(F.col("data_operacao")).alias("mes_formatado"),
    )
    out = out.na.fill(0, subset=list(MONEY_COLS))
    # O1 multi-key mixed-direction sort (transform.py:122)
    return out.orderBy(
        F.col("data_operacao").desc(),
        F.col("tipo_operacao").asc(),
        F.col("nome_cliente").asc(),
    )
