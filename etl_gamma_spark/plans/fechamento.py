"""Pipeline: monthly commission closing (fechamento) per farmer.

Reference: kpis/farmer/comissao/kpi_fechamento_m_presente/extract.py:37-286
— one ~250-line SQL statement with nested CTEs (calculo_receita over
latest-snapshot positivador + COE + structured ops; total_captacao /
total_churn at the month's last snapshot; client_farmer_periods; final
CASE-ladder bonus logic), plus transform.py:14-60 (mes columns,
is_current_month flag, fillna(0).round(2)).

This plan decomposes the mega-query into named DataFrame builders composed
lazily — identical semantics, testable pieces, and Catalyst fuses them back
into one physical plan.

It is **parameterized by month**, which also repairs the reference's broken
kpi_fechamento_m_passado package (its main.py imports functions that don't
exist — SURVEY.md §3): passado = this plan at a historical month with
``is_current_month=False``; presente = month of ``as_of``. The passado
schema's extra periodo_responsabilidade_inicio/fim DATE columns
(utils/db_schema_farmer/db_schema_comissao.py:51-87) are produced here for
both; the reference's presente-only ``DATE[]`` array form
(extract.py:169-172) is available via :func:`periodo_array`.

Scale posture: every CTE reduces to a per-farmer aggregate (≤ #employees
rows) before joining — the final join tree is all-broadcast; the only
shuffles are the partial-aggregated groupBys over each fact slice.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import month_floor, month_fmt
from ..operators.responsibility import client_farmer_periods
from ..operators.similarity import bcast_attach
from ..operators.snapshots import latest_snapshot_rows
from ..rates import RATE_COE_STRUCT
from .receita_farmer_presente import (
    COE_REVENUE_EXPR,
    POS_COMMISSION_EXPR,
    POS_REVENUE_EXPR,
)

MONEY_COLS = (
    "churn_total", "meta_churn", "porcentagem_churn", "bonus_churn",
    "captacao_total", "meta_captacao", "porcentagem_captacao", "bonus_captacao",
    "receita_total", "meta_receita", "porcentagem_receita", "bonus_receita",
    "comissao_bruta_total", "bonus_total",
)


def _bonus_case(metric: str, target: str, jr: str, pl: str) -> str:
    """The reference's bonus CASE ladder (extract.py:184-226): percentage of
    gross commission, rounded *before* the bonus_total sum (F8 round-order
    parity). Division by 100 is expressed as * 0.01 to stay in exact
    decimal arithmetic."""
    return f"""CASE
        WHEN {metric} >= {target} AND hierarchy_level = 'junior'
            THEN ROUND(comissao_bruta_total * {jr} * 0.01, 2)
        WHEN {metric} >= {target} AND hierarchy_level = 'pleno'
            THEN ROUND(comissao_bruta_total * {pl} * 0.01, 2)
        ELSE 0 END"""


def _status_case(metric: str, target: str) -> str:
    return f"CASE WHEN {metric} >= {target} THEN 'Batida' ELSE 'Não Batida' END"


def fechamento(
    positivador: DataFrame,
    coe: DataFrame,
    operacoes: DataFrame,
    clients: DataFrame,
    employees: DataFrame,
    transfers: DataFrame,
    compensation: DataFrame,
    *,
    as_of: dt.date,
    month: dt.date | None = None,
    scope: str = "1. Gamma Capital",
    employee_name: str | None = None,
    farmer_id: int | None = None,
) -> DataFrame:
    month = month or as_of.replace(day=1)
    mes = month.replace(day=1)
    cur = F.lit(mes)

    # Reference semantics: ONE value feeds all three scope slots
    # (extract.py:264-268 passes params=[employee_name]*3) — a name that
    # isn't one of the two literals targets exactly that farmer. Passing
    # employee_name alone therefore scopes to that employee; the separate
    # ``scope`` parameter only matters when employee_name is None.
    if employee_name is not None:
        scope = employee_name

    cli_key = clients.select(
        "client_id", F.col("farmer_id").cast("int").alias("farmer_key")
    )
    emp_ids = employees.select("employee_id")

    # -- latest snapshot of the target month ---------------------------
    snap = positivador.filter(month_floor(F.col("record_date")) == cur)
    last_rows = latest_snapshot_rows(snap)
    data_positivador = snap.agg(F.max("record_date").alias("data_positivador"))

    # one keyed snapshot slice shared by pos_values AND totals (the
    # reference scans positivador separately per CTE; Catalyst does not
    # dedupe identical subplans, so reuse explicitly)
    last_with_key = last_rows.join(F.broadcast(cli_key), "client_id")

    # -- calculo_receita (extract.py:38-105) ---------------------------
    pos_values = (
        last_with_key
        .groupBy(F.col("farmer_key").alias("farmer_id"))
        .agg(
            F.expr(f"SUM({POS_REVENUE_EXPR}) AS receita_pos"),
            F.expr(f"SUM({POS_COMMISSION_EXPR}) AS comissao_pos"),
        )
    )
    coe_values = (
        coe.filter((F.col("status") == "Liquidada") & (month_floor(F.col("date")) == cur))
        .join(F.broadcast(cli_key), "client_id")
        .join(F.broadcast(emp_ids), F.col("farmer_key") == F.col("employee_id"))
        .groupBy(F.col("employee_id").alias("farmer_id"))
        .agg(
            F.expr(f"SUM({COE_REVENUE_EXPR}) AS receita_coe"),
            F.expr(f"SUM(({COE_REVENUE_EXPR}) * {RATE_COE_STRUCT}) AS comissao_coe"),
        )
    )
    op_values = (
        operacoes.filter(
            (F.col("status_operacao") != "Cancelado")
            & (month_floor(F.col("data")) == cur)
        )
        .join(F.broadcast(cli_key), "client_id")
        .join(F.broadcast(emp_ids), F.col("farmer_key") == F.col("employee_id"))
        .groupBy(F.col("employee_id").alias("farmer_id"))
        .agg(
            F.expr("SUM(comissao) AS receita_op"),
            F.expr(f"SUM(comissao * {RATE_COE_STRUCT}) AS comissao_op"),
        )
    )
    # per-farmer aggregates are ≤ #employees rows — broadcast explicitly
    # rather than waiting for AQE's runtime conversion
    calculo_receita = (
        pos_values.join(F.broadcast(coe_values), "farmer_id", "left")
        .join(F.broadcast(op_values), "farmer_id", "left")
        .select(
            "farmer_id",
            F.expr(
                "COALESCE(receita_pos, 0) + COALESCE(receita_coe, 0)"
                " + COALESCE(receita_op, 0)"
            ).alias("receita_total"),
            F.expr(
                "COALESCE(comissao_pos, 0) + COALESCE(comissao_coe, 0)"
                " + COALESCE(comissao_op, 0)"
            ).alias("comissao_bruta_total"),
        )
    )

    # -- total_captacao / total_churn at the month's last snapshot date
    #    (extract.py:106-131): with snap pre-filtered to one month, "rows
    #    at the scalar MAX(record_date)" ≡ the latest-snapshot rows above
    totals = last_with_key.groupBy(F.col("farmer_key").alias("farmer_id")).agg(
        F.sum("net_capture").alias("captacao_total"),
        F.sum("churn").alias("churn_total"),
    )

    # -- responsibility periods aggregated per farmer ------------------
    periods = client_farmer_periods(clients, transfers)
    periodo = periods.groupBy("farmer_id").agg(
        F.min("start_date").alias("periodo_inicio"),
        F.coalesce(F.max("end_date"), F.lit(as_of)).alias("periodo_fim"),
    )

    # -- employee scope (P4/P6 predicates, extract.py:261-268) ---------
    # ONE scope value feeds all three disjuncts, exactly like the
    # reference's params=[employee_name]*3 — the name branch stays live
    # even for the '2. Farmers' literal (an employee literally named
    # '2. Farmers' would match, as in the reference)
    emp = employees.filter(
        F.col("hierarchy_level").isin("junior", "pleno")
        & (F.col("status") == "active")
        & (
            ((F.lit(scope) == "2. Farmers") & (F.col("group_id") == 1))
            | (F.lit(scope) == "1. Gamma Capital")
            | (F.col("name") == F.lit(scope).cast("string"))
        )
    )
    if farmer_id is not None:
        emp = emp.filter(F.col("employee_id") == F.lit(farmer_id))

    comp = compensation.filter(F.col("target_date") == cur)

    joined = bcast_attach(
        emp.select(
            F.col("employee_id").alias("farmer_id"),
            F.col("name").alias("farmer_name"),
            "hierarchy_level",
        )
        .join(F.broadcast(comp.withColumnRenamed("employee_id", "farmer_id")), "farmer_id", "left")
        .join(F.broadcast(totals), "farmer_id", "left")
        .join(F.broadcast(calculo_receita), "farmer_id", "left")
        .join(F.broadcast(periodo), "farmer_id", "left"),
        data_positivador,
        "farmer_id",
        "data_positivador",
    )

    bonus_churn = _bonus_case("churn_total", "target_churn", "junior_churn_bonus", "pleno_churn_bonus")
    bonus_capt = _bonus_case("captacao_total", "target_net_capture", "junior_referral_bonus", "pleno_referral_bonus")
    bonus_rec = _bonus_case("receita_total", "target_revenue", "junior_revenue_bonus", "pleno_revenue_bonus")

    out = joined.select(
        "farmer_id",
        "farmer_name",
        "hierarchy_level",
        "data_positivador",
        "periodo_inicio",
        F.coalesce("periodo_fim", F.lit(as_of)).alias("periodo_fim"),
        F.col("churn_total"),
        F.col("target_churn").alias("meta_churn"),
        F.expr(_status_case("churn_total", "target_churn")).alias("status_churn"),
        F.expr(
            "CASE WHEN hierarchy_level = 'junior' THEN junior_churn_bonus"
            " ELSE pleno_churn_bonus END"
        ).alias("porcentagem_churn"),
        F.expr(bonus_churn).alias("bonus_churn"),
        F.col("captacao_total"),
        F.col("target_net_capture").alias("meta_captacao"),
        F.expr(_status_case("captacao_total", "target_net_capture")).alias("status_captacao"),
        F.expr(
            "CASE WHEN hierarchy_level = 'junior' THEN junior_referral_bonus"
            " ELSE pleno_referral_bonus END"
        ).alias("porcentagem_captacao"),
        F.expr(bonus_capt).alias("bonus_captacao"),
        F.col("receita_total"),
        F.col("target_revenue").alias("meta_receita"),
        F.expr(_status_case("receita_total", "target_revenue")).alias("status_receita"),
        F.expr(
            "CASE WHEN hierarchy_level = 'junior' THEN junior_revenue_bonus"
            " ELSE pleno_revenue_bonus END"
        ).alias("porcentagem_receita"),
        F.expr(bonus_rec).alias("bonus_receita"),
        F.col("comissao_bruta_total"),
        (F.expr(bonus_churn) + F.expr(bonus_capt) + F.expr(bonus_rec)).alias("bonus_total"),
    )

    # transform (m_presente/transform.py:33-48): month columns, current-
    # month flag, fillna(0).round(2) on every numeric metric
    out = out.select(
        "*",
        F.lit(mes).alias("mes"),
        month_fmt(F.lit(mes)).alias("mes_formatado"),
        F.lit(mes == as_of.replace(day=1)).alias("is_current_month"),
    )
    money = [
        F.expr(f"CAST(ROUND(COALESCE({c}, 0), 2) AS DECIMAL(18,2))").alias(c)
        for c in MONEY_COLS
    ]
    keep = [c for c in out.columns if c not in MONEY_COLS]
    return out.select(*keep, *money)


def periodo_array(fechamento_df: DataFrame) -> DataFrame:
    """The reference's DATE[] periodo_responsabilidade form (F13,
    extract.py:169-172) as an ArrayType(DateType) column."""
    return fechamento_df.withColumn(
        "periodo_responsabilidade", F.array("periodo_inicio", "periodo_fim")
    )
