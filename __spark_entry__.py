"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
each implemented operator (SURVEY.md §2) to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` provides the DuckDB-equivalent SQL per query.
Every query is parameterized by a *fixed* as_of date (etl_gamma_spark/
asof.py) instead of wall-clock, so engine and oracle are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_gamma_spark import asof
from etl_gamma_spark.model import register_model_views, with_model
from etl_gamma_spark.plans.receita_farmer_passado import receita_farmer_m_passado


def _model(spark: SparkSession, sf_dir: str) -> None:
    register_model_views(spark, sf_dir)


# --- query callables -------------------------------------------------------


def q_receita_farmer_m_passado(spark: SparkSession, sf_dir: str) -> DataFrame:
    _model(spark, sf_dir)
    return receita_farmer_m_passado(
        spark.table("revenue_records_historical"),
        spark.table("clients"),
        spark.table("employees"),
        as_of=asof.AS_OF_TPCH,
        months_back=11,
    )


def q_receita_farmer_m_passado_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    # optional-predicate variant (SURVEY §2.2 P5): single farmer scope
    _model(spark, sf_dir)
    return receita_farmer_m_passado(
        spark.table("revenue_records_historical"),
        spark.table("clients"),
        spark.table("employees"),
        as_of=asof.AS_OF_TPCH,
        months_back=11,
        farmer_id=7,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_receita_farmer_m_passado(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "receita_farmer_m_passado": q_receita_farmer_m_passado,
        "receita_farmer_m_passado_one": q_receita_farmer_m_passado_one,
    }


# --- oracles ---------------------------------------------------------------

_RECEITA_FARMER_BODY = """
SELECT CAST(date_trunc('month', r.record_date) AS DATE) AS mes,
       strftime(CAST(date_trunc('month', r.record_date) AS DATE), '%m/%Y') AS mes_formatado,
       CAST(c.farmer_id AS INTEGER) AS farmer_id,
       e.name AS farmer_name,
       CAST(SUM(r.gross_revenue) AS DECIMAL(18,2)) AS receita_bruta,
       CAST(SUM(r.net_revenue) AS DECIMAL(18,2)) AS receita_liquida,
       CAST(SUM(r.gross_commission) AS DECIMAL(18,2)) AS comissao_bruta,
       CAST(ROUND(SUM(r.gross_commission * (1 - 0.195)), 2) AS DECIMAL(18,2)) AS comissao_liquida,
       'historical' AS fonte
FROM revenue_records_historical r
JOIN clients c ON r.client_id = c.client_id
JOIN employees e ON CAST(c.farmer_id AS INTEGER) = e.employee_id
WHERE r.record_date >= CAST(date_trunc('month', {AS_OF}) - INTERVAL 11 MONTH AS DATE)
  AND date_trunc('month', r.record_date) < date_trunc('month', {AS_OF})
  {EXTRA}
GROUP BY 1, 2, 3, 4
"""


def oracle_sql() -> dict[str, str]:
    base = ("clients", "employees", "revenue_records_historical")
    return {
        "receita_farmer_m_passado": with_model(
            _RECEITA_FARMER_BODY.format(AS_OF=asof.AS_OF_TPCH_SQL, EXTRA=""),
            *base,
        ),
        "receita_farmer_m_passado_one": with_model(
            _RECEITA_FARMER_BODY.format(
                AS_OF=asof.AS_OF_TPCH_SQL,
                EXTRA="AND CAST(c.farmer_id AS INTEGER) = 7",
            ),
            *base,
        ),
    }
