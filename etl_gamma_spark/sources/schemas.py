"""Explicit StructTypes for the gammadata-shaped model (FIXTURES.md §A)
and the analysis output tables.

The reference manages schemas with DDL-issuing functions + ad-hoc
ALTER TABLE evolution (utils/db_schema_main.py:13-78, utils/
db_schema_farmer/db_schema_receita.py:35-246, db_schema_comissao.py:14-194).
Here inputs get explicit StructTypes (no inference in production paths)
and outputs evolve via Parquet mergeSchema (sources/catalog.py).

Note the reference's `analysis.receita_cliente` DDL is missing entirely
(its create function is imported but defined nowhere — SURVEY.md §1.2);
RECEITA_CLIENTE below is reconstructed from the INSERT column list at
kpi_receita_cliente/load.py:107-114.
"""

from __future__ import annotations

from pyspark.sql import types as T

D152 = T.DecimalType(15, 2)
D182 = T.DecimalType(18, 2)


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


# --- gammadata-shaped inputs ----------------------------------------------

CLIENTS = _s(
    ("client_id", T.LongType(), False),
    ("name", T.StringType(), True),
    # deliberately TEXT holding an int — every reference join CASTs it
    ("farmer_id", T.StringType(), True),
    ("creation_date", T.DateType(), True),
)

EMPLOYEES = _s(
    ("employee_id", T.IntegerType(), False),
    ("name", T.StringType(), True),
    ("hierarchy_level", T.StringType(), True),
    ("status", T.StringType(), True),
    ("group_id", T.IntegerType(), True),
)

CLIENT_TRANSFERS = _s(
    ("client_id", T.LongType(), False),
    ("old_farmer_id", T.StringType(), True),
    ("new_farmer_id", T.StringType(), True),
    ("transfer_date", T.DateType(), True),
    ("transfer_type", T.StringType(), True),
)

REVENUE_RECORDS_HISTORICAL = _s(
    ("client_id", T.LongType(), False),
    ("record_date", T.DateType(), True),
    ("gross_revenue", D182, True),
    ("net_revenue", D182, True),
    ("gross_commission", D182, True),
    ("category", T.StringType(), True),
    ("product", T.StringType(), True),
)

POSITIVADOR_HISTORICAL = _s(
    ("client_id", T.LongType(), False),
    ("record_date", T.DateType(), True),
    ("bovespa_revenue", D182, True),
    ("futures_revenue", D182, True),
    ("bank_fixed_income_revenue", D182, True),
    ("private_fixed_income_revenue", D182, True),
    ("public_fixed_income_revenue", D182, True),
    ("rent_revenue", D182, True),
    ("churn", D182, True),
    ("net_capture", D182, True),
    ("patrimony", D182, True),
)

COE = _s(
    ("client_id", T.LongType(), False),
    ("date", T.DateType(), True),
    ("financial_value", D182, True),
    ("commission_percentage", T.DecimalType(5, 2), True),
    ("status", T.StringType(), True),
)

OPERACOES_ESTRUTURADAS = _s(
    ("client_id", T.LongType(), False),
    ("data", T.DateType(), True),
    ("comissao", D182, True),
    ("status_operacao", T.StringType(), True),
)

COMPENSATION = _s(
    ("employee_id", T.IntegerType(), False),
    ("target_date", T.DateType(), True),
    ("target_churn", D152, True),
    ("target_net_capture", D152, True),
    ("target_revenue", D152, True),
    ("junior_churn_bonus", T.DecimalType(5, 2), True),
    ("pleno_churn_bonus", T.DecimalType(5, 2), True),
    ("junior_referral_bonus", T.DecimalType(5, 2), True),
    ("pleno_referral_bonus", T.DecimalType(5, 2), True),
    ("junior_revenue_bonus", T.DecimalType(5, 2), True),
    ("pleno_revenue_bonus", T.DecimalType(5, 2), True),
)

# --- analysis outputs (grains per FIXTURES.md §A) --------------------------

RECEITA_FARMER = _s(  # UNIQUE(mes, fonte, farmer_id)
    ("mes", T.DateType(), False),
    ("mes_formatado", T.StringType(), True),
    ("farmer_id", T.IntegerType(), True),
    ("farmer_name", T.StringType(), True),
    ("receita_bruta", D182, True),
    ("receita_liquida", D182, True),
    ("comissao_bruta", D182, True),
    ("comissao_liquida", D182, True),
    ("fonte", T.StringType(), False),
)

# reconstructed — see module docstring
RECEITA_CLIENTE = _s(
    ("tipo_operacao", T.StringType(), False),
    ("data_operacao", T.DateType(), False),
    ("client_id", T.LongType(), False),
    ("nome_cliente", T.StringType(), True),
    ("farmer_id", T.IntegerType(), True),
    ("nome_farmer", T.StringType(), True),
    ("valor_financeiro", D182, True),
    ("percentual_comissao", D182, True),
    ("receita_bruta", D182, True),
    ("comissao_bruta", D182, True),
    ("comissao_liquida", D182, True),
    ("status", T.StringType(), True),
    ("churn", D182, True),
    ("patrimony", D182, True),
    ("net_capture", D182, True),
    ("mes", T.DateType(), True),
    ("mes_formatado", T.StringType(), True),
)
