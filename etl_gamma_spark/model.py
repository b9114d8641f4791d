"""Semantic model: gammadata-shaped tables derived from the driver fixtures.

The reference engine reads a Postgres schema ``gammadata`` (FIXTURES.md §A:
clients, employees, client_transfers, revenue_records_historical,
positivador_historical, coe, operacoes_estruturadas, compensation). The
driver's test fixtures are TPC-H-ish parquet tables (TESTDATA.md). This
module maps the latter onto the former **once**, as SQL text that parses
identically in Spark SQL and DuckDB:

  * Spark side: `register_model_views(spark)` creates temp views;
  * oracle side: `with_model(body, *names)` inlines the same text as CTEs.

So the derivations literally cannot drift between the engine under test and
the DuckDB oracle — only the *plan logic* differs, which is exactly what the
differential tests must exercise.

Determinism rules (both engines must agree bit-for-bit):
  * money → DECIMAL from the adapter boundary on; sums of decimals are
    exact and order-independent (double sums are not);
  * every synthesized attribute is arithmetic on stable keys (no RNG, no
    wall clock);
  * timestamps are CAST to microsecond TIMESTAMP (the raw events column is
    nanos, which Spark cannot represent);
  * window orderings used downstream must be total orders (see
    client_transfers: includes deliberate same-day transfers, so plans
    must tie-break on a second key).

Mapping (FIXTURES.md §B): customer→clients, nation→employees,
lineitem⋈orders⋈part→revenue_records_historical, events→positivador
snapshots, orders slices→coe / operacoes_estruturadas; client_transfers and
compensation are synthesized from customer / nation keys.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .io import register_base_views

# --- shared SQL (valid in BOTH Spark SQL and DuckDB) ----------------------

MODEL_SQL: dict[str, str] = {
    # gammadata.clients — client dimension. farmer_id is deliberately TEXT
    # holding an int: the reference always CASTs it in join keys
    # (reference kpi_receita_farmer_m_passado/extract.py:44,52).
    "clients": """
SELECT c_custkey AS client_id,
       c_name AS name,
       CAST(c_nationkey AS STRING) AS farmer_id,
       DATE '1994-01-01' + CAST(c_custkey % 365 AS INT) AS creation_date
FROM customer
""",
    # gammadata.employees — farmer dimension
    # (reference kpi_fechamento_m_presente/extract.py:167,181,262-265).
    "employees": """
SELECT n_nationkey AS employee_id,
       n_name AS name,
       CASE WHEN n_nationkey % 3 = 0 THEN 'junior'
            WHEN n_nationkey % 3 = 1 THEN 'pleno'
            ELSE 'senior' END AS hierarchy_level,
       CASE WHEN n_nationkey % 7 = 3 THEN 'inactive' ELSE 'active' END AS status,
       CASE WHEN n_regionkey <= 2 THEN 1 ELSE 2 END AS group_id
FROM nation
""",
    # gammadata.revenue_records_historical — closed-month revenue facts
    # (reference kpi_receita_farmer_m_passado/extract.py:41-64). category/
    # product carry NULLs to exercise the 'OUTROS' COALESCE bucketing
    # (kpi_receita_produto_f_m_passado/extract.py:85-86).
    "revenue_records_historical": """
SELECT o.o_custkey AS client_id,
       CAST(l.l_shipdate AS DATE) AS record_date,
       CAST(l.l_extendedprice AS DECIMAL(18,2)) AS gross_revenue,
       CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(12,6))), 2) AS DECIMAL(18,2)) AS net_revenue,
       CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(l.l_discount AS DECIMAL(12,6)), 2) AS DECIMAL(18,2)) AS gross_commission,
       CASE WHEN p.p_size % 13 = 0 THEN NULL ELSE p.p_brand END AS category,
       CASE WHEN p.p_size % 17 = 0 THEN NULL ELSE p.p_type END AS product
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
""",
    # gammadata.positivador_historical — daily per-client snapshot rows;
    # several snapshot dates per month, only the month's latest counts
    # (reference kpi_receita_farmer_m_presente/extract.py:30-36).
    "positivador_historical": """
SELECT user_id AS client_id,
       CAST(ts AS DATE) AS record_date,
       CASE WHEN event_type = 'click' THEN CAST(value * 10 AS DECIMAL(18,2)) END AS bovespa_revenue,
       CASE WHEN event_type = 'view' THEN CAST(value * 8 AS DECIMAL(18,2)) END AS futures_revenue,
       CASE WHEN event_type = 'purchase' THEN CAST(value * 20 AS DECIMAL(18,2)) END AS bank_fixed_income_revenue,
       CASE WHEN event_type = 'signup' THEN CAST(value * 5 AS DECIMAL(18,2)) END AS private_fixed_income_revenue,
       CASE WHEN event_type = 'error' THEN CAST(value * 2 AS DECIMAL(18,2)) END AS public_fixed_income_revenue,
       CASE WHEN event_type = 'click' THEN CAST(value * 3 AS DECIMAL(18,2)) END AS rent_revenue,
       CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END AS churn,
       CASE WHEN event_type = 'purchase' THEN CAST(value * 100 AS DECIMAL(18,2)) END AS net_capture,
       CAST(value * 1000 AS DECIMAL(18,2)) AS patrimony
FROM events
""",
    # gammadata.coe — COE operations; only status='Liquidada' counts
    # (reference kpi_receita_cliente/extract.py:203-216).
    "coe": """
SELECT o_custkey AS client_id,
       CAST(o_orderdate AS DATE) AS date,
       CAST(o_totalprice AS DECIMAL(18,2)) AS financial_value,
       CAST(1 + o_orderkey % 5 AS DECIMAL(5,2)) AS commission_percentage,
       CASE WHEN o_orderstatus = 'O' THEN 'Liquidada'
            WHEN o_orderstatus = 'F' THEN 'Pendente'
            ELSE 'Cancelada' END AS status
FROM orders
WHERE o_orderkey % 3 = 0
""",
    # gammadata.operacoes_estruturadas — structured ops; status != 'Cancelado'
    # kept (reference kpi_receita_cliente/extract.py:275-286).
    "operacoes_estruturadas": """
SELECT o_custkey AS client_id,
       CAST(o_orderdate AS DATE) AS data,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 0.01, 2) AS DECIMAL(18,2)) AS comissao,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 'Cancelado' ELSE 'Ativo' END AS status_operacao
FROM orders
WHERE o_orderkey % 3 = 1
""",
    # gammadata.client_transfers — responsibility transfer log
    # (reference utils/client_responsibility.py:34-104). Includes clients
    # with 0/1/2/3 transfers, a same-day double transfer (tie-break edge),
    # and non-FARMER rows that must be filtered out.
    "client_transfers": """
SELECT c_custkey AS client_id,
       CAST(c_nationkey AS STRING) AS old_farmer_id,
       CAST((c_nationkey + 7) % 25 AS STRING) AS new_farmer_id,
       DATE '1996-01-01' + CAST(c_custkey % 1400 AS INT) AS transfer_date,
       'FARMER' AS transfer_type
FROM customer WHERE c_custkey % 5 = 0
UNION ALL
SELECT c_custkey,
       CAST((c_nationkey + 7) % 25 AS STRING),
       CAST((c_nationkey + 14) % 25 AS STRING),
       DATE '1996-01-01' + CAST(c_custkey % 1400 AS INT) + 200,
       'FARMER'
FROM customer WHERE c_custkey % 15 = 0
UNION ALL
SELECT c_custkey,
       CAST((c_nationkey + 14) % 25 AS STRING),
       CAST((c_nationkey + 21) % 25 AS STRING),
       DATE '1996-01-01' + CAST(c_custkey % 1400 AS INT) + 400,
       'FARMER'
FROM customer WHERE c_custkey % 45 = 0
UNION ALL
SELECT c_custkey,
       CAST((c_nationkey + 7) % 25 AS STRING),
       CAST((c_nationkey + 3) % 25 AS STRING),
       DATE '1996-01-01' + CAST(c_custkey % 1400 AS INT),
       'FARMER'
FROM customer WHERE c_custkey % 100 = 0
UNION ALL
SELECT c_custkey,
       CAST(NULL AS STRING),
       CAST(NULL AS STRING),
       DATE '1996-06-01' + CAST(c_custkey % 900 AS INT),
       'SEGMENT'
FROM customer WHERE c_custkey % 7 = 0
""",
    # gammadata.compensation — monthly targets & bonus percentage rates
    # (reference kpi_fechamento_m_presente/extract.py:176-252, FIXTURES.md).
    # Employees with n % 11 = 5 have NO compensation row (LEFT JOIN path).
    "compensation": """
SELECT e.n_nationkey AS employee_id,
       m.target_date,
       CAST(120 + e.n_nationkey * 10 AS DECIMAL(15,2)) AS target_churn,
       CAST(30000 + e.n_nationkey * 2000 AS DECIMAL(15,2)) AS target_net_capture,
       CAST(4000 + e.n_nationkey * 300 AS DECIMAL(15,2)) AS target_revenue,
       CAST(1.50 AS DECIMAL(5,2)) AS junior_churn_bonus,
       CAST(2.50 AS DECIMAL(5,2)) AS pleno_churn_bonus,
       CAST(1.00 AS DECIMAL(5,2)) AS junior_referral_bonus,
       CAST(2.00 AS DECIMAL(5,2)) AS pleno_referral_bonus,
       CAST(3.00 AS DECIMAL(5,2)) AS junior_revenue_bonus,
       CAST(5.00 AS DECIMAL(5,2)) AS pleno_revenue_bonus
FROM nation e
CROSS JOIN (VALUES (DATE '2001-01-01'), (DATE '2001-02-01'), (DATE '2001-03-01'),
                   (DATE '2001-04-01'), (DATE '2001-05-01'), (DATE '2001-06-01'),
                   (DATE '2024-01-01')) AS m(target_date)
WHERE e.n_nationkey % 11 <> 5
""",
}

MODEL_TABLES = tuple(MODEL_SQL)


def register_model_views(spark: SparkSession, sf_dir: str) -> None:
    """Register base fixture views + gammadata-shaped model views.

    The views stay LAZY (no cache): caching the derived facts was
    measured to bring no net bench win here while replacing the parquet
    scans with InMemoryTableScans — which hides predicate pushdown, the
    property tests/test_plan_quality.py pins for the 100 TB posture.
    """
    register_base_views(spark, sf_dir)
    for name, sql in MODEL_SQL.items():
        spark.sql(sql).createOrReplaceTempView(name)


def with_model(body: str, *names: str) -> str:
    """Compose an oracle query: WITH <model ctes> <body> (DuckDB side)."""
    ctes = ",\n".join(f"{n} AS ({MODEL_SQL[n]})" for n in names)
    return f"WITH {ctes}\n{body}"
