"""Commission constants — single source of truth (SURVEY.md §2.8 F9).

The reference scatters these as magic numbers:
  * historical net commission factor 1-0.195
    (kpis/farmer/receita/kpi_receita_farmer_m_passado/extract.py:49)
  * current-month bovespa/futures rate 0.665, fixed-income/rent rate 0.475
    (kpi_receita_farmer_m_presente/extract.py:40-42,53-55,74-89)
  * COE & structured-ops commission factor 0.95, net factor 0.805
    (kpi_receita_cliente/extract.py:205-207,275-277)

Kept as strings so both Spark SQL and DuckDB parse them as exact DECIMAL
literals (money arithmetic stays decimal end-to-end for order-independent,
engine-identical sums).
"""

# historical: net commission = gross_commission * (1 - TAX)
TAX = "0.195"
NET_COMMISSION_FACTOR = "(1 - 0.195)"  # = 0.805

# current-month revenue weighting by product family
RATE_BOVESPA_FUTURES = "0.665"
RATE_FIXED_INCOME_RENT = "0.475"

# COE / structured operations
RATE_COE_STRUCT = "0.95"
RATE_NET = "0.805"
