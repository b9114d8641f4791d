"""Fixed as-of clocks.

The reference couples every query to wall-clock NOW()
(e.g. kpi_receita_farmer_m_passado/extract.py:54) — untestable. Every plan
in this engine takes an explicit ``as_of`` date instead (SURVEY.md §7);
passing today's date reproduces reference behavior exactly. These pinned
values sit inside the deterministic test-data domains:

  * TPC-H-ish orders/lineitem span 1995-01 .. 2001-11
  * events (snapshot stand-in) span 2024-01 only
"""

import datetime as dt

AS_OF_TPCH = dt.date(2001, 6, 15)     # "current month" = 2001-06
AS_OF_EVENTS = dt.date(2024, 1, 30)   # "current month" = 2024-01

AS_OF_TPCH_SQL = "DATE '2001-06-15'"
AS_OF_EVENTS_SQL = "DATE '2024-01-30'"
