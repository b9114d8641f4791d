"""Unit tests for the responsibility-period builder and interval joins
against hand-computed transfer logs (SURVEY.md §5.2): open-ended periods,
multi-transfer chains, never-transferred clients, same-day transfer
tie-break, and half-open boundary semantics (start <= d < end).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_gamma_spark.operators.responsibility import (
    add_responsible_farmer,
    client_farmer_periods,
    filter_by_responsibility,
)

D = dt.date


@pytest.fixture(scope="module")
def fixtures(spark):
    clients = spark.createDataFrame(
        [
            (1, "never-moved", "10", D(2020, 1, 1)),
            (2, "moved-once", "10", D(2020, 2, 1)),
            (3, "moved-thrice", "11", D(2020, 3, 1)),
            (4, "same-day", "12", D(2020, 4, 1)),
        ],
        "client_id long, name string, farmer_id string, creation_date date",
    )
    transfers = spark.createDataFrame(
        [
            # client 2: one transfer
            (2, "10", "20", D(2021, 1, 1), "FARMER"),
            # client 3: chain of three
            (3, "11", "21", D(2021, 1, 1), "FARMER"),
            (3, "21", "22", D(2021, 6, 1), "FARMER"),
            (3, "22", "23", D(2022, 1, 1), "FARMER"),
            # client 4: two transfers on the same date (tie-break edge)
            (4, "12", "24", D(2021, 3, 1), "FARMER"),
            (4, "24", "13", D(2021, 3, 1), "FARMER"),
            # non-FARMER noise must be ignored
            (1, None, None, D(2021, 5, 1), "SEGMENT"),
        ],
        "client_id long, old_farmer_id string, new_farmer_id string, "
        "transfer_date date, transfer_type string",
    )
    employees = spark.createDataFrame(
        [(i, f"EMP_{i}") for i in (10, 11, 12, 13, 20, 21, 22, 23, 24)],
        "employee_id int, name string",
    )
    return clients, transfers, employees


def _periods(fixtures, **kw):
    clients, transfers, employees = fixtures
    df = client_farmer_periods(clients, transfers, employees, **kw)
    return {
        (r.client_id, r.farmer_id, r.start_date, r.end_date) for r in df.collect()
    }


def test_never_transferred_open_ended(fixtures):
    p = _periods(fixtures)
    assert (1, 10, D(2020, 1, 1), None) in p
    # SEGMENT transfer must not close client 1's period
    assert not any(c == 1 and e is not None for c, _, _, e in p)


def test_single_transfer_periods(fixtures):
    p = _periods(fixtures)
    assert (2, 10, D(2020, 2, 1), D(2021, 1, 1)) in p  # old farmer closed
    assert (2, 20, D(2021, 1, 1), None) in p  # new farmer open


def test_transfer_chain_tiles(fixtures):
    p = {t for t in _periods(fixtures) if t[0] == 3}
    assert (3, 11, D(2020, 3, 1), D(2021, 1, 1)) in p
    assert (3, 21, D(2021, 1, 1), D(2021, 6, 1)) in p
    assert (3, 22, D(2021, 6, 1), D(2022, 1, 1)) in p
    assert (3, 23, D(2022, 1, 1), None) in p


def test_same_day_transfers_deterministic(fixtures):
    # total order (transfer_date, new_farmer_id, old_farmer_id):
    # '13' < '24' as strings, so the 24→13 transfer sorts first
    p = {t for t in _periods(fixtures) if t[0] == 4}
    new_open = {t for t in p if t[3] is None}
    assert new_open == {(4, 24, D(2021, 3, 1), None)}
    # zero-length period [d, d) exists and matches nothing
    assert (4, 13, D(2021, 3, 1), D(2021, 3, 1)) in p


def test_date_range_pruning(fixtures):
    p = _periods(fixtures, start_date=D(2022, 6, 1), end_date=D(2022, 12, 31))
    # periods ending before the range are pruned
    assert not any(e is not None and e < D(2022, 6, 1) for _, _, _, e in p)
    # open-ended periods always survive the start filter
    assert any(e is None for _, _, _, e in p)


def test_half_open_membership(spark, fixtures):
    clients, transfers, employees = fixtures
    periods = client_farmer_periods(clients, transfers, employees)
    facts = spark.createDataFrame(
        [
            (2, D(2021, 1, 1)),   # exactly at transfer: belongs to NEW farmer
            (2, D(2020, 12, 31)), # day before: OLD farmer
            (99, D(2021, 1, 1)),  # unknown client: no period
        ],
        "client_id long, d date",
    )
    kept_new = filter_by_responsibility(facts, periods, "d", farmer_id=20).collect()
    assert {(r.client_id, r.d) for r in kept_new} == {(2, D(2021, 1, 1))}
    kept_old = filter_by_responsibility(facts, periods, "d", farmer_id=10).collect()
    assert {(r.client_id, r.d) for r in kept_old} == {(2, D(2020, 12, 31))}

    enriched = add_responsible_farmer(facts, periods, "d").collect()
    by_key = {(r.client_id, r.d): r.responsible_farmer_id for r in enriched}
    assert by_key[(2, D(2021, 1, 1))] == 20
    assert by_key[(2, D(2020, 12, 31))] == 10
    assert by_key[(99, D(2021, 1, 1))] is None


def test_bonus_boundary_exactly_at_target(spark):
    # metric == target → 'Batida' (comparisons are >=, reference
    # kpi_fechamento_m_presente/extract.py:177)
    from etl_gamma_spark.plans.fechamento import _status_case

    row = spark.sql(
        f"SELECT {_status_case('100.0', '100.0')} AS s, "
        f"{_status_case('99.99', '100.0')} AS s2"
    ).first()
    assert row.s == "Batida"
    assert row.s2 == "Não Batida"
