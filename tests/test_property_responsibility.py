"""Property-based test (hypothesis): the relational responsibility
machinery must agree with a direct Python transcription of the reference's
row-loop semantics (utils/client_responsibility.py:147-159,205-219) on
randomized transfer logs — open-ended periods, chains, same-day edges.

Few examples, many clients per example: each example costs Spark jobs, so
the data per example carries the variety.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_gamma_spark.operators.responsibility import (
    client_farmer_periods,
    filter_by_responsibility,
)

BASE = dt.date(2020, 1, 1)

client_strategy = st.lists(
    st.tuples(
        st.integers(0, 400),            # creation offset days
        st.integers(0, 9),              # original farmer
        st.lists(                        # transfers: (day offset, new farmer)
            st.tuples(st.integers(10, 900), st.integers(0, 9)),
            max_size=4,
        ),
    ),
    min_size=20,
    max_size=40,
)


def _build(rows):
    clients, transfers = [], []
    for cid, (c_off, farmer0, trs) in enumerate(rows):
        creation = BASE + dt.timedelta(days=c_off)
        clients.append((cid, f"c{cid}", str(farmer0), creation))
        prev_farmer = farmer0
        for day, new_farmer in sorted(trs):
            tdate = BASE + dt.timedelta(days=day)
            transfers.append((cid, str(prev_farmer), str(new_farmer), tdate, "FARMER"))
            prev_farmer = new_farmer
    return clients, transfers


def _reference_periods(clients, transfers):
    """Python transcription of the reference SQL (total-order refinement
    applied exactly as the engine documents it)."""
    periods = []
    by_client = {}
    for t in transfers:
        by_client.setdefault(t[0], []).append(t)
    creation = {c[0]: c[3] for c in clients}
    farmer0 = {c[0]: int(c[2]) for c in clients}
    for cid, _, _, cdate in clients:
        if cid not in by_client:
            periods.append((cid, farmer0[cid], cdate, None))
    for cid, trs in by_client.items():
        trs = sorted(trs, key=lambda t: (t[3], t[2] or "", t[1] or ""))
        for i, (c, old, new, tdate, _) in enumerate(trs):
            nxt = trs[i + 1][3] if i + 1 < len(trs) else None
            prev = trs[i - 1][3] if i > 0 else None
            if new is not None:
                periods.append((cid, int(new), tdate, nxt))
            if old is not None:
                periods.append((cid, int(old), prev or creation[cid], tdate))
    return periods


def _reference_member(periods, cid, d, farmer_id):
    for (pc, pf, s, e) in periods:
        if pc == cid and pf == farmer_id and s <= d and (e is None or d < e):
            return True
    return False


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=client_strategy, probe_days=st.lists(st.integers(0, 950), min_size=5, max_size=10))
def test_interval_semi_join_matches_reference_loop(spark, rows, probe_days):
    clients_data, transfers_data = _build(rows)
    clients = spark.createDataFrame(
        clients_data, "client_id long, name string, farmer_id string, creation_date date"
    )
    transfers = spark.createDataFrame(
        transfers_data or [(0, None, None, BASE, "NONE")],
        "client_id long, old_farmer_id string, new_farmer_id string, "
        "transfer_date date, transfer_type string",
    )
    periods_df = client_farmer_periods(clients, transfers)
    ref = _reference_periods(clients_data, transfers_data)

    # period sets must be identical
    got = {
        (r.client_id, r.farmer_id, r.start_date, r.end_date)
        for r in periods_df.collect()
    }
    assert got == set(ref)

    # membership semantics at randomized probe dates for one farmer
    facts = spark.createDataFrame(
        [
            (cid, BASE + dt.timedelta(days=day))
            for cid, *_ in clients_data
            for day in probe_days
        ],
        "client_id long, d date",
    )
    kept = {
        (r.client_id, r.d)
        for r in filter_by_responsibility(facts, periods_df, "d", farmer_id=3).collect()
    }
    expected = {
        (cid, BASE + dt.timedelta(days=day))
        for cid, *_ in clients_data
        for day in probe_days
        if _reference_member(ref, cid, BASE + dt.timedelta(days=day), 3)
    }
    assert kept == expected
