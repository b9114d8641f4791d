"""Tests for bucketed joins, diagnostics, and the point-lookup API."""

import datetime as dt

from etl_gamma_spark.functions.diagnostics import active_jobs
from etl_gamma_spark.operators.responsibility import (
    client_farmer_periods,
    get_responsible_farmer,
)
from etl_gamma_spark.registry import _ensure_model
from etl_gamma_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    _ensure_model(spark, SF_SMOKE)
    spark.sql("DROP TABLE IF EXISTS b_rev")
    spark.sql("DROP TABLE IF EXISTS b_pos")
    rev = spark.table("revenue_records_historical")
    pos = spark.table("positivador_historical")
    write_bucketed(rev.limit(2000), "b_rev", "client_id", 8)
    write_bucketed(pos.limit(2000), "b_pos", "client_id", 8)
    # tiny test tables would be broadcast (which also avoids the shuffle);
    # disable auto-broadcast to show bucketing itself removes the exchange,
    # as it would for a fact⋈fact join at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_rev", "b_pos", "client_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_rev")
        spark.sql("DROP TABLE IF EXISTS b_pos")


def test_active_jobs_snapshot(spark):
    df = active_jobs(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0].default_parallelism > 0


def test_point_lookup_matches_join_semantics(spark):
    _ensure_model(spark, SF_CORRECT)
    periods = client_farmer_periods(
        spark.table("clients"),
        spark.table("client_transfers"),
        spark.table("employees"),
    ).cache()
    # client 0 has transfers (custkey % 5 == 0): before first transfer the
    # original farmer is NOT responsible via transfer periods; probe both
    # sides of a boundary found from the data itself
    row = periods.filter("client_id = 5").orderBy("start_date").first()
    fid, fname = get_responsible_farmer(periods, 5, row.start_date)
    assert fid == row.farmer_id
    assert fname == row.farmer_name
    # unknown client
    assert get_responsible_farmer(periods, 10**9, dt.date(2000, 1, 1)) == (None, None)


def test_approx_aggregates_accuracy(spark):
    from etl_gamma_spark.registry import approx_aggregates

    row = approx_aggregates(spark, SF_CORRECT).first()
    exact = (
        spark.table("revenue_records_historical")
        .selectExpr(
            "COUNT(DISTINCT client_id) AS d",
            "percentile(CAST(gross_revenue AS DOUBLE), 0.5) AS p50",
        )
        .first()
    )
    assert abs(row.approx_clients - exact.d) / exact.d < 0.05
    assert abs(row.revenue_p50_p95[0] - exact.p50) / exact.p50 < 0.05


def test_sessionize_subsecond_gap_boundary(spark):
    # gap of 1800.4s straddles the 30-min threshold only if fractional
    # seconds are honored (regression: cast-to-long truncated them)
    from etl_gamma_spark.operators.temporal import sessionize

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0, 100000)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(seconds=1800, microseconds=400000)),  # new session
        (1, 3, t0 + dt.timedelta(seconds=3599, microseconds=500000)),  # same as 2
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert got == {1: 1, 2: 2, 3: 2}


def test_safe_cast_coerces_instead_of_raising(spark):
    from etl_gamma_spark.functions.calendar import safe_cast

    df = spark.createDataFrame([("12",), ("abc",), (None,)], "v string")
    got = [r.n for r in df.select(safe_cast("v", "int").alias("n")).collect()]
    assert got == [12, None, None]
