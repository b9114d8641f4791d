"""transformWithStateInPandas operator (streaming/tws.py) — gated like
sources/jdbc.py: the TWS state protocol needs google.protobuf, absent in
this sandbox. When available the final per-user state must equal the
batch GROUP BY (the same determinism contract streaming_dedup_events
meets); when absent the gate must raise a clear capability error, never
a mid-query streaming-runner crash."""

import pytest

from etl_gamma_spark.io import load_table
from etl_gamma_spark.streaming.tws import streaming_user_stats, tws_available
from tests.conftest import SF_SMOKE


def test_gate_or_run(spark):
    if not tws_available():
        with pytest.raises(RuntimeError, match="google.protobuf"):
            streaming_user_stats(spark, SF_SMOKE)
        return

    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in streaming_user_stats(spark, SF_SMOKE).collect()
    }
    exp = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DECIMAL(18,6))"
            ).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert got == exp
