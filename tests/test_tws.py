"""transformWithStateInPandas operator (streaming/tws.py) — gated like
sources/jdbc.py: the TWS state protocol needs google.protobuf, absent in
this sandbox. When available the final per-user state must equal the
batch GROUP BY (the same determinism contract streaming_dedup_events
meets); when absent the gate must raise a clear capability error, never
a mid-query streaming-runner crash."""

from decimal import Decimal

import pandas as pd
import pytest

from etl_gamma_spark.io import load_table
from etl_gamma_spark.streaming.tws import (
    _user_stats_processor,
    streaming_user_stats,
    tws_available,
)
from tests.conftest import SF_SMOKE


class _FakeValueState:
    """Minimal stand-in for a TWS ValueState: exists/get/update — lets the
    processor's arithmetic run without the protobuf state server."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_processor_arithmetic_with_fake_handle():
    # the processor class itself needs no state server — drive it directly
    proc = _user_stats_processor()
    handle = _FakeHandle()
    proc.init(handle)

    t1 = pd.Timestamp("2001-01-01 10:00:00")
    t2 = pd.Timestamp("2001-01-01 11:00:00")
    # 1.0000005 sits exactly on the 6th-decimal half boundary: Spark/DuckDB
    # ROUND is HALF_UP on the shortest decimal repr → 1.000001. Python's
    # round() (banker's, on the binary double) would disagree — this pins
    # the kernel to the engine convention (ADVICE round 4).
    batch1 = pd.DataFrame({"value": [1.0000005, 2.5], "ts": [t1, t2]})
    [out1] = list(proc.handleInputRows((7,), iter([batch1]), None))
    assert out1["user_id"].tolist() == [7]
    assert out1["n_events"].tolist() == [2]
    assert out1["total_value"].tolist() == [Decimal("3.500001")]
    assert out1["last_ts"].tolist() == [t2]

    # cross-batch accumulation: state round-trips the Decimal as its exact
    # string; an earlier-only batch must NOT move last_ts backwards
    t0 = pd.Timestamp("2001-01-01 09:00:00")
    batch2 = pd.DataFrame({"value": [0.25], "ts": [t0]})
    [out2] = list(proc.handleInputRows((7,), iter([batch2]), None))
    assert out2["n_events"].tolist() == [3]
    assert out2["total_value"].tolist() == [Decimal("3.750001")]
    assert out2["last_ts"].tolist() == [t2]

    n, total_str, last = handle.states["stats"].get()
    assert (n, total_str, last) == (3, "3.750001", t2)


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
