"""Pinned-environment canary (VERDICT r3 item 6).

The sandbox's Spark version and the driver fixtures both drift between
rounds (TIMESTAMP(NANOS) fixtures under Spark 3.x, untagged timestamp[us]
read as TIMESTAMP_NTZ under Spark 4.x).  This test runs the events scan in
a PLAIN external SparkSession — a subprocess with a bare
``SparkSession.builder`` exactly like the correctness driver — and asserts
the normalized ``ts`` dtype is ``timestamp`` (not ntz, not bigint) for both
the batch reader and every streaming entry point.  The next silent
environment drift becomes this named red test instead of a dead bench.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CANARY = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

# PLAIN session: no etl_gamma_spark confs at build time — load_table must
# normalize on any session it is handed (the driver builds its own).
spark = (
    SparkSession.builder.master("local[2]")
    .appName("ntz-canary")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from etl_gamma_spark.io import load_table, read_events_stream

sf = "/root/testdata/sf0.001"
batch = load_table(spark, sf, "events")
bt = dict(batch.dtypes)["ts"]
assert bt == "timestamp", f"batch ts dtype: {bt}"
assert batch.count() > 0

stream = read_events_stream(spark, sf)
st = dict(stream.dtypes)["ts"]
assert st == "timestamp", f"stream ts dtype: {st}"

# the two call sites the r3 NTZ drift actually broke
from pyspark.sql import functions as F
from etl_gamma_spark.operators.temporal import sessionize

sessionize(batch).select("session_id").limit(1).collect()
wm = stream.withWatermark("ts", "10 minutes")
assert dict(wm.dtypes)["ts"] == "timestamp"
spark.stop()
print("CANARY-OK")
"""


def test_events_ts_is_timestamp_in_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _CANARY % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "CANARY-OK" in proc.stdout


def test_portable_ln_bit_parity_and_native_ln_divergence(spark):
    """BM25's idf (operators/retrieval.py) deliberately avoids native
    ln(): on this host JVM Math.log and DuckDB's glibc log disagree in
    the last ulp (first subtest documents a concrete divergent input, so
    if an environment change ever makes them agree we can reconsider).
    The portable expansion — 20 nested sqrt + 2-term atanh series, only
    IEEE correctly-rounded ops — must be BIT-IDENTICAL across engines
    over the whole idf input domain; the second subtest sweeps every df
    for corpus sizes through sf0.1 scale and beyond."""
    import math

    import duckdb

    from etl_gamma_spark.operators.retrieval import (
        IDF_S_SQL,
        IDF_T_SQL,
        IDF_X_SQL,
    )

    # 1) documented native divergence (measured round 6): not an assert
    #    on inequality — just record the canonical probe value pair in
    #    the test output if it ever changes
    probe = "ln(((500.0 - 1.0) + 0.5) / (1.0 + 0.5) + 1.0)"
    s_val = spark.sql(f"SELECT {probe} AS v").collect()[0][0]
    d_val = duckdb.sql(f"SELECT {probe} AS v").fetchall()[0][0]
    if s_val == d_val:  # pragma: no cover - environment change marker
        print("NOTE: native ln now agrees across engines:", s_val)

    # 2) portable pipeline: bit parity over the idf domain
    assert IDF_T_SQL == "((s - 1.0) / (s + 1.0))"  # keep the sweep in sync
    for n_docs in (500, 5_000, 60_000, 1_000_000):
        sp = [
            r[0]
            for r in spark.range(1, min(n_docs, 60_000) + 1)
            .selectExpr(f"id AS df", f"CAST({n_docs} AS BIGINT) AS n_docs")
            .selectExpr(f"{IDF_X_SQL} AS x")
            .selectExpr(f"{IDF_S_SQL} AS s")
            .selectExpr(f"{IDF_T_SQL} AS t")
            .selectExpr("2097152.0 * (t + (((t * t) * t) / 3.0)) AS v")
            .collect()
        ]
        du = [
            r[0]
            for r in duckdb.sql(
                f"WITH grid AS (SELECT unnest(range(1, {min(n_docs, 60_000) + 1})) AS df,"
                f" CAST({n_docs} AS BIGINT) AS n_docs),"
                f" x1 AS (SELECT {IDF_X_SQL} AS x FROM grid),"
                f" s1 AS (SELECT {IDF_S_SQL} AS s FROM x1),"
                f" t1 AS (SELECT {IDF_T_SQL} AS t FROM s1)"
                f" SELECT 2097152.0 * (t + (((t * t) * t) / 3.0)) AS v FROM t1"
            ).fetchall()
        ]
        assert sp == du, f"portable ln diverges for n_docs={n_docs}"
        # 3) accuracy contract: within 1e-8 absolute of true ln
        for df, v in zip(range(1, min(n_docs, 60_000) + 1), sp):
            x = ((n_docs - df) + 0.5) / (df + 0.5) + 1.0
            assert abs(v - math.log(x)) < 1e-8, (n_docs, df, v, math.log(x))
