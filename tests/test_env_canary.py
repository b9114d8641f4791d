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
