"""Structured Streaming extensions (the reference is strictly batch).

Shared driver for the deterministic local runs: every demo consumes the
static fixture with ``availableNow`` into a memory sink and returns the
result table.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame

# Checkpoint/state-store base for the local memory-sink runs: tmpfs when
# available (the WAL + HDFSBackedStateStore writes are the bulk of each
# micro-batch's fixed cost on a local disk). The memory sink is inherently
# a single-process demo/test surface — production sinks (monthly_rollup's
# foreachBatch writer) take an explicit durable checkpoint path instead.
_FAST_DIR = os.environ.get(
    "SPARK_GRAFT_STREAM_TMP",
    "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir(),
)


def run_to_memory(df: DataFrame, query_name: str, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) through a
    memory sink and return the materialized table. A fresh per-run
    checkpoint dir (never reused — a stale one would replay committed
    offsets and return an empty table) is cleaned up on exit."""
    spark = df.sparkSession
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_", dir=_FAST_DIR)
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(query_name)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
