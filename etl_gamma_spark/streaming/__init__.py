"""Structured Streaming extensions (the reference is strictly batch).

Shared driver for the deterministic local runs: every demo consumes the
static fixture with ``availableNow`` into a memory sink and returns the
result table.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

# Checkpoint/state-store base for the local memory-sink runs: tmpfs when
# available (the WAL + HDFSBackedStateStore writes are the bulk of each
# micro-batch's fixed cost on a local disk). The memory sink is inherently
# a single-process demo/test surface — production sinks (monthly_rollup's
# foreachBatch writer) take an explicit durable checkpoint path instead.
_FAST_DIR = os.environ.get(
    "SPARK_GRAFT_STREAM_TMP",
    "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir(),
)

# State-store partition count for the local runs. A stateful streaming
# query creates one state-store instance PER shuffle partition, and each
# instance pays a fixed WAL + commit + snapshot cost per micro-batch —
# with the session's 32 shuffle partitions that fixed cost dominates the
# demo aggregates (measured at sf0.1: windowed 14.7→3.1 s, sessions
# 4.2→1.9 s, rollup 2.9→1.7 s going 32→4; round 7 re-measured the floor:
# interval join 6.1→3.5 s and watermark dedup 3.6→2.0 s going 4→2, while
# 1 serializes the join work and regresses — 2 is the local sweet spot).
# On a real cluster this knob is sized to state VOLUME (keys × state
# size / executor memory), not to the batch default — hence
# env-overridable, and safe to vary per run because every run here
# starts from a fresh checkpoint (the partition count is pinned into
# checkpoint metadata on the first batch).
STREAM_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "2")


@contextlib.contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: str | int | None = None):
    """Temporarily size ``spark.sql.shuffle.partitions`` for a stateful
    streaming run (see STREAM_SHUFFLE_PARTITIONS; ``n`` overrides for a
    query whose STATE VOLUME warrants more stores — e.g. a full-history
    dedup keeps one state row per key, so its work scales with
    parallelism, while a windowed aggregate's state is tiny and pays
    only the per-store fixed cost). Restores the session value
    afterwards so batch plans are unaffected."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(n if n is not None else STREAM_SHUFFLE_PARTITIONS),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def run_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) through a
    memory sink and return the materialized table. A fresh per-run
    checkpoint dir (never reused — a stale one would replay committed
    offsets and return an empty table) is cleaned up on exit."""
    spark = df.sparkSession
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_", dir=_FAST_DIR)
    try:
        with stream_shuffle_partitions(spark, state_partitions):
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
