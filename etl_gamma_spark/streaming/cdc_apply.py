"""Streaming CDC upsert sink: a change feed applied to a keyed snapshot
table via foreachBatch + operators/cdc.apply_changes — the lakehouse
pattern for maintaining a materialized latest-state table from a stream
(Debezium-style feeds, app-event "current state" tables).

Per micro-batch: reduce the batch to its LATEST change per key (max by
(ts, tiebreak) — a combinable aggregate), then merge into the parquet
snapshot with upsert/delete semantics ('error' events delete the key,
anything else upserts the rounded value). Sequential batch application
preserves the latest-wins invariant, so the final table equals the batch
latest-per-key over the whole stream — which is exactly the DuckDB
oracle (registry).

Scale posture: the per-batch reduce is one map-side-combinable aggregate
over the batch (bounded by batch size); the merge is one key-equi join
against the snapshot (AQE broadcasts the usually-small change side). The
snapshot rewrite is staged-then-renamed; on a table format with MERGE
the same plan maps 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_events_stream
from ..operators.cdc import apply_changes
from ..sources.sink import swap_directory
from . import stream_shuffle_partitions

CUTOFF = "2024-01-16 00:00:00"


def latest_changes(events: DataFrame) -> DataFrame:
    """(key, val, op): the latest event per user decides — 'error' → D,
    anything else → U with the rounded value. max(struct(...)) keyed by
    (ts, event_id) is a total order, engine-equal with the oracle's
    ``ORDER BY ts DESC, event_id DESC`` window."""
    return (
        events.selectExpr(
            "user_id AS key",
            "ts",
            "event_id",
            "event_type",
            "CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS val",
        )
        .groupBy("key")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "val")).alias("__l"))
        .select(
            "key",
            F.col("__l.val").alias("val"),
            F.when(F.col("__l.event_type") == "error", "D").otherwise("U").alias("op"),
        )
    )


def build_base_snapshot(events: DataFrame, out_path: str) -> None:
    """Initial state: latest-per-user over the pre-cutoff feed, deletes
    already applied."""
    state = latest_changes(events.filter(F.col("ts") < F.lit(CUTOFF))).filter(
        F.col("op") == "U"
    ).select("key", "val")
    state.write.mode("overwrite").parquet(out_path)


def apply_feed(feed: DataFrame, out_path: str, checkpoint: str) -> None:
    """Drive any change feed (a streaming events-shaped DataFrame) into
    the snapshot at ``out_path``; split out from the sf_dir runner so
    tests can feed multi-file sources with maxFilesPerTrigger=1 and prove
    the sequential-application invariant batch by batch."""

    def upsert(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        changes = latest_changes(batch_df)
        sess = batch_df.sparkSession
        base = sess.read.parquet(out_path)
        merged = apply_changes(base, changes, "key", ["val"])
        tmp = out_path.rstrip("/") + "._applying"
        merged.write.mode("overwrite").parquet(tmp)
        # rename-aside swap, not rmtree-then-rename: the checkpoint marks
        # this batch committed, so a crash during a long delete would lose
        # the snapshot unrecoverably (sources/sink.py::swap_directory)
        swap_directory(tmp, out_path)

    with stream_shuffle_partitions(feed.sparkSession):
        q = (
            feed.writeStream.outputMode("append")
            .foreachBatch(upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_streaming_cdc_apply(
    spark: SparkSession, sf_dir: str, out_path: str, checkpoint: str
) -> None:
    """Stream the post-cutoff events as a change feed into the snapshot."""
    feed = read_events_stream(spark, sf_dir).filter(F.col("ts") >= F.lit(CUTOFF))
    apply_feed(feed, out_path, checkpoint)
