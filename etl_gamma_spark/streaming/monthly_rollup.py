"""Structured Streaming incrementalization of the monthly rollup.

The reference is strictly batch (SURVEY.md §2.9): "current month"
freshness comes from re-running the presente pipelines. This module shows
the Spark-native upgrade path: the same monthly aggregate expressed over
``readStream`` so late-arriving facts update the month incrementally —
A1 incrementalized, with a foreachBatch idempotent sink ≙ the reference's
delete-then-insert (S4).

For deterministic local runs the driver's single-file events table is
consumed with ``availableNow`` (process everything, then stop) and a
memory sink; on a real deployment the source is a directory/Kafka stream
and the sink is ``write_partition_overwrite`` inside foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_events_stream
from . import run_to_memory, stream_shuffle_partitions


def monthly_event_rollup(events: DataFrame) -> DataFrame:
    """The (streamable) aggregation: per (month, event_type) counts and
    value sums. Money-style decimal sum so batch and streaming runs are
    bit-identical regardless of partition order."""
    return (
        events.groupBy(
            F.trunc(F.col("ts"), "month").alias("mes"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DECIMAL(18,6))").alias(
                "total_value"
            ),
        )
    )


def run_streaming_rollup(
    spark: SparkSession, sf_dir: str, query_name: str = "monthly_rollup"
) -> DataFrame:
    """Drive the rollup as a streaming query to completion and return the
    result table."""
    agg = monthly_event_rollup(read_events_stream(spark, sf_dir))
    return run_to_memory(agg, query_name, "complete")


def run_streaming_rollup_to_sink(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """The production shape: stream → monthly aggregate → foreachBatch
    writing each micro-batch's months through the idempotent
    partition-overwrite sink (S4 semantics). Re-running a month's data
    rewrites that month's partition only; the checkpoint makes restarts
    exactly-once per batch."""
    from ..sources.sink import write_partition_overwrite

    agg = monthly_event_rollup(read_events_stream(spark, sf_dir))

    def upsert(batch_df, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        write_partition_overwrite(batch_df, out_path, ["mes"])

    with stream_shuffle_partitions(agg.sparkSession):
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
