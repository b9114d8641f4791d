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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs


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
    apply_runtime_confs(spark)
    # schema must be declared for streaming reads; the raw file stores
    # TIMESTAMP(NANOS) which arrives as bigint under nanosAsLong
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))

    agg = monthly_event_rollup(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
