"""Structured Streaming extensions (the reference is strictly batch).

Shared driver for the deterministic local runs: every demo consumes the
static fixture with ``availableNow`` into a memory sink and returns the
result table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_to_memory(df: DataFrame, query_name: str, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) through a
    memory sink and return the materialized table."""
    spark = df.sparkSession
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
