"""Watermarked event-time windowing (Structured Streaming late-data
handling) — extension beyond the strictly-batch reference (SURVEY §2.9).

Append-mode tumbling hourly aggregate with a 10-minute watermark: a window
is emitted only once the watermark (max event time − delay) passes its
end, i.e. late events within the delay still count, later ones are
dropped. With ``availableNow`` over a static fixture the result is
deterministic: exactly the windows whose end ≤ max(ts) − delay — which is
what the DuckDB oracle replicates (registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_events_stream
from . import run_to_memory

WATERMARK = "10 minutes"
WINDOW = "1 hour"


def windowed_event_counts(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DECIMAL(18,6))"
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession, sf_dir: str, query_name: str = "windowed_events"
) -> DataFrame:
    # append mode: only watermark-finalized windows are emitted
    return run_to_memory(
        windowed_event_counts(read_events_stream(spark, sf_dir)), query_name, "append"
    )


def run_session_window_stream(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes",
    query_name: str = "session_windows",
) -> DataFrame:
    """Native streaming sessionization: ``session_window(ts, gap)`` merges
    events into dynamic per-key windows that close after ``gap`` of
    inactivity — the streaming sibling of operators/temporal.sessionize
    (whose batch output it must agree with; see the registry oracle).

    Complete mode + availableNow over the static fixture: all sessions
    finalized deterministically.
    """
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return run_to_memory(agg, query_name, "complete")
