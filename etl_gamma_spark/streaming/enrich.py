"""Stream-static dimension enrichment (Structured Streaming join class
not covered by the stream-stream interval join): each micro-batch of the
event stream hash-joins against a STATIC dimension table — Spark re-plans
the static side per batch, so a small dim broadcasts and the stream side
never shuffles for the join.

The demo rolls enriched events up per (segment, event_type) in complete
mode; with ``availableNow`` over the static fixture the result equals the
batch join+aggregate, which is exactly what the DuckDB oracle states.
Money/value sums follow the repo rule: round per-row, cast decimal, THEN
sum (order-independent decimal aggregation).

Scale posture: the dim is broadcast (or, for a big dim, becomes a plain
shuffle hash join per batch); the streaming aggregate state is keyed by
(segment, event_type) — bounded cardinality, one state row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, read_events_stream
from . import run_to_memory


def enriched_segment_rollup(events: DataFrame, customer: DataFrame) -> DataFrame:
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DECIMAL(18,6))"
            ).alias("total_value"),
        )
    )


def run_enriched_rollup(
    spark: SparkSession, sf_dir: str, query_name: str = "dim_enriched_events"
) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer")
    return run_to_memory(enriched_segment_rollup(stream, dim), query_name, "complete")
