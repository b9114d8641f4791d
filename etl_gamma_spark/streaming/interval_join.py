"""Stream-stream event-time interval join (Structured Streaming) — the
last streaming operator class the repo lacked (SURVEY §2.9 extension;
the reference is strictly batch).

Attribution-style join: every purchase is matched to the views by the
same user in the preceding ``max_delay`` window. Both sides carry
watermarks so the state store can evict expired view/purchase rows —
without them a stream-stream join's state grows without bound (THE
scale failure mode of streaming joins; with them, state is bounded by
delay × arrival rate regardless of stream length).

Determinism: with ``availableNow`` over the single-file fixture the
whole input lands in one micro-batch, and INNER join results are emitted
as soon as both sides are present (only OUTER joins await the watermark)
— so the output equals the equivalent batch self-join, which is exactly
what the DuckDB oracle states (registry). The watermarks still shape the
plan (EventTimeWatermark + state eviction appear in the physical plan),
so the scale posture is the real one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_events_stream
from . import run_to_memory

MAX_DELAY = "10 minutes"


def view_purchase_join(events: DataFrame, max_delay: str = MAX_DELAY) -> DataFrame:
    """(user_id, view_id, view_ts, purchase_id, purchase_ts) pairs where the
    purchase follows the view strictly within ``max_delay``."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", max_delay)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", max_delay)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.expr(f"view_ts + INTERVAL {max_delay}"))
    )
    return views.join(purchases, cond).select(
        "user_id", "view_id", "view_ts", "purchase_id", "purchase_ts"
    )


def run_interval_join_stream(
    spark: SparkSession, sf_dir: str, query_name: str = "vp_interval_join"
) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(view_purchase_join(events), query_name, "append")
