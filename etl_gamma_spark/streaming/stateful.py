"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.9); this is the
extension surface for operators that need *state across micro-batches* —
e.g. streaming deduplication of a document/event feed (drop records whose
key was already seen in any earlier batch), the streaming sibling of
operators/dedup.py.

Grouped-state semantics: events are grouped by a key column; each group's
state holds the set of fingerprints seen so far; only first-seen rows are
emitted (output mode append). At scale, state lives in the state store
(RocksDB on a real cluster), partitioned by the grouping key.

The kernel is a nested function (pickled by value — workers need no
package import; see operators/multimodal.py for the same pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..io import read_events_stream
from . import run_to_memory

OUTPUT_SCHEMA = "user_id bigint, event_id bigint, event_type string, value double"
STATE_SCHEMA = "seen array<bigint>"


def _dedup_fn():
    import pandas as pd  # local import: keep the closure self-contained

    def dedup(key, batches, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in batches:
            fresh = pdf[~pdf["event_id"].isin(seen)]
            first = fresh.drop_duplicates(subset=["event_id"], keep="first")
            seen.update(int(x) for x in first["event_id"])
            out.append(first[["user_id", "event_id", "event_type", "value"]])
        state.update((sorted(seen),))
        yield from (o for o in out if len(o))

    return dedup


def streaming_dedup_events(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_dedup",
    dupe_every: int | None = None,
) -> DataFrame:
    """Run first-seen-wins dedup over the events feed as a streaming query
    (availableNow) and return the deduplicated result.

    ``dupe_every=N`` injects an exact duplicate copy of every N-th event
    into the feed (a self-union) so the dedup semantics are observable:
    because the copies are identical on every output column, the
    deduplicated result is order-independent — one row per event_id —
    while a dedup-off passthrough would emit the injected doubles.
    """
    feed = read_events_stream(spark, sf_dir)
    if dupe_every is not None:
        feed = feed.unionByName(feed.filter(f"event_id % {dupe_every} = 0"))
    deduped = (
        feed
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_fn(),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # full-history dedup: one state row per key and a Python (Arrow)
    # kernel per partition — its WORK scales with parallelism, unlike
    # the tiny-state aggregates (measured at sf0.1: 5.7 s at 2 stores,
    # 2.9 s at 8)
    return run_to_memory(deduped, query_name, "append", state_partitions=8)


def streaming_dedup_within_watermark(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_dedup_wm",
    dupe_every: int = 10,
) -> DataFrame:
    """The BUILT-IN streaming dedup path: ``dropDuplicatesWithinWatermark``
    (Spark 3.5+) instead of the custom applyInPandasWithState operator
    above — state is managed (and expired) by the engine once the
    watermark passes a duplicate's event time, which is the production
    answer to the custom operator's forever-growing seen-set.

    Same observable contract as streaming_dedup_events: every N-th event
    is injected as an exact duplicate and must not survive.
    """
    feed = read_events_stream(spark, sf_dir)
    feed = feed.unionByName(feed.filter(f"event_id % {dupe_every} = 0"))
    deduped = (
        feed.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "ts", "value")
    )
    return run_to_memory(deduped, query_name, "append")
