"""Stateful streaming via ``transformWithStateInPandas`` — the Spark 4
arbitrary-state API (SPARK-49564, successor to applyInPandasWithState):
a ``StatefulProcessor`` class with explicit named state variables instead
of a single opaque tuple, plus timers and TTL support.

GATED in this sandbox: the TWS state-server protocol is protobuf-based
(pyspark/sql/streaming/proto/StateMessage_pb2) and ``google.protobuf`` is
not installed here (no pip allowed). ``tws_available()`` reports the
capability; ``streaming_user_stats`` raises a clear error when absent —
same gating pattern as sources/jdbc.py (no DB in sandbox). The
applyInPandasWithState operator in streaming/stateful.py is the running
stateful path; this module is the forward-compatible Spark-4-native one.

Operator: per-user running event statistics (count, money-safe value
total, latest event time) maintained across micro-batches. Emission is
update-mode per key per batch; over the static fixture with availableNow
(a single batch) the result is exactly the batch GROUP BY — which is the
DuckDB oracle. All accumulators are order-independent (count, Decimal
sum — exact associative arithmetic, no float reordering — and max), so
the output is deterministic under any shuffle layout.

The processor class is built inside a factory function so cloudpickle
serializes it BY VALUE — workers never import etl_gamma_spark (CLAUDE.md
plumbing rule; same pattern as streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_events_stream
from . import run_to_memory

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value decimal(18,6), last_ts timestamp"
)


def tws_available() -> bool:
    """True when the TWS protobuf state protocol can load (google.protobuf
    installed). Checked up front so failures are a clear capability gate,
    not a mid-query streaming-runner crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _user_stats_processor():
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    state_schema = StructType(
        [
            StructField("n_events", LongType()),
            # Decimal total carried as its exact string form: decimal state
            # columns round-trip as strings here to avoid any float pass
            StructField("total_str", StringType()),
            StructField("last_ts", TimestampType()),
        ]
    )

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            total = Decimal("0")
            last_ts = None
            if self._state.exists():
                prev_n, prev_total, prev_ts = self._state.get()
                n, total, last_ts = prev_n, Decimal(prev_total), prev_ts
            six = Decimal("0.000001")
            for pdf in rows:
                n += len(pdf)
                # ROUND(value, 6) per row, then exact Decimal sum —
                # associative+commutative, so shuffle order is irrelevant.
                # HALF_UP on the shortest decimal repr (Decimal(str(v)))
                # mirrors Spark/DuckDB ROUND; Python's round() would be
                # banker's-rounding on the binary double and diverge at
                # half boundaries (e.g. 1.0000005).
                total += sum(
                    (
                        Decimal(str(v)).quantize(six, rounding=ROUND_HALF_UP)
                        for v in pdf["value"]
                    ),
                    Decimal("0"),
                )
                batch_max = pdf["ts"].max()
                if last_ts is None or batch_max > last_ts:
                    last_ts = batch_max
            total = total.quantize(Decimal("0.000001"))
            self._state.update((n, str(total), last_ts))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts": [last_ts],
                }
            )

        def close(self) -> None:
            pass

    return UserStatsProcessor()


def streaming_user_stats(
    spark: SparkSession, sf_dir: str, query_name: str = "tws_user_stats"
) -> DataFrame:
    """Run the per-user running-stats processor over the events feed to
    completion (availableNow) and return the final per-user rows."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (the TWS "
            "state-server protocol); not installed in this environment — "
            "use streaming.stateful (applyInPandasWithState) instead"
        )
    feed = read_events_stream(spark, sf_dir)
    stats = feed.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_stats_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    return run_to_memory(stats, query_name, "update")
