"""Change-data-capture apply: MERGE a keyed change set into a base
snapshot without a transactional table format.

The reference refreshes targets by scoped delete-then-insert
(reference utils/db_connection.py delete+insert pattern; our
sources/sink.py implements those scopes). At 100 TB the rewrite-the-scope
model breaks down when changes touch a thin slice of many partitions —
the standard lakehouse answer is MERGE (Delta/Iceberg). This operator is
the engine-level MERGE kernel expressed as a plain full-outer join +
CASE, so it runs on any store and its semantics are oracle-checkable.

Scale posture: ONE shuffle join keyed by the merge key (AQE handles
change-set skew); the change side is usually ≪ base, so AQE's size
statistics will pick a broadcast join for small change sets
automatically — nothing here forces a strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
    op_col: str = "op",
    assert_unique: bool = False,
) -> DataFrame:
    """Apply a CDC change set to a base snapshot (latest-wins upsert/delete).

    ``changes`` carries (key, *value_cols, op) with op ∈ {'U', 'D'} and at
    most one row per key (dedup upstream — e.g. latest-by-timestamp):

    * matched, op='U'   → change row's values replace the base row's
    * matched, op='D'   → row dropped
    * unmatched, op='U' → inserted
    * unmatched, op='D' → no-op (delete of an absent key)
    * base keys without a change row pass through untouched

    Output schema: (key, *value_cols) — a full next snapshot.

    Contract (caller-enforced; pass ``assert_unique=True`` to pay one
    validation pass): change keys are NON-NULL and unique — a duplicated
    change key would fan the full-outer join out into duplicate snapshot
    rows. Ops outside {'U','D'} are treated as 'D' (conservative: an
    unrecognized instruction never fabricates values), and a NULL op on
    a change row acts as 'U'; both conventions hold identically in the
    registry oracle (same filter + CASE predicates).
    """
    if assert_unique:
        from ..sources.sink import assert_unique_grain

        assert_unique_grain(changes, [key])
    b = base.select(key, *value_cols)
    c = changes.select(
        F.col(key).alias("__ck"),
        *[F.col(v).alias(f"__c_{v}") for v in value_cols],
        F.col(op_col).alias("__op"),
    )
    joined = b.join(c, F.col(key) == F.col("__ck"), "full_outer")
    # mirror the registry oracle exactly so engine and oracle cannot
    # diverge on out-of-contract rows: the survival filter is on op
    # (WHERE c.op IS NULL OR c.op = 'U') and value selection is on change
    # presence (CASE WHEN c.key IS NOT NULL ...)
    merged = joined.filter(
        F.col("__op").isNull() | (F.col("__op") == "U")
    ).select(
        F.coalesce(F.col(key), F.col("__ck")).alias(key),
        *[
            F.when(F.col("__ck").isNotNull(), F.col(f"__c_{v}"))
            .otherwise(F.col(v))
            .alias(v)
            for v in value_cols
        ],
    )
    # both delete branches are the one filter above: a matched 'D' drops
    # the base row it joined to, an unmatched 'D' emits nothing
    return merged


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed reconciliation of two table versions: one row per key with
    status only_a / only_b / changed / equal — the migration-validation
    primitive (e.g. old pipeline output vs new engine output).

    Each side reduces to (keys, xxhash64 digest) BEFORE the full-outer
    join, so the shuffle carries 8-byte digests instead of full rows and
    the change test is one integer comparison (null-safe: xxhash64 never
    returns NULL, a missing side shows as a NULL hash).

    Spark's hash functions SKIP null inputs entirely, so a bare
    ``xxhash64(*compare_cols)`` would hash ('x', NULL) and (NULL, 'x')
    identically — a deterministic false 'equal' exactly in the
    value-shifted-between-columns / column-nulled cases migration
    validation exists to catch. Each column is therefore prefixed with
    its own is-null flag: the flag both marks the null and keeps the
    surviving values at distinct stream positions. The remaining 2^-64
    random collision reads as 'equal' — acceptable for a reconciliation
    report; byte-exact audits should diff the flagged keys' full rows
    afterward.
    """

    def _null_safe_hash(alias: str):
        parts = []
        for col in compare_cols:
            parts.append(F.col(col).isNull().cast("int"))
            parts.append(F.col(col))
        return F.xxhash64(*parts).alias(alias)

    ha = a.select(*keys, _null_safe_hash("__ha"))
    hb = b.select(*keys, _null_safe_hash("__hb"))
    j = ha.join(hb, keys, "full_outer")
    status = (
        F.when(F.col("__hb").isNull(), F.lit("only_a"))
        .when(F.col("__ha").isNull(), F.lit("only_b"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
        .otherwise(F.lit("equal"))
    )
    return j.select(*keys, status.alias("status"))


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str],
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a change
    feed: one validity-interval row per VALUE EPISODE per key —
    consecutive feed rows with identical tracked values collapse into
    one interval (true SCD2 change detection), ``valid_to`` is the next
    episode's start (NULL = open) and ``is_current`` marks it.

    The repo's interval machinery in reverse: responsibility.py turns
    existing period tables into point-in-time joins; this MANUFACTURES
    the period table from raw change events.

    Determinism: the per-key order is (ts, *tiebreak_cols) — callers
    must pass tiebreakers making it total (CLAUDE.md window rule).
    Change detection is null-safe (NULL → value and value → NULL both
    open new episodes).

    Scale posture: all three windows partition BY KEY — per-key history
    is bounded (a dimension key's change count, not the corpus), so no
    partition outgrows a task; the episode aggregate is map-side
    combinable. One shuffle on the key, reused by every window stage.
    """
    from pyspark.sql import Window

    if not value_cols:
        raise ValueError("at least one value column required")
    order = [ts_col, *tiebreak_cols]
    wk = Window.partitionBy(*key_cols).orderBy(*order)
    changed = None
    for c in value_cols:
        diff = ~F.col(c).eqNullSafe(F.lag(c).over(wk))
        changed = diff if changed is None else (changed | diff)
    first = F.row_number().over(wk) == 1
    flagged = changes.select(
        *key_cols,
        *value_cols,
        *order,
        F.when(first | changed, F.lit(1)).otherwise(F.lit(0)).alias("__chg"),
    )
    epoch = flagged.withColumn(
        "__epoch",
        F.sum("__chg").over(
            wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    episodes = epoch.groupBy(*key_cols, "__epoch", *value_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    we = Window.partitionBy(*key_cols).orderBy("__epoch")
    return (
        episodes.withColumn("valid_to", F.lead("valid_from").over(we))
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("int")
        )
        .select(
            *key_cols, *value_cols, "valid_from", "valid_to",
            "is_current", "n_events",
        )
    )
