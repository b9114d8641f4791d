"""Temporal operators Spark lacks natively (extension surface; the
reference has no ranking/running-frame windows at all — SURVEY §2.5/§2.6):
as-of join, sessionization, top-k per group.

All three are pure window/DataFrame compositions (option (a) of the
custom-operator ladder: no Pandas UDF needed).

Scale posture:
  * asof_join — the union+last_value formulation shuffles each side ONCE
    on the key (the same exchange a join would need) and never builds a
    per-row subquery; skewed keys fall under AQE.
  * sessionize — one shuffle on the entity key; gap detection and session
    numbering are two window passes over the same partitioning (no second
    exchange).
  * topk_per_group — partial ranking happens after a single shuffle on the
    group key; for huge groups pre-aggregate first (as the query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: str,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` (inclusive) for the same key — e.g. "price as
    of trade time".

    Union both sides tagged, sort by (ts, side, tiebreak) so a right row
    at the identical timestamp sorts before the left row (inclusive
    semantics) and equal-timestamp right rows resolve deterministically by
    ``tiebreak``; then last_value(ignore nulls) over the running frame
    carries each right value forward.
    """
    l_cols = [c for c in left.columns]
    tagged_r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols if c != key],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_vals],
        *[F.col(c) for c in l_cols if c != key],
    )
    # NULLS LAST explicitly: Spark's ascending default is nulls-first while
    # DuckDB's is nulls-last — a NULL timestamp would silently reorder the
    # carry-forward between engine and oracle
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ts").asc_nulls_last(),
            F.col("__side").asc_nulls_last(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_r.unionByName(tagged_l).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        key, *[c for c in l_cols if c != key], *[f"asof_{c}" for c in right_vals]
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same entity exceeds ``gap_minutes``. Returns the
    events with ``session_id`` (1-based per entity)."""
    order = Window.partitionBy(key).orderBy(ts, tiebreak)
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-exact gap: cast-to-long would truncate to whole seconds
    # and misclassify gaps whose fractional parts straddle the threshold.
    # NTZ-tolerant: unix_micros rejects TIMESTAMP_NTZ inputs (Spark 4 may
    # infer NTZ from untagged parquet), and the session tz is pinned UTC so
    # the cast is value-preserving.
    micros = F.unix_micros(F.col(ts).cast("timestamp"))
    gap_break = (
        F.when(
            micros - F.lag(micros).over(order) > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("__new_session")
    )
    return (
        events.select("*", gap_break)
        .select("*", (F.sum("__new_session").over(run) + 1).alias("session_id"))
        .drop("__new_session")
    )


def retention_cohorts(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: bucket every entity by its FIRST-seen day
    (the cohort), then count how many of each cohort were active again N
    days later — the standard product-analytics retention triangle.

    Output: (cohort_day, day_offset, n_users). Day granularity because the
    test events span one month; swapping ``to_date`` for ``date_trunc``
    retunes to weekly/monthly cohorts.

    Scale posture: two aggregates, both keyed by the entity — (1) min-ts
    per entity (map-side combinable), (2) distinct (entity, day) via a
    groupBy rather than COUNT(DISTINCT ...) so the heavy dedup happens
    pre-join; the final (cohort, offset) aggregate is tiny (≤ days²/2
    cells). The activity→cohort join is keyed by entity — AQE broadcasts
    the cohort side when it is small enough.
    """
    firsts = events.groupBy(key).agg(
        F.min(F.to_date(ts)).alias("cohort_day")
    )
    activity = events.select(key, F.to_date(ts).alias("activity_day")).distinct()
    return (
        activity.join(firsts, key)
        .select(
            "cohort_day",
            F.datediff("activity_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many entities performed step 1, then
    step 2 STRICTLY AFTER their first step 1, then step 3 strictly after
    that, … (first-touch semantics: each stage anchors on the EARLIEST
    qualifying event, the standard conversion-funnel definition).

    Output: (step_idx, step, n_users) — one row per funnel stage,
    monotonically non-increasing counts.

    Scale posture: one filtered aggregate + one entity-keyed join per
    stage — stage frames shrink monotonically, and every join is on the
    entity key (no window over the whole event stream). The per-stage
    aggregate is map-side combinable min(ts).
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    out = None
    prev = None  # (key, __t) entities that reached the previous stage
    for i, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step).select(
            key, F.col(ts).alias("__ets")
        )
        if prev is not None:
            stage = stage.join(prev, key).filter(F.col("__ets") > F.col("__t"))
        reached = stage.groupBy(key).agg(F.min("__ets").alias("__t"))
        row = reached.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step_idx"), F.lit(step).alias("step"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
        prev = reached
    return out


def attribution_linear(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    touch_type: str = "view",
    conv_type: str = "purchase",
    value: str = "value",
    window_minutes: int = 10,
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value is split
    EQUALLY across the same entity's touches in the preceding
    ``window_minutes`` — the classic marketing-analytics credit model.

    Output: (touch_id, key, n_conversions, attributed) — conversions with
    no qualifying touch contribute nothing (no fallback credit).

    Money discipline (CLAUDE.md): the per-(touch, conversion) share is
    rounded per-row THEN cast DECIMAL before the sum, so the aggregate is
    partition-order independent and engine-exact.

    Scale posture: the touch×conversion pair join is entity-keyed with a
    time-range residual (same shape as the stream-stream interval join);
    the share divisor is a window over conversion_id — bounded by touches
    per window, never corpus-sized.
    """
    touches = events.filter(F.col("event_type") == touch_type).select(
        F.col(key),
        F.col("event_id").alias("touch_id"),
        F.col(ts).alias("touch_ts"),
    )
    convs = events.filter(F.col("event_type") == conv_type).select(
        F.col(key).alias("__ck"),
        F.col("event_id").alias("conv_id"),
        F.col(ts).alias("conv_ts"),
        F.col(value).alias("conv_value"),
    )
    cond = (
        (F.col(key) == F.col("__ck"))
        & (F.col("conv_ts") > F.col("touch_ts"))
        & (F.col("conv_ts") <= F.expr(f"touch_ts + INTERVAL {window_minutes} MINUTES"))
    )
    pairs = touches.join(convs, cond)
    n = F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
    share = pairs.withColumn("__n", n).selectExpr(
        "touch_id",
        key,
        "conv_id",
        "CAST(ROUND(conv_value / __n, 6) AS DECIMAL(18,6)) AS __share",
    )
    return share.groupBy("touch_id", key).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("__share").cast("decimal(18,6)").alias("attributed"),
    )


def ohlc_downsample(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "val",
    tiebreak: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Downsample a value stream to per-(entity, time-bucket) OHLC bars
    (open/high/low/close) — the standard timeseries compaction before
    charting or feature extraction.

    Open/close are the FIRST/LAST value by (ts, tiebreak) — computed as
    ``min/max(struct(ts, tiebreak, value))``, a total order both engines
    compare identically (never ``arg_min(value, ts)``, whose tie behavior
    is engine-defined). One map-side-combinable aggregate keyed by
    (entity, bucket): no window, no second shuffle — scales to any stream
    length.
    """
    b = F.date_trunc(bucket, F.col(ts)).alias("bucket_ts")
    first = F.min(F.struct(ts, tiebreak, value)).alias("__f")
    last = F.max(F.struct(ts, tiebreak, value)).alias("__l")
    return (
        events.groupBy(key, b)
        .agg(
            first,
            last,
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            key,
            "bucket_ts",
            F.col(f"__f.{value}").alias("open"),
            "high",
            "low",
            F.col(f"__l.{value}").alias("close"),
            "n_ticks",
        )
    )


def gap_fill_monthly(
    df: DataFrame,
    key: str,
    month_col: str,
    value_col: str,
) -> DataFrame:
    """Regularize a sparse per-entity monthly series: emit one row for
    EVERY month in each entity's [first, last] observed span, carrying the
    last observed value forward across gaps (pandas ``resample('MS') +
    ffill`` — the reference stack's idiom — as a relational plan).

    Output: (key, month_col, value_col, is_observed); observed months pass
    through, gap months get the previous value and ``is_observed = false``.

    Scale posture: one aggregate for per-entity spans, a generated month
    grid (rows = entity-months, never more than the filled output), one
    entity+month-keyed left join, and ONE window partitioned by entity
    ordered by month — month is unique per entity so the ordering is a
    total order, and partitions are span-sized, not corpus-sized.
    """
    spans = df.groupBy(key).agg(
        F.min(month_col).alias("__a"), F.max(month_col).alias("__b")
    )
    grid = spans.select(
        key,
        F.explode(F.expr("sequence(__a, __b, interval 1 month)")).alias(month_col),
    )
    # presence marker, NOT value non-nullness: an observed month whose
    # value is explicitly NULL must still flag is_observed=true (its value
    # is carried forward regardless — pandas ffill fills observed NaNs too)
    joined = grid.join(
        df.select(key, month_col, value_col, F.lit(1).alias("__obs")),
        [key, month_col],
        "left",
    )
    w = (
        Window.partitionBy(key)
        .orderBy(month_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        month_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col("__obs").isNotNull().alias("is_observed"),
    )


def topk_per_group(
    df: DataFrame,
    group: str,
    order_col: str,
    k: int,
    tiebreak: str,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` desc (deterministic via
    ``tiebreak``), with the rank attached."""
    w = Window.partitionBy(group).orderBy(F.col(order_col).desc(), F.col(tiebreak))
    return df.select(
        "*", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)


def rolling_months(
    df: DataFrame,
    key: str,
    month_col: str,
    value_col: str,
    months: int = 3,
) -> DataFrame:
    """Trailing ``months``-month aggregate per entity over a (possibly
    sparse) monthly series — a RANGE frame, not a ROWS frame: a missing
    month shrinks the window instead of silently reaching further back
    (the classic ROWS-frame bug on sparse series).

    Output: (key, month_col, value_col + '_trailing', n_months) where the
    sum covers months in (current - months, current].

    The frame orders by an integer month index (year*12 + month) so the
    RANGE bound is exact integer arithmetic in both engines. The window
    value aggregate is a DECIMAL sum — exact, hence order-independent;
    when the input is an int64-backed DECIMAL the widened SUM result is
    cast back to the input type so no int128-backed decimal crosses the
    driver boundary (oracle-parity invariant; a few trailing months of
    already-rounded values cannot overflow it).
    One shuffle on the entity key; partitions are entity-span-sized.
    """
    from pyspark.sql.types import DecimalType

    midx = (F.year(month_col) * 12 + F.month(month_col)).alias("__midx")
    w = (
        Window.partitionBy(key)
        .orderBy("__midx")
        .rangeBetween(-(months - 1), Window.currentRow)
    )
    trailing = F.sum(value_col).over(w)
    vtype = df.schema[value_col].dataType
    if isinstance(vtype, DecimalType) and vtype.precision <= 18:
        trailing = trailing.cast(vtype)
    return (
        df.select(key, month_col, value_col, midx)
        .select(
            key,
            month_col,
            value_col,
            trailing.alias(f"{value_col}_trailing"),
            F.count("*").over(w).cast("long").alias("n_months"),
        )
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row of the same key whose
    timestamp is NEAREST in either direction (pandas
    ``merge_asof(direction='nearest')`` — the reference stack's idiom),
    optionally bounded by ``tolerance_us`` microseconds. Ties at equal
    distance prefer the BACKWARD (earlier) match, like pandas; equal
    timestamps on the right side resolve to the largest ``tiebreak``.

    Plan: ONE shuffle on the key, then two in-partition window passes
    over the same union — ascending carry-forward for the backward
    candidate, descending for the forward candidate — and an expression
    picks the closer side. No join, no per-row subquery; hot keys are
    bounded by the entity's own event count.

    Output: all left columns + ``nearest_<val>`` per right value +
    ``delta_us`` (NULL when no match within tolerance).
    """
    l_cols = list(left.columns)
    r_types = dict(right.dtypes)
    l_types = dict(left.dtypes)
    carried = [*right_vals, "__rts"]
    tagged_r = right.select(
        F.col(key),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__r___rts"),
        *[
            F.lit(None).cast(l_types[c]).alias(c)
            for c in l_cols
            if c != key
        ],
    )
    tagged_l = left.select(
        F.col(key),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        *[F.lit(None).cast(r_types[c]).alias(f"__r_{c}") for c in right_vals],
        F.lit(None).cast("long").alias("__r___rts"),
        *[F.col(c) for c in l_cols if c != key],
    )
    run = (Window.unboundedPreceding, Window.currentRow)
    # backward: right rows at the same instant sort BEFORE the left row
    # (inclusive), equal-ts rights resolve to the largest tiebreak
    wb = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ts").asc_nulls_last(),
            F.col("__side").asc_nulls_last(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(*run)
    )
    # forward: descending timestamps; side stays ascending so equal-ts
    # rights still precede the left row (inclusive on both directions)
    wf = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ts").desc_nulls_last(),
            F.col("__side").asc_nulls_last(),
            F.col("__tb").asc_nulls_last(),
        )
        .rowsBetween(*run)
    )
    filled = tagged_r.unionByName(tagged_l).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in carried
        ],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in carried
        ],
    )
    db = F.col("__ts") - F.col("__b___rts")
    df_ = F.col("__f___rts") - F.col("__ts")
    if tolerance_us is not None:
        db = F.when(db <= tolerance_us, db)
        df_ = F.when(df_ <= tolerance_us, df_)
    use_b = F.when(df_.isNull(), F.lit(True)).otherwise(
        db.isNotNull() & (db <= df_)
    )
    # db/df_ NULL covers both "no candidate" and "outside tolerance" —
    # either way the stale carried values must not leak through
    picked = [
        F.when(use_b & db.isNotNull(), F.col(f"__b_{c}"))
        .otherwise(F.when(~use_b & df_.isNotNull(), F.col(f"__f_{c}")))
        .alias(f"nearest_{c}")
        for c in right_vals
    ]
    delta = (
        F.when(use_b, db).otherwise(df_).cast("long").alias("delta_us")
    )
    return filled.filter(F.col("__side") == 1).select(
        key, *[c for c in l_cols if c != key], *picked, delta
    )


def twap_buckets(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Time-weighted average per (entity, hour bucket) — the financial
    TWAP downsample, companion to ohlc_downsample. Each tick's value
    holds from its timestamp until the next tick in the bucket (the last
    tick extends to the bucket end); a tick at the same instant as its
    successor gets zero weight.

    Determinism: weights are integer microseconds and the numerator is
    an exact DECIMAL sum (value rounded to 6 places x DECIMAL(18,0)
    weight), so both aggregates are order-independent; the only double
    arithmetic is the final single division, identical in both engines.

    One shuffle on (entity, bucket); the LEAD window and the aggregate
    share that partitioning.
    """
    t = events.select(
        F.col(key).alias("k"),
        F.col(ts).cast("timestamp").alias("t"),
        # width 19: in DuckDB, width<=18 decimal multiplies run in int64 and
        # overflow; 19 forces hugeint (DECIMAL(38,6)) — Spark caps the
        # 19x19 product at (38,6) identically
        F.expr(f"CAST(ROUND({value_col}, 6) AS DECIMAL(19,6))").alias("v"),
        F.col(tiebreak).alias("tb"),
    ).select(
        "k",
        "v",
        "tb",
        F.unix_micros("t").alias("tus"),
        F.date_trunc("hour", F.col("t")).alias("bucket_ts"),
    )
    w = Window.partitionBy("k", "bucket_ts").orderBy("tus", "tb")
    bucket_end = F.unix_micros(F.col("bucket_ts") + F.expr("INTERVAL 1 HOUR"))
    weighted = t.select(
        "k",
        "bucket_ts",
        "v",
        (
            F.coalesce(F.lead("tus").over(w), bucket_end) - F.col("tus")
        ).cast("decimal(19,0)").alias("wt"),
    )
    # the raw numerator is NOT emitted: an 18-significant-digit decimal
    # converts to double differently across engines (adjacent ULPs) — the
    # driver boundary casts decimals to double, so only the rounded twap
    # and the exactly-double-representable den/n_ticks are output
    return weighted.groupBy("k", "bucket_ts").agg(
        F.sum(F.col("v") * F.col("wt")).cast("decimal(38,6)").alias("__num"),
        F.sum("wt").cast("decimal(18,0)").alias("den"),
        F.count("*").cast("long").alias("n_ticks"),
    ).select(
        F.col("k").alias(key),
        "bucket_ts",
        "den",
        "n_ticks",
        F.expr(
            "CAST(ROUND(CAST(__num AS DOUBLE) / CAST(den AS DOUBLE), 6)"
            " AS DECIMAL(18,6))"
        ).alias("twap"),
    )


def event_transitions(
    df: DataFrame,
    entity: str,
    ts_col: str,
    type_col: str,
    tiebreak: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity ordered
    event streams: for each (prev_type -> event_type) step, the global
    count and the transition probability — the standard behavioral
    input to next-action models and anomaly monitors (an unseen or
    suddenly-frequent transition is the signal).

    The per-entity LAG orders by (ts, tiebreak) — a total order, so the
    step set is deterministic and engine-identical. Probability =
    count / total(prev_type) in the sign-free HALF_UP integer form at
    scale 6 (counts are non-negative, so no sign split needed; a double
    division ties at exact .5e-6 and the engines round ties apart).

    One window pass per entity partition (bounded by any real user's
    event count) and two hash aggregates. Output:
    (prev_type, next_type, n_trans BIGINT, p_next DECIMAL(18,6)).
    """
    w = Window.partitionBy(entity).orderBy(ts_col, tiebreak)
    steps = (
        df.select(
            F.col(type_col).alias("next_type"),
            F.lag(type_col).over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("n_trans").alias("__tot")
    )
    return (
        counts.join(totals, "prev_type")
        .selectExpr(
            "prev_type",
            "next_type",
            "CAST(n_trans AS BIGINT) AS n_trans",
            "CAST(CAST((2 * n_trans * 1000000 + __tot) DIV (2 * __tot)"
            " AS DECIMAL(18,0)) * CAST(0.000001 AS DECIMAL(10,6))"
            " AS DECIMAL(18,6)) AS p_next",
        )
    )


def new_entities_daily(df: DataFrame, entity: str, ts_col: str) -> DataFrame:
    """First-touch growth curve: per calendar day, how many entities
    appeared for the FIRST time, and the running total — the
    new-users/DAU-growth report every events warehouse serves.

    Two reducible aggregates (min-date per entity — map-side combined,
    so an entity with a billion events still reduces through partials —
    then a per-day count), and a running sum over the DAY series. That
    final window is deliberately unpartitioned: its input is one row
    per calendar day (bounded by the calendar, not the corpus), the
    same bounded-frame justification as the percentile carriers.
    Integer counts end-to-end. Output: (day, n_new BIGINT,
    cum_new BIGINT).
    """
    first = df.groupBy(entity).agg(
        F.min(F.to_date(F.col(ts_col))).alias("first_day")
    )
    daily = first.groupBy("first_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("first_day").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_new"),
    )
