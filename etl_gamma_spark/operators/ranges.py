"""Binned range join: point-in-interval equi-join without an equi key.

Open-source Spark has no range-join optimizer — a plain
``points.join(intervals, point BETWEEN lo AND hi)`` plans as a
BroadcastNestedLoopJoin (small build side) or a cartesian product (two
big sides), both O(|points| x |intervals|) and both codegen killers.
The standard scalable rewrite (used by Databricks' range-join hint and
interval-join engines like Flink's) is *binning*: quantize the domain
into fixed-width bins, explode each interval over the bins it touches,
tag each point with its single containing bin, equi-join on the bin id,
and re-check the exact predicate as a residual filter.

Cost model: each point probes exactly one bin; an interval of width W
replicates ceil(W / bin_width) + 1 times. Choose ``bin_width`` near the
median interval width so replication stays O(1) per interval; then the
join is one shuffle-hash/broadcast-hash exchange on a well-distributed
integer key and survives a 100x scale-up on either side. A degenerate
giant interval (covering the whole domain) replicates into every bin —
same row count as the points side at worst, and AQE's skew split
handles a bin that ends up hot.

The pair appears exactly once per (point, interval) match because a
point lives in exactly one bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BIN = "__bin"


def range_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point <= hi`` (closed on both ends), via bin-exploded
    equi-join instead of a nested-loop plan.

    NULL points / NULL bounds never match (BETWEEN with NULL is not
    true), matching the semantics of the naive predicate join.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"range_bin_join supports inner/left_semi, not {how!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    for c in (BIN,):
        if c in points.columns or c in intervals.columns:
            raise ValueError(f"inputs must not carry a {c!r} column")
    if point_col in (lo_col, hi_col):
        raise ValueError(
            f"point column {point_col!r} collides with an interval bound name; "
            "alias one side before joining"
        )
    binned_pts = points.withColumn(BIN, F.floor(F.col(point_col) / F.lit(bin_width)))
    exploded = intervals.where(F.col(lo_col) <= F.col(hi_col)).withColumn(
        BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)),
                F.floor(F.col(hi_col) / F.lit(bin_width)),
            )
        ),
    )
    # residual inside the join condition (not a post-filter) so semi joins
    # keep only points that pass the exact predicate, not just the bin probe
    cond = (binned_pts[BIN] == exploded[BIN]) & F.col(point_col).between(
        F.col(lo_col), F.col(hi_col)
    )
    if how == "left_semi":
        return binned_pts.join(exploded, cond, "left_semi").drop(BIN)
    # drop(BIN) removes both sides' bin columns (drop-by-name is all-matches)
    return binned_pts.join(exploded, cond, "inner").drop(BIN)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval x interval overlap join (closed intervals,
    ``l_lo <= r_hi AND r_lo <= l_hi``) — the two-sided sibling of
    range_bin_join, again as a bin-exploded equi-join instead of a
    nested-loop plan.

    Two overlapping intervals share EVERY bin their overlap region
    touches, so a plain bin join would emit duplicate pairs. Instead of
    a distinct (an extra full-pair shuffle), each pair is emitted only
    from the FIRST bin of its overlap region —
    ``bin == floor(greatest(l_lo, r_lo) / bin_width)`` — which exists
    and is unique for every overlapping pair: a duplicate-free join
    with zero post-processing.

    Interval replication is ceil(width / bin_width) + 1 per row; pick
    ``bin_width`` near the median interval width. Inputs must not carry
    a __bin column; inverted intervals (lo > hi) never match.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    for side in (left, right):
        if BIN in side.columns:
            raise ValueError(f"inputs must not carry a {BIN!r} column")
    # bound columns resolve by bare name across the join, so the two
    # sides' bound names must not collide — fail with a usable message
    # instead of Spark's AMBIGUOUS_REFERENCE at analysis time
    clash = {l_lo, l_hi} & {r_lo, r_hi}
    if clash:
        raise ValueError(
            f"left and right bound column names collide: {sorted(clash)}; "
            "alias one side's lo/hi before joining"
        )
    lb = left.where(F.col(l_lo) <= F.col(l_hi)).withColumn(
        BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(l_lo) / F.lit(bin_width)),
                F.floor(F.col(l_hi) / F.lit(bin_width)),
            )
        ),
    )
    rb = right.where(F.col(r_lo) <= F.col(r_hi)).withColumn(
        BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(r_lo) / F.lit(bin_width)),
                F.floor(F.col(r_hi) / F.lit(bin_width)),
            )
        ),
    )
    cond = (
        (lb[BIN] == rb[BIN])
        & (F.col(l_lo) <= F.col(r_hi))
        & (F.col(r_lo) <= F.col(l_hi))
        & (
            lb[BIN]
            == F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / F.lit(bin_width))
        )
    )
    return lb.join(rb, cond, "inner").drop(BIN)


def interval_coalesce(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
    tiebreaks: list[str],
) -> DataFrame:
    """Merge overlapping/touching CLOSED intervals per key (the classic
    gaps-and-islands coalesce) and report per-key coverage:
    (key, n_intervals BIGINT, n_islands BIGINT, covered_days BIGINT).

    An interval opens a new island when its start lies strictly after
    the running maximum end of everything before it in (start, end,
    *tiebreaks) order — a total order, so island ids are deterministic
    and engine-identical. Touching intervals ([1,5],[5,9]) merge
    (closed-interval semantics, like responsibility periods' day grain).
    Inverted rows (end < start) are dropped.

    Scale posture: one window partition per key (the same
    bounded-cardinality contract as iqr_outliers — suppliers, farmers,
    event types; not user-ids on a social graph), then two reducible
    aggregates. Date arithmetic only — integers end-to-end, nothing to
    quantize.
    """
    order = [F.col(start_col), F.col(end_col)] + [F.col(t) for t in tiebreaks]
    w = Window.partitionBy(key).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        df.where(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "__new",
            F.when(
                prev_max_end.isNull()
                | (F.col(start_col) > prev_max_end),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    islands = marked.groupBy(key, "__island").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(start_col).alias("__s"),
        F.max(end_col).alias("__e"),
    )
    return islands.groupBy(key).agg(
        F.sum("__n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.datediff(F.col("__e"), F.col("__s")) + 1)
        .cast("long")
        .alias("covered_days"),
    )
