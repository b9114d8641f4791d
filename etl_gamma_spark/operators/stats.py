"""Statistical operators: IQR (Tukey-fence) outlier detection and
one-pass column profiling.

Extension surface beyond the reference (which has no statistics beyond
SUM/MIN/MAX — SURVEY §2.5); standard warehouse utilities a pipeline at
scale needs for data validation and anomaly triage.

Scale posture:
  * iqr_outliers — exact interpolated quartiles need a per-group total
    rank, so each group's values pass through one window partition (the
    same rank/interpolate construction as the shared percentile oracle
    body — built-in percentile_cont/quantile interpolate with
    differently-ordered double math across engines, see
    registry._PERCENTILES_BODY). Intended for bounded-cardinality
    groups (event types, months); with millions of values per group,
    switch to approx_percentile and give up bit-parity.
  * profile_table — a single agg pass; the multi-column exact distinct
    counts plan as one Expand (rows x n_cols), the distributed
    equivalent of n parallel scans, with no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tukey_vals_fences(
    df: DataFrame, group: str, value_col: str, tiebreak: str
) -> tuple[DataFrame, DataFrame]:
    """Shared core of iqr_outliers / winsorized_mean: the NULL-free
    (grp, x, tb) values frame and the per-group Tukey fence frame
    (grp, q1, q3, lo_fence, hi_fence) — exact interpolated quartiles,
    every double op in the oracle's order."""
    # NULL values are excluded explicitly: the two engines would otherwise
    # rank them on opposite ends (Spark sorts nulls first ascending,
    # DuckDB last), silently shifting every quantile index
    vals = df.select(
        F.col(group).alias("grp"),
        F.col(value_col).cast("double").alias("x"),
        F.col(tiebreak).alias("tb"),
    ).where(F.col("x").isNotNull())
    order = Window.partitionBy("grp").orderBy("x", "tb")
    part = Window.partitionBy("grp")
    ranked = vals.select(
        "grp",
        "x",
        (F.row_number().over(order) - 1).alias("rn"),
        F.count("*").over(part).alias("n"),
    )
    groups = ranked.select("grp", "n").distinct()
    # explode a 2-element literal array rather than cross-joining a params
    # frame (package invariant: no crossJoin outside similarity.bcast_attach)
    bounds = (
        groups.withColumn("p", F.explode(F.array(F.lit(0.25), F.lit(0.75))))
        .withColumn("lo", F.floor(F.col("p") * (F.col("n") - 1)).cast("long"))
        .withColumn(
            "frac",
            F.col("p") * (F.col("n") - 1) - F.floor(F.col("p") * (F.col("n") - 1)),
        )
    )
    vlo = ranked.select(F.col("grp").alias("g1"), F.col("rn").alias("r1"), F.col("x").alias("xlo"))
    vhi = ranked.select(F.col("grp").alias("g2"), F.col("rn").alias("r2"), F.col("x").alias("xhi"))
    interp = (
        bounds.join(vlo, (F.col("grp") == F.col("g1")) & (F.col("lo") == F.col("r1")))
        .join(
            vhi,
            (F.col("grp") == F.col("g2"))
            & (F.least(F.col("lo") + 1, F.col("n") - 1) == F.col("r2")),
        )
        .select("grp", "p", (F.col("xlo") + F.col("frac") * (F.col("xhi") - F.col("xlo"))).alias("q"))
    )
    fences = (
        interp.groupBy("grp")
        .agg(
            F.max(F.when(F.col("p") == 0.25, F.col("q"))).alias("q1"),
            F.max(F.when(F.col("p") == 0.75, F.col("q"))).alias("q3"),
        )
        .select(
            "grp",
            "q1",
            "q3",
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
        )
    )
    return vals, fences


def iqr_outliers(
    df: DataFrame,
    group: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """Per-group Tukey fences: q1/q3 by exact linear interpolation
    (the numpy/DuckDB 'linear' method), fences at q1 - 1.5*IQR and
    q3 + 1.5*IQR, and per-group outlier counts + a decimal outlier sum.

    Every double operation (p*(n-1), frac interpolation, fence
    arithmetic) is written in the same order as the oracle SQL so the
    results are bit-identical.
    """
    vals, fences = _tukey_vals_fences(df, group, value_col, tiebreak)
    out = (F.col("x") < F.col("lo_fence")) | (F.col("x") > F.col("hi_fence"))
    return (
        vals.join(F.broadcast(fences), "grp")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.max("lo_fence").alias("lo_fence"),
            F.max("hi_fence").alias("hi_fence"),
            # SUM(decimal(18,2)) widens to (28,2) — int128-backed past the
            # driver boundary, which the oracle-parity invariant forbids
            # (wide-decimal → double is not correctly rounded in DuckDB);
            # cast back to the int64-backed width the oracle emits
            F.sum(F.when(out, F.round(F.col("x"), 2).cast("decimal(18,2)")))
            .cast("decimal(18,2)")
            .alias("outlier_sum"),
        )
        .withColumnRenamed("grp", group)
    )


def winsorized_mean(
    df: DataFrame,
    group: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """Per-group winsorized mean: values clamped to the Tukey fences
    (same exact-quartile construction as iqr_outliers) before averaging
    — the robust location estimate a metric pipeline uses when a few
    fat-finger rows would otherwise swing a mean.

    Parity mechanics: the clamp (least/greatest over the fence doubles)
    is text-pinned in the oracle's op order; each clamped value is
    quantized to DECIMAL(18,2) so the SUM is order-independent, and the
    final mean divides by n with the sign-split HALF_UP integer form at
    scale 6 (a double division ties at exact .5e-6 and the engines round
    ties differently). Output: (group, n BIGINT, lo_fence, hi_fence,
    wins_mean DECIMAL(18,6)).
    """
    vals, fences = _tukey_vals_fences(df, group, value_col, tiebreak)
    agg = (
        vals.join(F.broadcast(fences), "grp")
        .selectExpr(
            "grp",
            "lo_fence",
            "hi_fence",
            "CAST(ROUND(least(greatest(x, lo_fence), hi_fence), 2)"
            " AS DECIMAL(18,2)) AS w2",
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("CAST(SUM(w2) AS DECIMAL(18,2))").alias("wsum"),
            F.max("lo_fence").alias("lo_fence"),
            F.max("hi_fence").alias("hi_fence"),
        )
    )
    return (
        agg.selectExpr(
            "grp",
            "n",
            "lo_fence",
            "hi_fence",
            # *10^6 is integer-valued (wsum has scale 2); width 19 forces
            # hugeint on the DuckDB side (int64 decimal multiply overflows).
            # The numerator stays DECIMAL(38,0) (128-bit pair with DuckDB
            # HUGEINT): a BIGINT cast would cap group sums at ~9.2e12 units.
            "CAST(CAST(wsum AS DECIMAL(19,2)) * 1000000 AS DECIMAL(38,0))"
            " AS __u",
        )
        .selectExpr(
            "grp",
            "n",
            "lo_fence",
            "hi_fence",
            "CAST(CAST((CASE WHEN __u < 0 THEN -1 ELSE 1 END)"
            " * CAST((2 * abs(__u) + n) DIV (2 * n) AS BIGINT)"
            " AS DECIMAL(18,0)) * CAST(0.000001 AS DECIMAL(10,6))"
            " AS DECIMAL(18,6)) AS wins_mean",
        )
        .withColumnRenamed("grp", group)
    )


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level profile: row count, null count, exact distinct count,
    min/max (stringified in the column's native ordering, not lexically).
    Returns one row per profiled column:
    (col_name, n_rows, n_null, n_distinct, min_s, max_s).

    One independent single-column aggregate per profiled column, unioned.
    The tempting alternative — one agg carrying every column's metrics
    through an Expand — plans as wide multi-key SortAggregates (string
    min/max buffers are not hash-aggregable), measured 3-4x slower here.
    Per-column branches each scan ONLY their column (columnar pruning:
    N one-column passes read the same bytes as one N-column pass), each
    plans as a narrow two-phase aggregate with map-side partials, and on
    a cluster the branches run as independent parallel stages.

    Callers stringify-sensitive types first (cast DOUBLE money to
    DECIMAL) so engine and oracle render min/max identically.
    """
    if not cols:
        raise ValueError("profile_table: at least one column required")
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_null"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                F.min(c).cast("string").alias("min_s"),
                F.max(c).cast("string").alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-equivalence-class k-anonymity audit over the given
    quasi-identifier columns: each distinct quasi-identifier combination
    with its population and whether it falls below the ``k`` re-
    identification floor (the governance sibling of pii_redact and
    propagate_deletes — release gates run on exactly this report).

    One hash aggregate with map-side combine; NULL quasi-values form
    their own class (they are a linkable signal too). Output:
    (*quasi_cols, group_n, at_risk).
    """
    if not quasi_cols:
        raise ValueError("at least one quasi-identifier column required")
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("group_n")
    ).withColumn("at_risk", (F.col("group_n") < k).cast("int"))


# --- PSI distribution-drift monitor ----------------------------------------
#
# Text-pinned stages shared verbatim with the DuckDB oracle (identical
# text → identical IEEE evaluation order → bit-identical doubles). The
# log uses the engine-portable expansion from operators/retrieval.py
# (native ln differs JVM-vs-glibc in the last ulp on this host):
# 20 nested sqrt + 2-term atanh series, |err| < 1e-8.
# Laplace-smoothed proportions keep empty bins finite:
#   p = (na + 1) / (tot_a + n_bins),  q = (nb + 1) / (tot_b + n_bins)
# x = p / q computed as one division over exact BIGINT cross-products
# (correctly rounded in both engines); each bin's term is quantized to
# DECIMAL(18,9) so any later total is an order-independent decimal sum.

PSI_X_SQL = (
    "((CAST((na + 1) AS DOUBLE) * CAST((tot_b + {n}) AS DOUBLE))"
    " / (CAST((nb + 1) AS DOUBLE) * CAST((tot_a + {n}) AS DOUBLE)))"
)
PSI_PMQ_SQL = (
    "((CAST((na + 1) AS DOUBLE) / CAST((tot_a + {n}) AS DOUBLE))"
    " - (CAST((nb + 1) AS DOUBLE) / CAST((tot_b + {n}) AS DOUBLE)))"
)
PSI_S_SQL = "sqrt(" * 20 + "x" + ")" * 20
PSI_T_SQL = "((s - 1.0) / (s + 1.0))"
PSI_LN9_SQL = (
    "CAST(ROUND((2097152.0 * (t + (((t * t) * t) / 3.0))), 9)"
    " AS DECIMAL(18,9))"
)
PSI_TERM_SQL = "CAST(ROUND(pmq * CAST(ln9 AS DOUBLE), 9) AS DECIMAL(18,9))"


def psi_bin_expr(value_col: str, bin_width: str, n_bins: int) -> str:
    """Fixed-width clamped bin id (bin_width is SQL literal TEXT so both
    engines parse the identical double)."""
    return (
        f"least({n_bins - 1}, greatest(0, "
        f"CAST(floor(CAST({value_col} AS DOUBLE) / {bin_width}) AS INT)))"
    )


def psi_drift(
    base: DataFrame,
    curr: DataFrame,
    value_col: str,
    bin_width: str = "25000.0",
    n_bins: int = 20,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift gate between a training-time baseline
    and a serving/current window (PSI > 0.2 ≈ action threshold; the
    TOTAL is SUM(psi_term) over this per-bin report).

    Two map-side-combined histogram aggregates (n_bins rows each), a
    tiny full-outer bin join, and a 1-row totals broadcast — nothing
    scales with the corpus after the two scans. Output:
    (bin, n_base, n_curr, psi_term DECIMAL(18,9)).
    """
    from .similarity import bcast_attach

    bexpr = psi_bin_expr(value_col, bin_width, n_bins)
    ha = base.selectExpr(f"{bexpr} AS bin").groupBy("bin").agg(
        F.count(F.lit(1)).alias("na")
    )
    hb = curr.selectExpr(f"{bexpr} AS bin").groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb")
    )
    j = (
        ha.join(hb, "bin", "full_outer")
        .selectExpr(
            "bin",
            "CAST(coalesce(na, 0) AS BIGINT) AS na",
            "CAST(coalesce(nb, 0) AS BIGINT) AS nb",
        )
    )
    totals = j.agg(
        F.sum("na").alias("tot_a"), F.sum("nb").alias("tot_b")
    )
    n = str(n_bins)
    return (
        bcast_attach(j, totals, "bin", "tot_a")
        .selectExpr(
            "bin", "na AS n_base", "nb AS n_curr",
            PSI_X_SQL.format(n=n) + " AS x",
            PSI_PMQ_SQL.format(n=n) + " AS pmq",
        )
        .selectExpr("bin", "n_base", "n_curr", "pmq", f"{PSI_S_SQL} AS s")
        .selectExpr("bin", "n_base", "n_curr", "pmq", f"{PSI_T_SQL} AS t")
        .selectExpr("bin", "n_base", "n_curr", "pmq", f"{PSI_LN9_SQL} AS ln9")
        .selectExpr("bin", "n_base", "n_curr", f"{PSI_TERM_SQL} AS psi_term")
    )


# --- exact per-group OLS trend ---------------------------------------------
#
# slope/intercept of the least-squares line y = a + b*x per group, in
# EXACT integer arithmetic end-to-end: y is pre-scaled to cents (BIGINT),
# x is centered on the group minimum (keeps every cross-product narrow),
# and the two divisions use the tie-proof HALF_UP integer form
# (2|a| + b) DIV (2b) on 10^scale-scaled numerators — a double division
# here would hit exact .5 ties (the numerators are rationals over small
# denominators) which Spark and DuckDB round differently. The sign is
# split out first because Spark DIV truncates toward zero while DuckDB
# // floors: they agree only on non-negative operands.


def trend_steps(d: str, scale: int = 6) -> list[list[str]]:
    """The staged SELECT expressions (dialect-paired, shared-verbatim
    with the oracle) that turn the integer sums frame
    (n, sx, sy2, sxx, sxy2 — y in cents, x centered per group) into
    (n_points BIGINT, slope DECIMAL(18,scale), intercept
    DECIMAL(18,scale)). Groups with a single distinct x have a zero
    variance denominator and emit NULL slope/intercept."""
    from ..functions import text as T

    if scale < 2:
        # the intercept path rescales the cents sum by 10^(scale-2);
        # below 2 that floors to 0 and silently zeroes the sy2 term
        raise ValueError("trend_steps: scale must be >= 2")
    p = 10**scale
    unit = f"{10**-scale:.{scale}f}"
    wide_num = T.wint("__num2", d)
    # slope = num2 * 10^scale / (100 * den), HALF_UP on the |.|
    q = T.idiv(
        f"(2 * abs({wide_num} * {p}) + (100 * __den))",
        f"nullif((200 * __den), 0)",
        d,
    )
    a2 = f"({T.wint('sy2', d)} * {p // 100} - {T.wint('__q', d)} * sx)"
    qi = T.idiv("(2 * abs(__a2) + n)", "(2 * n)", d)
    dec = f"CAST({unit} AS DECIMAL(10,{scale}))"
    return [
        [
            "n",
            "sx",
            "sy2",
            "(n * sxx - sx * sx) AS __den",
            "(n * sxy2 - sx * sy2) AS __num2",
        ],
        [
            "n",
            "sx",
            "sy2",
            "((CASE WHEN __num2 < 0 THEN -1 ELSE 1 END)"
            f" * CAST({q} AS BIGINT)) AS __q",
        ],
        [
            "n",
            f"CAST(CAST(__q AS DECIMAL(18,0)) * {dec}"
            f" AS DECIMAL(18,{scale})) AS slope",
            f"{a2} AS __a2",
        ],
        [
            "CAST(n AS BIGINT) AS n_points",
            "slope",
            "CAST(CAST((CASE WHEN __a2 < 0 THEN -1 ELSE 1 END)"
            f" * CAST({qi} AS BIGINT) AS DECIMAL(18,0)) * {dec}"
            f" AS DECIMAL(18,{scale})) AS intercept",
        ],
    ]


def mode_per_group(df: DataFrame, group: str, value_col: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent value, ties broken
    by the smallest value — as a REDUCIBLE two-aggregate plan, never a
    window. Both engines ship a mode() aggregate, but neither specifies
    tie-breaking, so a cross-engine pipeline cannot use them; and the
    window formulation (row_number over count DESC) serializes a hot
    group into one task (the round-5 keep-first lesson). Here
    min(struct(-n, value)) carries one candidate per partition through
    map-side combine, so a group with a billion rows still reduces
    through partials. NULL values count as a value (GROUP BY keeps
    them), but a NULL can never win min(struct) — callers wanting
    NULL-mode semantics should coalesce to a sentinel first; the oracle
    pairs with the ROW_NUMBER spelling, which drops NULL last the same
    way only under that convention, so mode_per_group EXCLUDES NULL
    values explicitly (documented contract).

    Output: (group, mode_value, mode_n BIGINT).
    """
    c = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group), F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        c.groupBy(group)
        .agg(F.min(F.struct((-F.col("__n")).alias("__negn"), F.col("__v"))).alias("__m"))
        .selectExpr(
            group,
            "__m.__v AS mode_value",
            "CAST(-__m.__negn AS BIGINT) AS mode_n",
        )
    )


def fd_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Functional-dependency discovery over a column list — the schema
    profiling step before choosing warehouse keys, partition columns, or
    normalizing a denormalized feed: for every ordered pair (lhs, rhs),
    does lhs determine rhs on this data?

    Per pair: one DISTINCT projection (NULL is a value — GROUP BY
    semantics, identical in both engines, sidestepping the cross-engine
    COUNT(DISTINCT a,b) null-tuple trap), then a per-lhs fanout count and
    a 3-number reduction. ``fd_holds`` = every lhs value maps to exactly
    one rhs value (max_fanout = 1). Like profile_table, the per-pair
    branches are independent pruned two-column scans unioned — columnar
    pruning makes N narrow passes the same bytes as one wide pass, and
    the branches run as parallel stages on a cluster.

    Output: (lhs, rhs, n_lhs BIGINT, n_pairs BIGINT, max_fanout BIGINT,
    fd_holds INT), one row per ordered pair.
    """
    if len(cols) < 2:
        raise ValueError("fd_report: at least two columns required")
    parts = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            d = df.select(F.col(a).alias("__l"), F.col(b).alias("__r")).distinct()
            g = d.groupBy("__l").agg(F.count(F.lit(1)).alias("__fan"))
            parts.append(
                g.agg(
                    F.lit(a).alias("lhs"),
                    F.lit(b).alias("rhs"),
                    F.count(F.lit(1)).cast("long").alias("n_lhs"),
                    F.sum("__fan").cast("long").alias("n_pairs"),
                    F.max("__fan").cast("long").alias("max_fanout"),
                ).selectExpr(
                    "lhs",
                    "rhs",
                    "n_lhs",
                    "n_pairs",
                    "max_fanout",
                    "CAST(CASE WHEN max_fanout = 1 THEN 1 ELSE 0 END AS INT)"
                    " AS fd_holds",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 6,
) -> DataFrame:
    """Per-group exact OLS trend line: slope and intercept of the
    least-squares fit of ``y_col`` (money-like, scale <= 2) against the
    integral ``x_col`` (a month index, day number, version...), both
    HALF_UP-quantized to DECIMAL(18,scale). The intercept is the fitted
    value at the GROUP'S OWN first x (x is centered on the per-group
    minimum so no cross-product leaves int64/int128 range regardless of
    the epoch the caller numbered x from).

    Beyond the reference (SURVEY §2.5 — no regression surface); the
    standard trend/seasonality triage over the monthly rollups the
    reference materializes.

    Scale posture: one tiny per-group MIN aggregate joined back (two
    scans of the input — callers feeding a derived frame should
    materialize it first, same rule as cap_hot_keys), then ONE hash
    aggregate with map-side combine carrying five integer sums; the
    closed-form division work is per-GROUP, not per-row. No windows, so
    a hot group never serializes into one task.
    """
    from ..functions.text import SPARK

    base = df.select(
        *[F.col(c) for c in group_cols],
        F.col(x_col).cast("long").alias("__x"),
        F.expr(
            f"CAST(CAST({y_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("__y2"),
    )
    x0 = base.groupBy(*group_cols).agg(F.min("__x").alias("__x0"))
    sums = (
        base.join(x0, group_cols)
        .select(
            *group_cols,
            (F.col("__x") - F.col("__x0")).alias("__xc"),
            "__y2",
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__xc").alias("sx"),
            F.sum("__y2").alias("sy2"),
            F.sum(F.expr("__xc * __xc")).alias("sxx"),
            F.sum(F.expr("__xc * __y2")).alias("sxy2"),
        )
    )
    out = sums
    for step in trend_steps(SPARK, scale):
        out = out.selectExpr(*group_cols, *step)
    return out
