"""HyperLogLog-style distinct sketch with ORDER-INDEPENDENT, engine-exact
register arithmetic (Flajolet et al. 2007).

Why hand-roll when both engines ship approx_count_distinct: their HLL
implementations (HLL++ in Spark, HLL in DuckDB) hash differently and are
not comparable — and a sketch whose merge is bit-reproducible across
engines is exactly what a 100 TB pipeline wants for cheap cross-system
distinct auditing (partial sketches from any engine merge by register
MAX).

Construction (m = 64 buckets, 60-bit md5 hash, both engines bit-equal):
  bucket  = h % 64                 (low 6 bits)
  rank    = leading-zero count of the remaining 54 bits + 1, via
            length(bin(rest)) — bin() renders without leading zeros in
            both engines; rest = 0 maps to rank 55
  register = MAX(rank) per (group, bucket) — a reducible aggregate:
            only 64 partials per group cross the shuffle, regardless of
            corpus size. No window, no collect.
  t_sum   = SUM(2^-min(register,30)) as DECIMAL(38,30): 2^-r is exactly
            representable in scale-30 decimal for r <= 30, so the sum is
            EXACT and order-independent — the usual double harmonic sum
            would be partition-order dependent. The 30-cap costs nothing:
            registers > 30 occur with probability ~2^-30 per bucket and
            contribute < 1e-9 to the harmonic term.
  estimate = alpha_64 * 64^2 / (t_sum + (64 - observed_buckets)), one
            double division at the end (alpha_64 = 0.709; small-range
            correction omitted — bias, not nondeterminism).
"""

from __future__ import annotations

from decimal import Context, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

M_BUCKETS = 64
REG_CAP = 30
ALPHA_M2 = "0.709 * 4096"  # alpha_64 * m^2, kept as shared expression text

# exact decimal text of 2^-r for r in 1..30; fixed-point format — str()
# would emit E-notation for small values, and quantizing 0.5 to 30 places
# needs a 30-digit coefficient (above the default 28-digit context)
_CTX = Context(prec=60)
POW2NEG: list[tuple[int, str]] = [
    (
        r,
        format(
            (Decimal(1) / (Decimal(2) ** r)).quantize(
                Decimal("1e-30"), context=_CTX
            ),
            "f",
        ),
    )
    for r in range(1, REG_CAP + 1)
]


def pow2neg_values_sql() -> str:
    """VALUES list shared by the oracle: (register, exact 2^-register)."""
    return ", ".join(
        f"({r}, CAST('{w}' AS DECIMAL(38,30)))" for r, w in POW2NEG
    )


def hll_distinct(
    spark: SparkSession, df: DataFrame, group: str, value_col: str
) -> DataFrame:
    """Per-group HLL sketch + estimate + exact distinct for comparison.

    Returns (group, n_buckets, t_sum DECIMAL(38,30), est DECIMAL(18,4),
    exact_distinct BIGINT). t_sum/n_buckets ARE the mergeable sketch;
    est is the standard HLL estimate derived from them.
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(F.col(group).alias("grp"), h.alias("h"))
    coded = hashed.select(
        "grp",
        (F.col("h") % M_BUCKETS).alias("bucket"),
        F.expr(f"h DIV {M_BUCKETS}").alias("rest"),
    ).select(
        "grp",
        "bucket",
        F.least(
            F.when(F.col("rest") == 0, F.lit(55)).otherwise(
                F.lit(55) - F.length(F.bin(F.col("rest")))
            ),
            F.lit(REG_CAP),
        ).alias("reg"),
    )
    registers = coded.groupBy("grp", "bucket").agg(F.max("reg").alias("reg"))
    weights = spark.createDataFrame(
        [(r, Decimal(w)) for r, w in POW2NEG], "reg int, w decimal(38,30)"
    )
    # the full-precision DECIMAL(38,30) register sum stays INTERNAL: a
    # wide decimal converts to double differently across engines (DuckDB's
    # decimal38->float64 is not correctly rounded — diverged at sf0.1 on
    # the exactly-representable 1.5078125). The emitted t_sum is the sum
    # HALF_UP-rounded to scale 12 (int64-backed, correctly-rounded double
    # conversion in both engines), and est derives from the ROUNDED value
    # so the whole output is bit-deterministic; the ~1e-12 estimate
    # perturbation is far below the sketch's own error.
    sk = (
        registers.join(F.broadcast(weights), "reg")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("w").cast("decimal(38,30)").alias("__t"),
        )
        .withColumn("t_sum", F.expr("CAST(ROUND(__t, 12) AS DECIMAL(18,12))"))
    )
    est = F.expr(
        f"CAST(ROUND(({ALPHA_M2}) / (CAST(t_sum AS DOUBLE)"
        f" + CAST({M_BUCKETS} - n_buckets AS DOUBLE)), 4) AS DECIMAL(18,4))"
    ).alias("est")
    exact = df.groupBy(F.col(group).alias("grp")).agg(
        F.countDistinct(value_col).cast("long").alias("exact_distinct")
    )
    return (
        sk.join(exact, "grp")
        .select("grp", "n_buckets", "t_sum", est, "exact_distinct")
        .withColumnRenamed("grp", group)
    )


# --- Count-Min sketch ------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_slice_pairs() -> list:
    """The (d, bucket) struct list over a pre-bound ``__h`` md5 digest
    column — DEPTH disjoint 32-bit slices. Shared by the build and probe
    sides so the hash-slicing scheme cannot drift between them."""
    return [
        F.struct(
            F.lit(d).alias("d"),
            (
                F.conv(F.substring("__h", 1 + 8 * d, 8), 16, 10).cast("long")
                % CMS_WIDTH
            ).alias("bucket"),
        )
        for d in range(CMS_DEPTH)
    ]


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the frequency
    distribution of ``key_col``: DEPTH x WIDTH counters, counter(d, b) =
    number of rows whose d-th hash lands in bucket b.

    Like hll_distinct, the point of hand-rolling is a sketch that is
    bit-reproducible ACROSS engines and mergeable by plain cell-wise SUM
    (counters are integers — order-independent): partial sketches built
    per partition / per day / per engine add up to the corpus sketch.
    Fixed 1024 cells regardless of corpus size: the whole build is one
    hash aggregation with map-side partials, no per-key state.

    Hash family: DEPTH disjoint 32-bit slices of one md5 digest —
    engine-equal (md5 is bit-identical in Spark and DuckDB).
    """
    from ..io import spread

    hashed = spread(df.select(F.col(key_col).cast("string").alias("__k"))).select(
        F.md5("__k").alias("__h")
    )
    return (
        hashed.select(F.explode(F.array(*_cms_slice_pairs())).alias("s"))
        .select("s.d", "s.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("long").alias("counter"))
    )


def cms_heavy_hitters(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Probe the CMS for the exact top-``k`` keys: returns
    (key, exact BIGINT, est BIGINT) with est = min over the DEPTH rows of
    the key's counter — the CMS point query, which can only OVERestimate
    (est >= exact always; the unit test pins the invariant).

    The exact top-k here is the verification baseline; in production the
    sketch answers point queries for keys that were never aggregated
    exactly.
    """
    counters = cms_build(df, key_col)
    exact = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("long").alias("exact")
    )
    topk = (
        exact.orderBy(F.col("exact").desc(), F.col("key"))
        .limit(k)
    )
    # digest bound in its own projection (no CSE for repeated md5), then
    # the same disjoint 32-bit slices as the build side
    probes = (
        topk.select("key", "exact", F.md5("key").alias("__h"))
        .select(
            "key",
            "exact",
            F.explode(F.array(*_cms_slice_pairs())).alias("s"),
        )
        .select("key", "exact", "s.d", "s.bucket")
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("key", "exact")
        .agg(F.min("counter").cast("long").alias("est"))
    )


# --- HDR-style mergeable percentile sketch --------------------------------

HDR_SUB_BITS = 3  # 8 sub-buckets per octave → <= 2^-3 = 12.5% rel. error


def hdr_bucket_exprs(v: str, sub_bits: int = HDR_SUB_BITS, d: str = "spark"):
    """(index_expr, lower_bound_expr_from('__idx')) for the HDR-histogram
    bucketing of a positive BIGINT: exact below 2^(sub_bits+1), then
    ``sub_bits`` mantissa bits per power-of-two octave — every bucket's
    width/value <= 2^-sub_bits. Pure integer bit arithmetic in BOTH
    dialects (floor(log2 v) = length(bin(v)) - 1; bin() renders without
    leading zeros in both engines — same trick as the HLL rank), so
    histograms built by either engine are bit-identical and merge by
    adding counts."""
    s = sub_bits
    shr = (lambda a, b: f"shiftright({a}, {b})") if d == "spark" else (
        lambda a, b: f"({a} >> ({b}))"
    )
    shl = (lambda a, b: f"shiftleft({a}, {b})") if d == "spark" else (
        lambda a, b: f"({a} << ({b}))"
    )
    e = f"(length(bin({v})) - 1)"
    o = f"greatest({e} - {s}, 0)"
    idx = f"({o} * {1 << s} + {shr(v, o)})"
    o_r = f"greatest({shr('__idx', str(s))} - 1, 0)"
    lo = shl(f"(__idx - {o_r} * {1 << s})", o_r)
    return idx, f"CAST({lo} AS BIGINT)"


def hdr_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: tuple[int, ...] = (50, 95, 99),
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Approximate per-group percentiles from a mergeable HDR-style
    histogram — the 100 TB alternative to exact percentiles: exact
    quantiles need a per-group sort (or the rank/interpolate pass the
    registry's ``revenue_percentiles`` shares with its oracle), while
    this collapses ANY number of rows into <= 64·2^sub_bits bucket
    counts via one map-side-combinable aggregate. Partial histograms
    from different partitions, jobs, days, or engines merge by adding
    counts — the same mergeability contract as the HLL/CMS sketches in
    this module, with a deterministic <= 2^-sub_bits relative error
    bound (each reported value is its bucket's exact LOWER bound, so
    results are integers, order-independent and engine-identical; no
    float crosses the driver boundary).

    Contract: positive values only (rows with ``value_col`` < 1 are
    ignored; offset or split by sign upstream for signed data). The
    percentile rank is the ceiling convention: the reported bucket is
    the first whose cumulative count reaches ceil(q·n/100).

    Plan: one hash-agg shuffle builds the histogram; the cumulative
    window runs over <= ~512 bucket rows per group (bounded regardless
    of corpus size — this is NOT a corpus-wide window); one final
    per-group aggregate picks all quantiles in a single pass.
    """
    from pyspark.sql import Window

    idx, lo = hdr_bucket_exprs(value_col, sub_bits)
    hist = (
        df.filter(f"{value_col} >= 1")
        .selectExpr(*group_cols, f"{idx} AS __idx")
        .groupBy(*group_cols, "__idx")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wg = Window.partitionBy(*group_cols)
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("__idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *group_cols,
        "__idx",
        F.sum("__cnt").over(wg).alias("__n"),
        F.sum("__cnt").over(wc).alias("__cum"),
    )
    picks = [
        F.min(
            F.when(
                F.expr(f"__cum >= ({q} * __n + 99) DIV 100"), F.col("__idx")
            )
        ).alias(f"__i{q}")
        for q in quantiles
    ]
    agg = cum.groupBy(*group_cols).agg(
        F.max("__n").cast("bigint").alias("n_values"), *picks
    )
    outs = [
        lo.replace("__idx", f"__i{q}") + f" AS p{q}" for q in quantiles
    ]
    return agg.selectExpr(*group_cols, "n_values", *outs)


def cms_join_size(
    a: DataFrame, key_a: str, b: DataFrame, key_b: str
) -> DataFrame:
    """Pre-execution JOIN CARDINALITY estimate from two Count-Min
    sketches (the Cormode & Muthukrishnan inner-product estimator, the
    sketch a planner consults before picking a join strategy): for each
    hash row d, sum over buckets of counter_a * counter_b; the estimate
    is the MIN over rows, and it can only OVERestimate the true
    |a ⋈ b| = Σ_k n_a(k)·n_b(k) (collisions add, never subtract —
    pinned by the unit test).

    Both sketches are the fixed 4x256 integer arrays (mergeable,
    engine-exact); the estimator is a 1024-cell join — constant cost no
    matter the corpus. The exact size rides along for calibration.
    Output: one row (est_join_rows, exact_join_rows).
    """
    from .similarity import bcast_attach

    ca = cms_build(a, key_a).withColumnRenamed("counter", "ca")
    cb = cms_build(b, key_b).withColumnRenamed("counter", "cb")
    per_d = (
        ca.join(cb, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.expr("ca * cb")).alias("est_d"))
    )
    # a depth whose buckets never collide across sides estimates 0 —
    # re-attach the full depth domain before taking the min
    ds = a.sparkSession.range(CMS_DEPTH).selectExpr("CAST(id AS INT) AS d")
    est = (
        ds.join(per_d, "d", "left")
        .selectExpr("coalesce(est_d, CAST(0 AS BIGINT)) AS est_d")
        .agg(F.min("est_d").cast("long").alias("est_join_rows"))
    )
    na = a.groupBy(F.col(key_a).alias("__k")).agg(F.count(F.lit(1)).alias("na"))
    nb = b.groupBy(F.col(key_b).alias("__k")).agg(F.count(F.lit(1)).alias("nb"))
    exact = (
        na.join(nb, "__k")
        .agg(
            F.coalesce(F.sum(F.expr("na * nb")), F.lit(0))
            .cast("long")
            .alias("exact_join_rows")
        )
    )
    return bcast_attach(est, exact, "est_join_rows", "exact_join_rows").select(
        "est_join_rows", "exact_join_rows"
    )
