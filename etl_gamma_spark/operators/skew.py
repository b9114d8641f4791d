"""Skew-handling helpers: salted two-stage aggregation and salted
broadcast-replicated joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these explicit forms are for the cases AQE can't re-plan:

  * a groupBy where one key holds a large share of all rows (the partial
    aggregate helps, but the final reducer for the hot key still receives
    one partition's worth of partials — salting spreads the *final* stage);
  * a shuffle join against a small-but-not-tiny dimension where one fact
    key is hot: replicate the dimension ``n_salts`` times and scatter the
    fact side across the replicas.

Both are pure DataFrame rewrites (deterministic given the input), verified
equivalent to their unsalted forms in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_sum_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum(col) as alias, ..., count(*) as n_rows) in two
    salted stages: stage 1 aggregates (keys, salt) — spreading a hot key
    over ``n_salts`` reducers — stage 2 re-aggregates the ``n_salts``
    partials per key. Sums/counts are algebraic so the rewrite is exact.

    ``sums`` maps source column -> output alias.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1 = (
        df.withColumn(SALT, salt)
        .groupBy(*keys, SALT)
        .agg(
            *[F.sum(src).alias(alias) for src, alias in sums.items()],
            F.count("*").alias("n_rows"),
        )
    )
    return stage1.groupBy(*keys).agg(
        *[F.sum(alias).alias(alias) for alias in sums.values()],
        F.sum("n_rows").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot values of ``on``: replicate ``small``
    ``n_salts`` times (explode over the salt range) and scatter ``big``
    rows uniformly across replicas, so the hot key's rows land on
    ``n_salts`` different reducers instead of one.

    Result has big's columns + small's non-key columns (like a plain
    ``big.join(small, on, how)``). Only big-side-preserving join types are
    supported: for right/full outer joins every unmatched small-side
    replica would null-extend, duplicating those rows n_salts times.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}"
        )
    big_salted = big.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_rep = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT, F.col(SALT).cast("long"))
    return big_salted.join(small_rep, [on, SALT], how).drop(SALT)


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Pre-join key-skew diagnostic: the measurement behind every
    salting / AQE-skew-join decision. For the ``top_k`` hottest values of
    ``key_col``: group size, HALF_UP permille share of all rows, and a
    skew factor (how many times the average group size, as HALF_UP
    percent — 100 = exactly average).

    One map-side-combined histogram aggregate, a TakeOrdered top-k (never
    a global sort), and a 1-row totals broadcast; integer arithmetic
    throughout, so the report is engine-exact. Output:
    (key, n, share_permille, skew_x_pct, rows_total, n_keys).
    """
    from .similarity import bcast_attach

    h = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = h.agg(
        F.sum("n").alias("rows_total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = h.orderBy(F.desc("n"), F.col("key")).limit(top_k)
    return bcast_attach(top, tot, "key", "rows_total").selectExpr(
        "key",
        "n",
        "CAST(((2000 * n + rows_total) DIV (2 * rows_total)) AS BIGINT)"
        " AS share_permille",
        # n * n_keys can pass int64 in the large-corpus regime this
        # diagnostic targets (1e10 rows over 1e7 keys) — widen through the
        # 128-bit pair (DECIMAL(38,0) / HUGEINT) before the DIV
        "CAST(((200 * CAST(n AS DECIMAL(38,0)) * n_keys + rows_total)"
        " DIV (2 * rows_total)) AS BIGINT) AS skew_x_pct",
        "rows_total",
        "n_keys",
    )
