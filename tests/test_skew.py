"""Salted rewrites must be exactly equivalent to their unsalted forms,
including on heavily skewed keys."""

from pyspark.sql import functions as F

from etl_gamma_spark.operators.skew import salted_join, salted_sum_aggregate


def _skewed(spark):
    # key 0 holds 90% of rows
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_aggregate_equivalent(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    }
    salted = {
        (r.k): (r.s, r.n_rows)
        for r in salted_sum_aggregate(df, ["k"], {"v": "s"}, n_salts=16).collect()
    }
    assert plain == salted


def test_salted_join_equivalent(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(100)], "k int, label string"
    )
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k", "label").count()
    a = {(r.k, r.label): r["count"] for r in plain.collect()}
    b = {(r.k, r.label): r["count"] for r in salted.collect()}
    assert a == b


def test_salted_join_rejects_right_outer(spark):
    import pytest

    big = _skewed(spark)
    small = spark.createDataFrame([(1, "x")], "k int, label string")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, "k", how="right")


# --- cap_hot_keys: the shared pair-generator skew guard ---------------------


def test_cap_hot_keys_adversarial_hot_key(spark):
    # one band key holds ~50% of ALL rows (plus a NULL key over-cap too):
    # the guard must drop exactly the over-limit keys and keep the rest
    from etl_gamma_spark.operators.dedup import cap_hot_keys

    n = 40_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .when(F.col("id") % 2000 == 1, F.lit(None))
        .otherwise((F.col("id") % 1000).cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    ).repartition(32)
    capped = cap_hot_keys(df, ["k"], limit=50)
    kept = {r.k for r in capped.select("k").distinct().collect()}
    # fixture arithmetic: even ids (20k rows) → 'HOT' (over cap, dropped);
    # odd ids with id % 2000 == 1 → NULL (20 rows, kept — NULL is a
    # countable key, not a free pass); other odd ids → str(id % 1000),
    # 40 rows per odd residue (kept), except residue '1' which holds only
    # the 20 odd ids with id % 2000 == 1001
    assert "HOT" not in kept
    assert None in kept
    assert "999" in kept and "1" in kept
    assert capped.count() == n - n // 2  # only HOT dropped
    # survivors' per-key counts all within the cap
    over = capped.groupBy("k").count().filter(F.col("count") > 50).count()
    assert over == 0


def test_cap_hot_keys_never_serializes_the_hot_key(spark):
    # scale-posture proof, in two halves matching the implementation:
    # (1) the COUNT pass (_hot_keys, asserted pre-materialization) must
    # show no Window — a window partition cannot be split, so a mega-hot
    # key would land on one task — and a two-phase aggregate
    # (partial_count): only map-side-combined partials (one row per key
    # per input partition) cross its single exchange; (2) the PROBE join
    # consumes the materialized key list as a LeftAnti broadcast with NO
    # exchange anywhere — raw rows are never re-partitioned by the hot
    # key at all. Together: no single task ever receives the hot key's
    # rows, which is what makes the cap safe at 100x scale.
    from etl_gamma_spark.operators.dedup import _hot_keys, cap_hot_keys

    df = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.col("id").cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    ).repartition(8)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    count_plan = _hot_keys(df, ["k"], 10)._jdf.queryExecution().explainString(mode)
    assert "Window" not in count_plan
    assert "partial_count" in count_plan
    assert count_plan.count("hashpartitioning") == 1

    capped = cap_hot_keys(df, ["k"], limit=10)
    plan = capped._jdf.queryExecution().explainString(mode)
    assert "Window" not in plan
    assert "BroadcastHashJoin LeftAnti" in plan
    # probe-side data path has NO key-based exchange; the count pass ran
    # once at materialization and feeds the join as an existing RDD
    assert plan.count("hashpartitioning") == 0
    assert "ExistingRDD" in plan


def test_cap_hot_keys_huge_hot_list_falls_back_to_shuffle(spark):
    # OOM guard: when the over-limit key list exceeds max_broadcast_keys
    # the anti-join must NOT force a broadcast (a duplicate-heavy corpus
    # can hold ~rows/limit hot keys — unbroadcastable at 100 TB); results
    # are identical either way.
    from etl_gamma_spark.operators.dedup import cap_hot_keys

    df = spark.range(2_000).select(
        (F.col("id") % 400).cast("string").alias("k"),
        F.col("id").alias("v"),
    ).repartition(8)
    # every key holds 5 rows; limit 4 → all 400 keys are hot. Forbid
    # auto-broadcast so a BroadcastHashJoin could only come from a forced
    # hint — which is exactly what the size guard must withhold here.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        capped = cap_hot_keys(df, ["k"], limit=4, max_broadcast_keys=100)
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = capped._jdf.queryExecution().explainString(mode)
        assert "BroadcastHashJoin" not in plan
        assert capped.count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # same fixture under the broadcast path agrees
    assert cap_hot_keys(df, ["k"], limit=4).count() == 0
    kept = cap_hot_keys(df, ["k"], limit=5, max_broadcast_keys=100)
    assert kept.count() == 2_000


def test_key_skew_report_integer_shares(spark):
    from etl_gamma_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [("hot",)] * 70 + [("warm",)] * 20 + [("a",), ("b",), ("c",)]
        + [("d",)] * 7,
        "k string",
    )
    rows = {r.key: r for r in key_skew_report(df, "k", top_k=3).collect()}
    assert set(rows) == {"hot", "warm", "d"}  # top-3 by count
    hot = rows["hot"]
    assert hot.rows_total == 100 and hot.n_keys == 6
    assert hot.share_permille == 700
    # 70 rows vs average 100/6: 70*6*100/100 = 420% of average
    assert hot.skew_x_pct == 420
    assert rows["warm"].share_permille == 200
