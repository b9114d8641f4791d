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
