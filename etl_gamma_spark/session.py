"""SparkSession factory.

Local-mode defaults sized for the test container (local[N], one JVM), but
every conf here is cluster-safe: AQE for runtime re-planning (partition
coalescing, broadcast conversion, skew-join splitting), shuffle partitions
sized to cores locally (override on a real cluster), UTC session timezone
so timestamp semantics match the DuckDB oracle, and Arrow enabled for the
Pandas-UDF paths.

Replaces the reference's psycopg2 connection factory
(`utils/db_connection.py:18-58` in /root/reference) — there is no
connection pool to manage; the session owns all IO.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied defensively to *any* session we are
# handed (the verify driver creates its own session; these must not be
# build-time-only).  nanosAsLong: the driver's events.parquet stores
# TIMESTAMP(NANOS) which Spark cannot read natively — read as long and
# convert (io.load_events).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # ~cores, not 200: local-mode shuffles are driver-disk bound, and AQE
    # cannot coalesce partitions for streaming queries
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Spark 4 infers untagged parquet timestamp[us/ms] columns as
    # TIMESTAMP_NTZ by default; NTZ breaks withWatermark/unix_micros
    # downstream and diverges from the DuckDB oracle (which reads them as
    # plain timestamps under the UTC session tz). Read them as LTZ.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # dynamic partition overwrite == the reference's scoped delete-then-
    # insert sinks (SURVEY.md §2.1 S4) without rewriting the whole table
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # align Spark's whole-stage-codegen bailout with HotSpot's
    # DontCompileHugeMethods threshold (8000 bytecode bytes): a fused
    # method above it never JITs and runs ~2.5x slower than the Volcano
    # path Spark falls back to. Measured on the unrolled-dot scoring
    # stage of embedding_neardup_pairs: 10.4 s -> 4.8 s at sf0.1,
    # identical output.
    "spark.sql.codegen.hugeMethodLimit": "8000",
    # InferFiltersFromGenerate synthesizes `size(gen_child) > 0 AND
    # isnotnull(gen_child)` below explode()s and pushes it past the
    # projections, INLINING the generator child — for the shingle
    # pipelines that re-evaluates the whole transform() with split()
    # expanded per element_at (5x per shingle), doubling-plus the row
    # work. explode() already emits nothing for empty/null arrays, so
    # the inferred filter is redundant; excluding the rule cut
    # ngram_jaccard_pairs 6.1 -> 2.9 s warm at sf0.1, identical output.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Best-effort apply of runtime confs to an externally created session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    return spark


def get_spark(app_name: str = "etl-gamma-spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ~cores, not the 200 default: local shuffles are driver-disk bound
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # keep saveAsTable outputs (bucketed tables) out of the repo cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/etl_gamma_spark_warehouse"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
