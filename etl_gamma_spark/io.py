"""Readers for the driver's parquet fixtures (TESTDATA.md).

Parquet single-file tables; Catalyst gives predicate pushdown + column
pruning on these scans for free.  Quirks live in ``_normalize_ts``:

- TIMESTAMP(NANOS) fixtures (older driver builds): Spark rejects them
  natively, so the session sets ``legacy.parquet.nanosAsLong`` and we
  rebuild a microsecond timestamp with *integer* division (ns-since-epoch
  ≈ 1.7e18 > 2^53; float division would corrupt microseconds).
- Untagged timestamp[us] fixtures under Spark 4: inferred as
  TIMESTAMP_NTZ unless ``parquet.inferTimestampNTZ.enabled=false`` (set in
  session.RUNTIME_CONFS). We also cast defensively here in case the conf
  could not be applied to a host-locked session — the session tz is pinned
  UTC, so NTZ→LTZ is value-preserving and matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
)
EXTRA_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTRA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the plan is narrower than the
    session's parallelism.

    Small single-file local reads produce 1-partition frames; every
    downstream join then auto-broadcasts the tiny side and the whole
    pipeline collapses into one single-core task (measured: the scoring
    stage of embedding_neardup_pairs ran 32× under-parallel at sf0.1).
    At cluster scale inputs already carry >= parallelism partitions and
    this returns the frame untouched — no shuffle added.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP (LTZ) regardless of
    how the fixture was written / inferred (see module docstring)."""
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":  # nanos-as-long legacy read
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dtype == "timestamp_ntz":  # Spark 4 NTZ inference; session tz is UTC
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        apply_runtime_confs(spark)  # needs nanosAsLong + NTZ confs live
        return _normalize_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events fixture (shared by all streaming
    modules): declared schema (required for readStream), pathGlobFilter to
    target the single file, and the same ns→µs timestamp rebuild as
    load_table."""
    apply_runtime_confs(spark)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(stream)


def register_base_views(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (same names DuckDB uses)."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
