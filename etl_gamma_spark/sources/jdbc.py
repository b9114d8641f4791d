"""JDBC source/sink (reference S1/S5: psycopg2 connection factory +
executemany loads — utils/db_connection.py:18-80).

In production this engine reads the warehouse through Spark's JDBC source
with predicate-pushdown partitioning and writes vectorized batches (no
row-at-a-time executemany). The test container has no database or JDBC
driver, so everything here is config assembly + a gated reader: calling it
without a reachable driver raises a clear error instead of failing deep in
py4j.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Connection settings, env-resolved like the reference's .env
    (DB_HOST/DB_PORT/DB_NAME/DB_USER/DB_PASSWORD, db_connection.py:26-32)."""

    host: str = ""
    port: int = 5432
    database: str = ""
    user: str = ""
    password: str = ""
    schema: str = "gammadata"  # reference search_path

    @classmethod
    def from_env(cls) -> "JdbcConfig":
        return cls(
            host=os.environ.get("DB_HOST", ""),
            port=int(os.environ.get("DB_PORT", "5432")),
            database=os.environ.get("DB_NAME", ""),
            user=os.environ.get("DB_USER", ""),
            password=os.environ.get("DB_PASSWORD", ""),
            schema=os.environ.get("DB_SCHEMA", "gammadata"),
        )

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Parallel JDBC scan: with a numeric ``partition_column`` Spark issues
    ``num_partitions`` range-bounded queries — the distributed replacement
    for the reference's single-connection pd.read_sql."""
    if not cfg.host:
        raise RuntimeError(
            "JDBC source not configured (set DB_HOST/DB_NAME/...); "
            "this container has no database — use the parquet model views"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", f"{cfg.schema}.{table}")
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", "org.postgresql.Driver")
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    return reader.load()


def write_table(df: DataFrame, cfg: JdbcConfig, table: str, mode: str = "append") -> None:
    """Vectorized JDBC write (batchsize-batched INSERTs) — replaces the
    reference's iterrows()+executemany row loop (S5)."""
    if not cfg.host:
        raise RuntimeError("JDBC sink not configured; use the parquet sinks")
    (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", f"analysis.{table}")
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", "org.postgresql.Driver")
        .option("batchsize", "10000")
        .mode(mode)
        .save()
    )
