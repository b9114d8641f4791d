"""JDBC source/sink (reference S1/S5: psycopg2 connection factory +
executemany loads — utils/db_connection.py:18-80).

In production this engine reads the warehouse through Spark's JDBC source
with predicate-pushdown partitioning and writes vectorized batches (no
row-at-a-time executemany). The test container has no Postgres, so the
Postgres wrappers stay gated behind env config — but the underlying
read/write machinery is REAL and proven in-sandbox against embedded
Apache Derby (the JDBC database Spark already ships for its Hive
metastore): tests/test_sink.py round-trips a frame through
``write_url``/``read_url`` including a range-partitioned parallel scan.
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


def read_url(
    spark: SparkSession,
    url: str,
    dbtable: str,
    driver: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Engine-agnostic parallel JDBC scan: with a numeric
    ``partition_column`` Spark issues ``num_partitions`` range-bounded
    queries — the distributed replacement for the reference's
    single-connection pd.read_sql (S1)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    return reader.load()


def write_url(
    df: DataFrame,
    url: str,
    dbtable: str,
    driver: str,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
) -> None:
    """Engine-agnostic vectorized JDBC write (batchsize-batched INSERTs) —
    replaces the reference's iterrows()+executemany row loop (S5)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.mode(mode).save()


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Postgres warehouse scan (reference S1), env-gated: the container has
    no database, so an unconfigured call raises a clear error instead of
    failing deep in py4j."""
    if not cfg.host:
        raise RuntimeError(
            "JDBC source not configured (set DB_HOST/DB_NAME/...); "
            "this container has no database — use the parquet model views"
        )
    return read_url(
        spark,
        cfg.url,
        f"{cfg.schema}.{table}",
        "org.postgresql.Driver",
        user=cfg.user,
        password=cfg.password,
        partition_column=partition_column,
        num_partitions=num_partitions,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
    )


def write_table(df: DataFrame, cfg: JdbcConfig, table: str, mode: str = "append") -> None:
    """Vectorized Postgres write (S5), env-gated like :func:`read_table`."""
    if not cfg.host:
        raise RuntimeError("JDBC sink not configured; use the parquet sinks")
    write_url(
        df,
        cfg.url,
        f"analysis.{table}",
        "org.postgresql.Driver",
        mode=mode,
        user=cfg.user,
        password=cfg.password,
    )
