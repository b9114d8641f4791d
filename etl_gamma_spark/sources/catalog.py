"""Catalog helpers: create-if-absent + column evolution (reference S6/F14).

The reference probes information_schema and issues ALTER TABLE ADD COLUMN
per missing column (utils/db_schema_main.py:13-78, db_schema_receita.py:
35-246). The Parquet-native equivalents:

  * existence probe → path check / ``spark.catalog.tableExists`` (F14);
  * column evolution → write the widened DataFrame; readers pass
    ``mergeSchema`` so old files surface NULL for new columns — the exact
    observable behavior of ADD COLUMN on historical rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_exists(path: str) -> bool:
    return os.path.exists(path) and any(
        name.endswith(".parquet") or name.startswith("mes=")
        for name in os.listdir(path)
    )


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a table whose files may have heterogeneous (evolved) schemas."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def append_with_evolution(
    spark: SparkSession, df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Append a batch whose schema may be a superset of the table's —
    historical rows read back with NULLs in the new columns."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def missing_columns(spark: SparkSession, df: DataFrame, path: str) -> list[str]:
    """The reference's per-column existence probe, relationally: columns of
    ``df`` that the stored table does not have yet."""
    if not table_exists(path):
        return list(df.columns)
    existing = set(read_evolved(spark, path).columns)
    return [c for c in df.columns if c not in existing]


def conform(df: DataFrame, to_columns: list[str], types: dict[str, str] | None = None) -> DataFrame:
    """Project ``df`` onto a column list, padding absent columns with typed
    NULLs — the write-side half of schema evolution. ``types`` maps padded
    column name -> Spark type string (default "string"); an untyped
    NullType column would be unwritable to parquet."""
    types = types or {}
    cols = [
        F.col(c)
        if c in df.columns
        else F.lit(None).cast(types.get(c, "string")).alias(c)
        for c in to_columns
    ]
    return df.select(*cols)
