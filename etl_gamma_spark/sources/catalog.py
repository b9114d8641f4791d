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


def schema_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Schema drift report between two frames (e.g. yesterday's table and
    today's ingest): one row per differing column with status
    ``only_a`` / ``only_b`` / ``type_changed`` — the structural sibling
    of operators/cdc.py::table_diff's row-level reconciliation. Built as
    a local-relation DataFrame (schemas are driver-side metadata; no job
    runs), so it composes with the rest of a validation pipeline."""
    ta = {f.name: f.dataType.simpleString() for f in a.schema.fields}
    tb = {f.name: f.dataType.simpleString() for f in b.schema.fields}
    rows = []
    for name in sorted(set(ta) | set(tb)):
        if name not in tb:
            rows.append((name, "only_a", ta[name], None))
        elif name not in ta:
            rows.append((name, "only_b", None, tb[name]))
        elif ta[name] != tb[name]:
            rows.append((name, "type_changed", ta[name], tb[name]))
    return a.sparkSession.createDataFrame(
        rows, "column STRING, status STRING, type_a STRING, type_b STRING"
    )
