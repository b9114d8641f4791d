"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4 / the
reference's B-tree output indexes, re-thought for Spark).

The reference indexes its output tables on (mes, farmer_id,
is_current_month) so Postgres can seek. Spark's analogue for *join*
locality is bucketing: ``bucketBy(n, key)`` + ``saveAsTable`` writes files
pre-hash-partitioned on the key, so a later join between two tables
bucketed the same way runs with NO exchange on either side — at 100 TB
this removes the dominant shuffle of fact⋈fact joins (e.g. revenue facts
against snapshot facts on client_id).

Requires a metastore-backed table (saveAsTable), which local Spark
provides via the embedded Derby metastore + spark.sql.warehouse.dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching
    bucket specs Catalyst plans SortMergeJoin with zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
