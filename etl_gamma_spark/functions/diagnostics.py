"""Engine diagnostics (reference S7: pool.py:8-26 queries
pg_stat_activity for connection states; the Spark equivalent is the
status tracker / Spark UI)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def active_jobs(spark: SparkSession) -> DataFrame:
    """Snapshot of active job/stage counts — the moral equivalent of the
    reference's connection-state rollup, as a DataFrame."""
    tracker = spark.sparkContext.statusTracker()
    rows = [
        (
            int(jid),
            len(tracker.getActiveStageIds()),
            spark.sparkContext.defaultParallelism,
        )
        for jid in tracker.getActiveJobsIds()
    ] or [(-1, len(tracker.getActiveStageIds()), spark.sparkContext.defaultParallelism)]
    return spark.createDataFrame(
        rows, "job_id int, active_stages int, default_parallelism int"
    )
