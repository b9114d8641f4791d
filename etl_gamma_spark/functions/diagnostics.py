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


def with_observation(df, name: str, exprs: dict):
    """Attach named observation metrics (the df.observe API) to a frame:
    returns (observed_df, Observation). Metrics piggyback on whatever
    action executes the frame — ZERO extra passes, unlike a separate
    .agg() job — which is how a 100 TB pipeline affords per-load metrics.
    ``exprs`` maps metric alias -> Column aggregate.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(a) for a, c in exprs.items()])
    return observed, obs
