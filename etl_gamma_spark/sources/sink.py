"""Idempotent sink layer — the reference's scoped delete-then-insert
(SURVEY.md §2.1 S4) re-expressed as Parquet partition-aware writes.

The reference refreshes output tables with four delete-scopes before a
row-at-a-time executemany INSERT:
  (a) whole table            — kpi_receita_farmer_m_passado/load.py:43-54
  (b) by farmer_id           — same file (param variant)
  (c) by date range          — kpi_receita_cliente/load.py:53-74
  (d) by month + is_current_month flag
                             — kpi_fechamento_m_presente/load.py:49-72

Spark-first: outputs are Parquet tables partitioned by a scope column
(typically ``mes``); with ``spark.sql.sources.partitionOverwriteMode=
dynamic`` a ``mode("overwrite")`` write replaces exactly the partitions
present in the incoming DataFrame — the moral equivalent of
delete-where + insert, atomic per partition, vectorized, and at 100 TB it
rewrites only the touched months instead of the table. Scopes that are
not partition-aligned (arbitrary date ranges) fall back to
read-filter-union-rewrite of only the overlapping partitions.

Grain-uniqueness (the DB UNIQUE constraints, db_schema_receita.py:60) is
enforced by :func:`assert_unique_grain` in tests instead of by the store.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs


def write_full_refresh(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Scope (a): replace the whole table."""
    # per-write STATIC override: under the session-level dynamic mode a
    # full refresh would silently keep partitions absent from ``df``
    w = df.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_partition_overwrite(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Scopes (b)/(d): replace exactly the partitions present in ``df``
    (dynamic partition overwrite — delete-by-scope + insert in one atomic
    write per partition)."""
    apply_runtime_confs(df.sparkSession)
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def overwrite_date_range(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    date_col: str,
    start: dt.date,
    end: dt.date,
    partition_by: list[str] | None = None,
) -> None:
    """Scope (c): delete rows in [start, end] then insert ``df``.

    If the table doesn't exist yet this is a plain write. Otherwise keep
    the rows *outside* the range and union the new data — expressed so the
    scan of the old table prunes to the overlapping partitions when
    ``date_col`` (or a prefix of it) is the partition key.
    """
    if not os.path.exists(path):
        write_full_refresh(df, path, partition_by)
        return
    existing = spark.read.parquet(path)
    keep = existing.filter(
        (F.col(date_col) < F.lit(start)) | (F.col(date_col) > F.lit(end))
    )
    merged = keep.unionByName(df.select(*existing.columns))
    # write to a temp dir then swap: Spark cannot overwrite a path it is
    # concurrently reading in local mode. Both writes are STATIC overwrite:
    # under the session-level dynamic mode, a partition fully inside the
    # deleted range (no surviving rows in ``merged``) would otherwise never
    # be rewritten and its stale files would survive the refresh.
    tmp = path.rstrip("/") + "._staging"
    w = merged.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    final = spark.read.parquet(tmp)
    wf = final.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        wf = wf.partitionBy(*partition_by)
    wf.parquet(path)
    # best-effort cleanup of the staging dir
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def assert_unique_grain(df: DataFrame, keys: list[str]) -> None:
    """Replacement for the reference's DB UNIQUE constraints: raises if any
    grain key combination appears more than once."""
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1)
    n = dup.count()
    if n:
        sample = [r.asDict() for r in dup.limit(5).collect()]
        raise AssertionError(f"grain violation on {keys}: {n} duplicate groups, e.g. {sample}")


def stamp_audit(df: DataFrame, as_of: str | None = None) -> DataFrame:
    """Audit timestamps (reference F16: per-row datetime.now() in pandas,
    kpi_receita_cliente/transform.py:125) as plan-time current_timestamp —
    one value per write, vectorized.

    ``as_of`` (``'YYYY-MM-DD HH:MM:SS'``) pins the stamp explicitly —
    the repo-wide asof rule applied to the audit column: a pinned stamp
    is deterministic, so the write path becomes oracle-checkable
    (sink_audit_stamps carrier) and reruns of a failed batch stamp the
    batch's logical time, not the retry's wall-clock. Default stays the
    reference's now() semantics."""
    ts = (
        F.current_timestamp()
        if as_of is None
        else F.lit(as_of).cast("timestamp")
    )
    return df.withColumn("updated_at", ts)


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """MERGE-style upsert without Delta (SURVEY §4: "MERGE-style idempotent
    sink ... implemented as partition-overwrite"): rows in ``updates``
    replace existing rows with the same key; all other existing rows are
    kept (anti-join + union, the stock emulation when the table format has
    no transactional MERGE).

    The rewrite is staged then swapped (same pattern as
    overwrite_date_range); at scale, partition columns in ``keys``' prefix
    confine the anti-join scan to affected partitions.
    """
    if not os.path.exists(path):
        write_full_refresh(updates, path, partition_by)
        return
    existing = spark.read.parquet(path)
    keep = existing.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = keep.unionByName(updates.select(*existing.columns))
    tmp = path.rstrip("/") + "._staging"
    w = merged.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    final = spark.read.parquet(tmp)
    wf = final.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        wf = wf.partitionBy(*partition_by)
    wf.parquet(path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    partition_by: list[str] | None = None,
) -> int:
    """Bin-pack a table's files toward ``target_mb`` each — the periodic
    maintenance job every long-lived 100 TB table needs (streaming sinks
    and per-partition overwrites accrete small files; small files mean
    per-file open/footer overhead and task-scheduling floors on every
    downstream scan).

    Uses ``repartition`` (round-robin, even output sizes), not
    ``coalesce``: coalesce merges co-located partitions without a shuffle
    but inherits their skew, so one output file can end up with most of
    the bytes. The compacted content is byte-equivalent to the original,
    so the swap is a filesystem DIRECTORY RENAME — the table is written
    once (merge_upsert must re-write because its content changes), and
    the reader-visible gap is the remove+rename instant, not a full
    rewrite. On an object store or with concurrent readers, do the swap
    through a table format's metadata commit instead. Returns the target
    file count.

    With ``partition_by``, files are packed WITHIN each partition
    directory (repartition by the partition columns + a bucket spreader
    would be the per-partition refinement; at this layer we keep the
    table-wide count, letting the partition writer split by directory).
    """
    total_bytes = 0
    for root, _, files in os.walk(path):
        total_bytes += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path).repartition(n_files)
    tmp = path.rstrip("/") + "._compacting"
    w = df.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    swap_directory(tmp, path)
    return n_files


def swap_directory(tmp: str, path: str) -> None:
    """Replace directory ``path`` with ``tmp`` via RENAMES, never
    delete-then-rename: rmtree-then-rename leaves a crash window as long
    as the delete in which the table is simply GONE (and a foreachBatch
    checkpoint may already have marked the producing batch committed).
    Here the old copy is renamed aside first — the no-table window is the
    instant between two renames, a crash leaves the data recoverable at
    ``<path>._replaced``, and a failed swap rolls the old copy back."""
    import shutil

    old = path.rstrip("/") + "._replaced"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)
        raise
    shutil.rmtree(old)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    partition_by: list[str] | None = None,
) -> None:
    """Write a table CLUSTERED on ``cluster_col``: range-repartition so
    each output file owns a disjoint key range, then sort within files —
    the layout that makes engines skip data on range/point predicates
    (parquet row-group min/max stats line up with the filter; with a
    manifest-bearing format the same layout is what Z-ORDER degenerates
    to for a single key). At 100 TB this is the difference between a
    key-range query scanning one file and scanning the table.

    ``repartitionByRange`` samples the key distribution, so files are
    balanced under skew (a hash bucketing would be balanced too but
    destroys range locality; ``coalesce`` keeps neither).
    """
    out = df.repartitionByRange(n_files, F.col(cluster_col)).sortWithinPartitions(
        cluster_col
    )
    w = out.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def zorder_value(c1, c2, bits: int = 16):
    """Morton/Z-order value of two non-negative integer columns:
    interleave the low ``bits`` bits of each (c1 on odd positions, c2 on
    even). Built as a FLAT chain of shift/mask/or expressions — no
    higher-order lambdas, so whole-stage codegen applies (CLAUDE.md:
    interpreted lambdas are the slow path).

    Columns wider than ``bits`` bits must be quantized by the caller
    first (rank/bucket them); interleaving truncated values would
    scramble locality for the high end of the domain.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1))
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(b1, 2 * i + 1)).bitwiseOR(
            F.shiftleft(b2, 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write the table Z-ORDERED on two columns: range-repartition on the
    Morton interleave of (col1, col2) and sort within files by it, so
    every output file covers a LOCALIZED rectangle of the 2-D key space
    — parquet min/max stats then prune scans filtered on EITHER column,
    where a single-key sort (write_clustered) leaves the second column's
    per-file range at the full domain. The multi-dimensional data-skipping
    layout Delta/Iceberg OPTIMIZE ZORDER produces, built from plain
    Spark primitives.
    """
    z = zorder_value(F.col(col1), F.col(col2), bits).alias("__z")
    out = (
        df.select("*", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).parquet(path)


def _discover_partition_cols(path: str) -> list[str]:
    """Infer a parquet table's Hive-style partition columns from its
    directory layout: descend the first ``name=value`` subdirectory at
    each level, collecting the column names in order. Matches what
    Spark's own partition discovery infers on read, without needing the
    caller to carry a spec."""
    cols: list[str] = []
    cur = path
    while os.path.isdir(cur):
        subs = sorted(
            d for d in os.listdir(cur)
            if "=" in d and not d.startswith((".", "_"))
            and os.path.isdir(os.path.join(cur, d))
        )
        if not subs:
            break
        name = subs[0].split("=", 1)[0]
        cols.append(name)
        cur = os.path.join(cur, subs[0])
    return cols


def propagate_deletes(
    spark,
    tables: dict[str, str],
    keys: DataFrame,
    key_col: str = "key",
) -> dict[str, tuple[int, int]]:
    """Right-to-be-forgotten propagation: remove every row matching the
    deletion key set from each table of a warehouse, atomically per
    table. ``tables`` maps a table path to ITS key column name; ``keys``
    is a one-column DataFrame (``key_col``) of values to erase.

    Per table: read → broadcast left-anti join on the deletion keys
    (erasure lists are small — thousands of subjects against billions of
    rows; the fact side never shuffles) → rewrite via the rename-aside
    ``swap_directory`` (a crash mid-swap leaves the OLD table intact or
    recoverable — for deletions specifically, a lost table would be a
    far worse incident than a retried erasure). Returns
    {path: (rows_before, rows_after)} as the audit record the request
    needs.

    At 100 TB the rewrite cost is bounded by partition pruning upstream:
    pass pre-filtered table paths (e.g. only the affected months) rather
    than whole-history roots when the erasure scope is known.

    Partitioned tables keep their layout: the on-disk ``col=value``
    directory chain is discovered per table and carried into the
    rewrite's ``partitionBy`` — a flat rewrite would silently destroy
    partition pruning (and break the next partition-overwrite write)
    on every table the warehouse lays out by month/key.
    """
    out: dict[str, tuple[int, int]] = {}
    key_set = F.broadcast(keys.select(key_col).distinct())
    for path, col in tables.items():
        part_cols = _discover_partition_cols(path)
        df = spark.read.parquet(path)
        kept = df.join(
            key_set, df.__getattr__(col) == key_set.__getattr__(key_col), "left_anti"
        )
        before = df.count()
        tmp = path.rstrip("/") + "._pending"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        w = kept.write.mode("overwrite").option("partitionOverwriteMode", "static")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(tmp)
        swap_directory(tmp, path)
        after = spark.read.parquet(path).count()
        out[path] = (before, after)
    return out


def write_versioned(
    df: DataFrame, root: str, partition_by: list[str] | None = None
) -> int:
    """Poor-man's time travel without a table format: each write lands in
    ``root/v=N`` (monotonic), and ``root/_latest`` is swapped to N only
    AFTER the data write completes — readers either see the previous
    complete version or the new complete version, never a partial one.
    Returns N. Old versions stay until ``expire_versions`` prunes them:
    reproducibility (re-run yesterday's job against yesterday's corpus
    exactly) is the point of keeping them."""
    os.makedirs(root, exist_ok=True)
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    n = max(versions, default=0) + 1
    target = os.path.join(root, f"v={n}")
    w = df.write.mode("overwrite").option("partitionOverwriteMode", "static")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    # pointer swap: write-new-then-rename is atomic on POSIX
    tmp = os.path.join(root, "_latest.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(n))
    os.replace(tmp, os.path.join(root, "_latest"))
    return n


def read_version(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a specific version, or the committed latest (``_latest``
    pointer — NOT max(v=): a crashed write may have left a newer data
    dir whose pointer swap never happened; it must stay invisible)."""
    if version is None:
        with open(os.path.join(root, "_latest"), encoding="utf-8") as fh:
            version = int(fh.read().strip())
    return spark.read.parquet(os.path.join(root, f"v={version}"))


def expire_versions(root: str, keep: int = 3) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the committed
    latest). Returns the expired version numbers."""
    import shutil

    with open(os.path.join(root, "_latest"), encoding="utf-8") as fh:
        latest = int(fh.read().strip())
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    doomed = [v for v in versions[:-keep] if v != latest] if keep else [
        v for v in versions if v != latest
    ]
    for v in doomed:
        shutil.rmtree(os.path.join(root, f"v={v}"))
    return doomed
