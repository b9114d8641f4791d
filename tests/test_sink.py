"""Sink-layer tests: idempotence + grain uniqueness (SURVEY.md §5.3).

The reference guarantees refresh idempotence operationally via
delete-before-insert and DB UNIQUE constraints; here: run each write scope
twice and assert identical table state, and assert the output grains the
reference declares UNIQUE.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_gamma_spark import asof
from etl_gamma_spark.registry import QUERIES
from etl_gamma_spark.sources.sink import (
    assert_unique_grain,
    overwrite_date_range,
    write_full_refresh,
    write_partition_overwrite,
)
from tests.conftest import SF_SMOKE


def _snapshot(spark, path):
    rows = spark.read.parquet(path).collect()
    return sorted(tuple(str(v) for v in r) for r in rows)


def test_full_refresh_idempotent(spark, tmp_path):
    df = QUERIES["receita_farmer_m_passado"](spark, SF_SMOKE)
    path = str(tmp_path / "t")
    write_full_refresh(df, path, ["mes"])
    first = _snapshot(spark, path)
    write_full_refresh(df, path, ["mes"])
    assert _snapshot(spark, path) == first


def test_partition_overwrite_replaces_only_touched_months(spark, tmp_path):
    df = QUERIES["receita_farmer_m_passado"](spark, SF_SMOKE).cache()
    path = str(tmp_path / "t")
    write_full_refresh(df, path, ["mes"])
    baseline = _snapshot(spark, path)

    # overwrite one month with modified rows → only that month changes
    one_month = df.filter(F.col("mes") == dt.date(2001, 1, 1)).withColumn(
        "receita_bruta", F.lit(0).cast("double")
    )
    write_partition_overwrite(one_month, path, ["mes"])
    after = spark.read.parquet(path)
    changed = after.filter(F.col("mes") == dt.date(2001, 1, 1))
    untouched = after.filter(F.col("mes") != dt.date(2001, 1, 1))
    assert changed.select(F.sum("receita_bruta")).first()[0] == 0
    assert sorted(
        tuple(str(v) for v in r) for r in untouched.collect()
    ) == sorted(t for t in baseline if "2001-01-01" not in t)

    # idempotence: same scoped write twice → same state
    write_partition_overwrite(one_month, path, ["mes"])
    assert _snapshot(spark, path) == _snapshot(spark, path)


def test_overwrite_date_range_idempotent(spark, tmp_path):
    df = QUERIES["receita_cliente"](spark, SF_SMOKE).cache()
    path = str(tmp_path / "t")
    lo, hi = dt.date(2001, 1, 1), dt.date(2001, 6, 30)
    in_range = df.filter(F.col("data_operacao").between(lo, hi))
    write_full_refresh(df, path, ["mes"])
    first = _snapshot(spark, path)
    overwrite_date_range(spark, in_range, path, "data_operacao", lo, hi, ["mes"])
    assert _snapshot(spark, path) == first
    overwrite_date_range(spark, in_range, path, "data_operacao", lo, hi, ["mes"])
    assert _snapshot(spark, path) == first


def test_output_grains_unique(spark):
    # grains per FIXTURES.md §A (reference UNIQUE constraints)
    g = QUERIES["receita_farmer_m_passado"](spark, SF_SMOKE)
    assert_unique_grain(g, ["mes", "fonte", "farmer_id"])
    assert_unique_grain(
        QUERIES["receita_produto_f_m_passado"](spark, SF_SMOKE),
        ["mes", "categoria", "produto", "farmer_id"],
    )
    assert_unique_grain(QUERIES["fechamento_m_presente"](spark, SF_SMOKE), ["mes", "farmer_id"])


def test_unique_grain_raises_on_duplicates(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with pytest.raises(AssertionError, match="grain violation"):
        assert_unique_grain(df, ["k"])


def test_overwrite_date_range_deletes_vanished_partitions(spark, tmp_path):
    # a partition entirely inside the deleted range with NO replacement
    # rows must disappear (regression: dynamic overwrite kept stale files)
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(dt.date(2024, 1, 5), "a"), (dt.date(2024, 2, 5), "b"), (dt.date(2024, 3, 5), "c")],
        "d date, v string",
    ).withColumn("mes", SF.trunc("d", "month"))
    path = str(tmp_path / "t")
    write_full_refresh(df, path, ["mes"])

    empty = df.filter(SF.lit(False))
    overwrite_date_range(spark, empty, path, "d", dt.date(2024, 2, 1), dt.date(2024, 2, 28), ["mes"])
    left = {r.v for r in spark.read.parquet(path).collect()}
    assert left == {"a", "c"}, f"stale partition survived: {left}"


def test_full_refresh_drops_obsolete_partitions(spark, tmp_path):
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(dt.date(2024, 1, 5), "a"), (dt.date(2024, 2, 5), "b")], "d date, v string"
    ).withColumn("mes", SF.trunc("d", "month"))
    path = str(tmp_path / "t")
    write_full_refresh(df, path, ["mes"])
    jan_only = df.filter(SF.col("v") == "a")
    write_full_refresh(jan_only, path, ["mes"])
    assert {r.v for r in spark.read.parquet(path).collect()} == {"a"}


def test_merge_upsert(spark, tmp_path):
    from etl_gamma_spark.sources.sink import merge_upsert

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    merge_upsert(spark, base, path, ["k"])
    upd = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)], "k long, name string, v double")
    merge_upsert(spark, upd, path, ["k"])
    got = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent: same merge twice → same state
    merge_upsert(spark, upd, path, ["k"])
    assert {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()} == got


# --- S1/S5 proven on a REAL JDBC engine: embedded Apache Derby (the JDBC
# database Spark ships for its Hive metastore — no extra driver needed)


def test_jdbc_round_trip_on_embedded_derby(spark, tmp_path):
    """write_url (vectorized batch INSERT) then read_url, plain and as a
    range-partitioned parallel scan: same rows, declared partitioning."""
    import decimal
    import datetime as dt

    from etl_gamma_spark.sources.jdbc import read_url, write_url

    url = f"jdbc:derby:{tmp_path}/wh_db;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [
            (
                i,
                f"client {i}",
                decimal.Decimal(i) / 100,
                float(i) * 0.5,
                dt.date(2024, 1 + i % 12, 1),
            )
            for i in range(200)
        ],
        "id bigint, name string, amount decimal(18,2), score double, d date",
    )
    write_url(df, url, "clients", drv, mode="overwrite")

    back = read_url(spark, url, "clients", drv)
    # the JDBC reader annotates fields with driver metadata (jdbcClientType
    # etc.); the TYPES must survive the round-trip exactly
    assert back.dtypes == df.dtypes
    assert back.exceptAll(df).unionAll(df.exceptAll(back)).count() == 0

    part = read_url(
        spark, url, "clients", drv,
        partition_column="id", num_partitions=4, lower_bound=0, upper_bound=200,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.exceptAll(df).unionAll(df.exceptAll(part)).count() == 0

    # append mode really appends (the S5 batch-insert path, not recreate)
    write_url(df.limit(10), url, "clients", drv, mode="append")
    assert read_url(spark, url, "clients", drv).count() == 210


def test_compact_small_files_reduces_count_and_preserves_rows(spark, tmp_path):
    import os

    from etl_gamma_spark.sources.sink import compact_small_files

    path = str(tmp_path / "frag")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(40).write.parquet(path)

    def parquet_files(p):
        return [
            os.path.join(r, f)
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        ]

    assert len(parquet_files(path)) == 40
    n = compact_small_files(spark, path, target_mb=128)
    assert n == 1
    files = parquet_files(path)
    assert len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id) s").first().s == df.selectExpr("sum(id) s").first().s
    assert not os.path.exists(path + "._compacting")


def test_compact_small_files_partitioned_table(spark, tmp_path):
    import os

    from etl_gamma_spark.sources.sink import compact_small_files

    path = str(tmp_path / "part")
    df = spark.range(5_000).selectExpr("id", "id % 3 AS k")
    df.repartition(20).write.partitionBy("k").parquet(path)
    compact_small_files(spark, path, target_mb=128, partition_by=["k"])
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    assert {r.k for r in back.select("k").distinct().collect()} == {0, 1, 2}
    # partition directories survive the rewrite
    assert sorted(
        d for d in os.listdir(path) if d.startswith("k=")
    ) == ["k=0", "k=1", "k=2"]


def test_write_clustered_files_own_disjoint_key_ranges(spark, tmp_path):
    import os

    from etl_gamma_spark.sources.sink import write_clustered

    path = str(tmp_path / "clustered")
    df = spark.range(100_000).selectExpr("id", "id % 997 AS k")
    write_clustered(df, path, "id", n_files=4)

    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    assert len(files) == 4
    ranges = []
    for f in files:
        r = spark.read.parquet(f).selectExpr(
            "min(id) AS lo", "max(id) AS hi", "count(*) AS n"
        ).first()
        ranges.append((r.lo, r.hi, r.n))
    ranges.sort()
    for (lo1, hi1, _), (lo2, _, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {ranges}"
    # balanced within sampling tolerance
    sizes = [n for _, _, n in ranges]
    assert min(sizes) > 0.5 * max(sizes), sizes
    assert sum(sizes) == 100_000


def test_write_zordered_localizes_both_dimensions(spark, tmp_path):
    # uniform 2-D grid: a z-ordered 16-file layout must bound EVERY
    # file's range in BOTH columns, where the single-key clustered
    # layout leaves the second column's per-file range at the full
    # domain — the property parquet min/max skipping feeds on.
    import os

    from etl_gamma_spark.sources.sink import write_clustered, write_zordered

    df = spark.range(64 * 64).selectExpr(
        "CAST(id % 64 AS LONG) AS a", "CAST(id DIV 64 AS LONG) AS b", "id AS payload"
    )
    zpath = str(tmp_path / "z")
    cpath = str(tmp_path / "c")
    write_zordered(df, zpath, "a", "b", n_files=16, bits=6)
    write_clustered(df, cpath, "a", 16)

    def per_file_ranges(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            pf = spark.read.parquet(os.path.join(path, f))
            row = pf.selectExpr(
                "max(a) - min(a) AS ra", "max(b) - min(b) AS rb"
            ).collect()[0]
            out.append((row.ra, row.rb))
        return out

    zr = per_file_ranges(zpath)
    cr = per_file_ranges(cpath)
    assert len(zr) == 16
    # z-order: every file's rectangle is a fraction of the 0..63 domain
    # in BOTH dimensions (16 files over a 64x64 grid -> 16x16 cells,
    # allow slack for range-partition boundaries)
    assert max(r[0] for r in zr) <= 32 and max(r[1] for r in zr) <= 32, zr
    # single-key clustering: column b per-file range stays ~ the domain
    assert max(r[1] for r in cr) >= 60, cr
