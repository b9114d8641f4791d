"""Unit tests for the round-5 batch-4 operators: binned range join,
IQR outliers, one-pass profiling, HLL sketch, deletion-neighborhood
fuzzy pairs, integer-exact PageRank."""

import numpy as np
import pytest

from etl_gamma_spark.operators.fuzzy import edit_distance_pairs
from etl_gamma_spark.operators.graph import pagerank
from etl_gamma_spark.operators.ranges import range_bin_join
from etl_gamma_spark.operators.sketch import hll_distinct
from etl_gamma_spark.operators.stats import iqr_outliers, profile_table


# --- range_bin_join --------------------------------------------------------


def _tiers(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 15.0), ("bad", 9.0, 2.0)],
        "tier string, lo double, hi double",
    )


def test_range_bin_join_semantics(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0), (4, 12.0), (5, 99.0), (6, None)],
        "id long, v double",
    )
    got = {
        (r.id, r.tier)
        for r in range_bin_join(pts, _tiers(spark), "v", "lo", "hi", 4.0).collect()
    }
    # closed bounds on both ends; overlap gives multiplicity; inverted
    # interval and NULL point never match
    assert got == {
        (1, "a"),
        (2, "a"),
        (2, "b"),
        (3, "a"),
        (3, "b"),
        (4, "b"),
    }


def test_range_bin_join_semi_applies_residual(spark):
    pts = spark.createDataFrame([(1, 7.0), (2, 20.0)], "id long, v double")
    # id=2 shares a bin with interval b under a huge bin width but fails
    # the exact predicate — a semi join must not resurrect it
    got = {
        r.id
        for r in range_bin_join(
            pts, _tiers(spark), "v", "lo", "hi", 100.0, how="left_semi"
        ).collect()
    }
    assert got == {1}


def test_range_bin_join_no_duplicate_pairs_across_bins(spark):
    pts = spark.createDataFrame([(1, 5.0)], "id long, v double")
    wide = spark.createDataFrame([("w", 0.0, 1000.0)], "tier string, lo double, hi double")
    rows = range_bin_join(pts, wide, "v", "lo", "hi", 1.0).collect()
    assert len(rows) == 1  # interval exploded over 1001 bins, matched once


# --- iqr_outliers ----------------------------------------------------------


def test_iqr_outliers_matches_numpy(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, x double"
    )
    [row] = iqr_outliers(df, "g", "x", "id").collect()
    q1, q3 = np.quantile(vals, [0.25, 0.75], method="linear")
    assert row.q1 == pytest.approx(q1) and row.q3 == pytest.approx(q3)
    iqr = q3 - q1
    assert row.lo_fence == pytest.approx(q1 - 1.5 * iqr)
    assert row.hi_fence == pytest.approx(q3 + 1.5 * iqr)
    assert row.n == 10 and row.n_outliers == 1
    assert float(row.outlier_sum) == 100.0


# --- profile_table ---------------------------------------------------------


def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k long, s string"
    )
    prof = {r.col_name: r for r in profile_table(df, ["k", "s"]).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_null == 0
    assert prof["k"].n_distinct == 2
    assert prof["k"].min_s == "1" and prof["k"].max_s == "2"
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_s == "x" and prof["s"].max_s == "y"


# --- hll_distinct ----------------------------------------------------------


def test_hll_estimate_within_tolerance(spark):
    # two groups with very different cardinalities; m=64 gives ~13%
    # standard error — assert a generous 3-sigma band
    df = spark.range(5000).selectExpr(
        "CASE WHEN id % 5 = 0 THEN 'big' ELSE 'small' END AS g",
        "CASE WHEN id % 5 = 0 THEN id ELSE id % 50 END AS v",
    )
    rows = {r.g: r for r in hll_distinct(spark, df, "g", "v").collect()}
    # in the sketch's design range (n >> m) the estimate is tight
    exact = rows["big"].exact_distinct
    assert exact == 1000
    assert abs(float(rows["big"].est) - exact) / exact < 0.4
    # below ~2.5*m the uncorrected HLL estimator is biased HIGH (the
    # linear-counting small-range correction is deliberately omitted: ln()
    # is not bit-reproducible across engines; bias, not nondeterminism) —
    # assert the documented direction rather than tightness
    assert rows["small"].exact_distinct == 40
    assert float(rows["small"].est) >= 40


def test_hll_sketch_is_partition_order_independent(spark):
    df = spark.range(2000).selectExpr("'g' AS g", "id AS v")
    a = hll_distinct(spark, df, "g", "v").collect()[0]
    b = hll_distinct(spark, df.repartition(17), "g", "v").collect()[0]
    assert a.t_sum == b.t_sum and a.n_buckets == b.n_buckets and a.est == b.est


# --- edit_distance_pairs ---------------------------------------------------


def test_fuzzy_pairs_edit_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "abcd"),  # substitution partner of 2
            (2, "abxd"),
            (3, "abc"),  # deletion partner of 1
            (4, "zzzz"),  # unrelated
        ],
        "id long, name string",
    )
    got = {(r.id_a, r.id_b, r.lev) for r in edit_distance_pairs(df, "id", "name").collect()}
    assert got == {(1, 2, 1), (1, 3, 1)}


def test_fuzzy_pairs_capped_on_degenerate_corpus(spark):
    # 10k identical keys: every variant's posting list is over the df-cap,
    # so candidate generation emits nothing instead of ~50M pairs — the
    # lev-0 mass belongs to exact dedup (same posture as the other caps)
    df = spark.range(10_000).selectExpr("id", "'all the same value' AS name")
    assert edit_distance_pairs(df, "id", "name").count() == 0
    # ...while a cluster below the cap still pairs completely
    small = spark.range(10).selectExpr("id", "concat('name', id) AS name")
    assert edit_distance_pairs(small, "id", "name").count() == 45


# --- pagerank --------------------------------------------------------------


def _pure_python_pagerank(edges, iters=3):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += rank[a] // deg[a]
        rank = {n: 150_000 + (85 * s[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_pure_python_model(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    assert got == _pure_python_pagerank(edges)


def test_pagerank_partition_order_independent(spark):
    df = (
        spark.range(500)
        .selectExpr(
            "CAST(id % 50 AS STRING) AS src", "CAST((id * 7) % 50 AS STRING) AS dst"
        )
        .distinct()
    )
    a = sorted((r.node, r.rank) for r in pagerank(df, 2).collect())
    b = sorted((r.node, r.rank) for r in pagerank(df.repartition(13), 2).collect())
    assert a == b


# --- rolling_months (RANGE frame) ------------------------------------------


def test_rolling_months_range_frame_respects_gaps(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import rolling_months

    rows = [
        ("f", dt.date(2001, 1, 1), 10),
        ("f", dt.date(2001, 2, 1), 20),
        # march missing — the trailing-3 window at may must NOT reach
        # back to february (a ROWS 2-preceding frame would)
        ("f", dt.date(2001, 4, 1), 40),
        ("f", dt.date(2001, 5, 1), 50),
    ]
    df = spark.createDataFrame(rows, "k string, mes date, v long")
    got = {
        r.mes.month: (r.v_trailing, r.n_months)
        for r in rolling_months(df, "k", "mes", "v").collect()
    }
    assert got == {1: (10, 1), 2: (30, 2), 4: (60, 2), 5: (90, 2)}


def test_rolling_months_spans_year_boundary(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import rolling_months

    rows = [("f", dt.date(2001, 12, 1), 1), ("f", dt.date(2002, 1, 1), 2)]
    df = spark.createDataFrame(rows, "k string, mes date, v long")
    got = {r.mes: r.v_trailing for r in rolling_months(df, "k", "mes", "v").collect()}
    # dec 2001 and jan 2002 are adjacent in the integer month index
    assert got[dt.date(2002, 1, 1)] == 3


# --- count-min sketch ------------------------------------------------------


def test_cms_never_underestimates_and_is_tight_on_heavy_keys(spark):
    from etl_gamma_spark.operators.sketch import cms_heavy_hitters

    # zipf-ish: key 0 dominates
    df = spark.range(5000).selectExpr("CAST(id % 100 AS STRING) AS k").union(
        spark.range(2000).selectExpr("'0' AS k")
    )
    rows = cms_heavy_hitters(df, "k", k=5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.est >= r.exact, (r.key, r.est, r.exact)
    top = max(rows, key=lambda r: r.exact)
    assert top.key == "0" and top.exact == 2050


def test_cms_partial_sketches_merge_by_cellwise_sum(spark):
    from etl_gamma_spark.operators.sketch import cms_build

    df = spark.range(3000).selectExpr("CAST(id % 37 AS STRING) AS k")
    half1 = df.where("id % 2 = 0")
    half2 = df.where("id % 2 = 1")
    full = {(r.d, r.bucket): r.counter for r in cms_build(df, "k").collect()}
    merged = {}
    for part in (half1, half2):
        for r in cms_build(part, "k").collect():
            merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.counter
    assert merged == full


# --- interval_overlap_join -------------------------------------------------


def test_interval_overlap_join_no_duplicates_and_exact_semantics(spark):
    from etl_gamma_spark.operators.ranges import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 25), (3, 40, 41), (4, 9, 2)],  # 4 inverted
        "ida long, a_lo long, a_hi long",
    )
    b = spark.createDataFrame(
        # 10 overlaps #1 at a point; 24..60 overlaps #2 and #3 and spans
        # many bins (duplicate-emission trap); 11..19 touches nothing
        [(100, 10, 12), (200, 24, 60), (300, 11, 19)],
        "idb long, b_lo long, b_hi long",
    )
    got = sorted(
        (r.ida, r.idb)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=5
        ).collect()
    )
    assert got == [(1, 100), (2, 200), (3, 200)]


def test_interval_overlap_join_negative_coordinates(spark):
    from etl_gamma_spark.operators.ranges import interval_overlap_join

    a = spark.createDataFrame([(1, -12, -3)], "ida long, a_lo long, a_hi long")
    b = spark.createDataFrame([(2, -5, 4)], "idb long, b_lo long, b_hi long")
    rows = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=7
    ).collect()
    assert len(rows) == 1  # floor-division binning handles negatives


# --- asof_nearest ----------------------------------------------------------


def test_asof_nearest_direction_ties_and_tolerance(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import asof_nearest

    t0 = dt.datetime(2001, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [
            ("u", 1, ts(100), 1),  # right at 90 (d=10) and 105 (d=5) -> forward
            ("u", 2, ts(200), 2),  # rights at 195 and 205 (d=5 both) -> backward
            ("u", 3, ts(400), 3),  # nearest is 205, d=195 > tolerance -> NULL
            ("u", 4, ts(90), 4),   # exact match d=0, two rights at 90 -> max id
        ],
        "k string, lid long, lts timestamp, tb long",
    )
    right = spark.createDataFrame(
        [
            ("u", 10, ts(90), 10),
            ("u", 11, ts(90), 11),  # same instant, larger tiebreak wins
            ("u", 12, ts(105), 12),
            ("u", 13, ts(195), 13),
            ("u", 14, ts(205), 14),
        ],
        "k string, rid long, rts timestamp, tb long",
    )
    got = {
        r.lid: (r.nearest_rid, r.delta_us)
        for r in asof_nearest(
            left, right, "k", "lts", "rts", ["rid"],
            tiebreak="tb", tolerance_us=60_000_000,
        ).collect()
    }
    assert got[1] == (12, 5_000_000)   # forward closer
    assert got[2] == (13, 5_000_000)   # tie -> backward
    assert got[3] == (None, None)      # outside tolerance
    assert got[4] == (11, 0)           # equal instant, max tiebreak


# --- sliding_chunks --------------------------------------------------------


def test_sliding_chunks_overlap_arithmetic(spark):
    import hashlib

    from etl_gamma_spark.operators.quality import sliding_chunks

    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        sliding_chunks(df, window=20, stride=10).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts at words 0, 10, 20 -> lengths 20, 15, 5
    assert [r.n_tokens for r in rows] == [20, 15, 5]
    expected = [
        " ".join(words[0:20]),
        " ".join(words[10:25]),
        " ".join(words[20:25]),
    ]
    for r, e in zip(rows, expected):
        assert r.chunk_hash == hashlib.md5(e.encode()).hexdigest()
    # empty text still emits exactly one (empty) chunk
    empty = sliding_chunks(
        spark.createDataFrame([(2, "")], "doc_id long, text string")
    ).collect()
    assert len(empty) == 1 and empty[0].n_tokens == 1


# --- triangle_counts -------------------------------------------------------


def test_triangle_counts_vs_bruteforce(spark):
    import itertools
    import random

    from etl_gamma_spark.operators.graph import triangle_counts

    rng = random.Random(99)
    nodes = list(range(30))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
    )
    expect = {}
    eset = set(edges)
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, "x long, y long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expect


def test_cooccurrence_edges_weights_and_cap(spark):
    from etl_gamma_spark.operators.graph import cooccurrence_edges

    rows = [
        ("i1", "a"), ("i1", "b"),
        ("i2", "a"), ("i2", "b"),
        ("i3", "b"), ("i3", "c"),
        # hub item shared by everyone: over the cap, contributes nothing
        *[("hub", e) for e in "abcdef"],
    ]
    df = spark.createDataFrame(rows, "item string, entity string")
    got = {
        (r.x, r.y): r.n_shared
        for r in cooccurrence_edges(df, "item", "entity", max_df=3).collect()
    }
    assert got == {("a", "b"): 2, ("b", "c"): 1}


# --- twap_buckets ----------------------------------------------------------


def test_twap_weights_and_average(spark):
    import datetime as dt
    from decimal import Decimal

    from etl_gamma_spark.operators.temporal import twap_buckets

    h = dt.datetime(2001, 1, 1, 10, 0, 0)
    rows = [
        # value 2.0 holds 10:00:00->10:30:00 (1800s), 4.0 holds to hour end
        (1, "u", h, 2.0),
        (2, "u", h + dt.timedelta(minutes=30), 4.0),
        # single tick at 11:15 holds 45 min -> twap == its own value
        (3, "u", h + dt.timedelta(hours=1, minutes=15), 7.5),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp, value double")
    got = {r.bucket_ts.hour: r for r in twap_buckets(df).collect()}
    assert float(got[10].twap) == 3.0  # (2*1800 + 4*1800) / 3600
    assert got[10].den == Decimal(3600_000_000)
    assert float(got[11].twap) == 7.5
    assert got[11].n_ticks == 1


# --- observation metrics ---------------------------------------------------


def test_with_observation_piggybacks_metrics(spark):
    from pyspark.sql import functions as F

    from etl_gamma_spark.functions.diagnostics import with_observation

    df = spark.range(100).selectExpr("id", "id % 3 AS g")
    observed, obs = with_observation(
        df, "load_metrics", {"n": F.count(F.lit(1)), "max_id": F.max("id")}
    )
    observed.write.mode("overwrite").format("noop").save()
    assert obs.get == {"n": 100, "max_id": 99}


def test_fuzzy_pairs_length_guard(spark):
    # document-length strings are excluded up front (O(len) variant
    # fan-out is the key-matcher contract; long text belongs to shingles)
    long = "x" * 5000
    df = spark.createDataFrame(
        [(1, long), (2, long[:-1] + "y"), (3, "short"), (4, "shor")],
        "id long, name string",
    )
    got = {(r.id_a, r.id_b) for r in edit_distance_pairs(df, "id", "name").collect()}
    assert got == {(3, 4)}


# --- table_diff ------------------------------------------------------------


def test_table_diff_statuses(spark):
    from etl_gamma_spark.operators.cdc import table_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)], "k long, s string, v double"
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 99.0), (4, "w", 4.0)], "k long, s string, v double"
    )
    got = {r.k: r.status for r in table_diff(a, b, ["k"], ["s", "v"]).collect()}
    assert got == {1: "equal", 2: "changed", 3: "only_a", 4: "only_b"}


def test_table_diff_null_shift_detected(spark):
    # Spark hash functions SKIP null inputs, so without per-column null
    # flags ('x', NULL) and (NULL, 'x') hash identically — the
    # value-shifted-between-columns case a migration diff exists for
    from etl_gamma_spark.operators.cdc import table_diff

    a = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, None, None)],
        "k long, c1 string, c2 string",
    )
    b = spark.createDataFrame(
        [(1, None, "x"), (2, None, "x"), (4, None, None)],
        "k long, c1 string, c2 string",
    )
    got = {r.k: r.status for r in table_diff(a, b, ["k"], ["c1", "c2"]).collect()}
    assert got == {1: "changed", 2: "equal", 3: "only_a", 4: "only_b"}


def test_iqr_outliers_null_values_excluded(spark):
    rows = [(0, "g", None), (1, "g", 1.0), (2, "g", 2.0), (3, "g", 3.0), (4, "g", None)]
    df = spark.createDataFrame(rows, "id long, g string, x double")
    [row] = iqr_outliers(df, "g", "x", "id").collect()
    assert row.n == 3  # nulls excluded from both the rank and the count
    assert row.q1 == 1.5 and row.q3 == 2.5


def test_cooccurrence_cap_never_triggers_on_fixtures(spark):
    # supplier_triangles / also_bought_topk engines df-cap parts at 64
    # but their oracles are UNCAPPED restatements — this pin is what
    # makes that equivalence checkable: if a fixture ever grows a part
    # with more than 64 distinct suppliers, fail HERE with a pointer
    # instead of as an opaque hash mismatch in the differential.
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        [(mx,)] = duckdb.sql(
            f"""SELECT MAX(c) FROM (
                SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS c
                FROM '/root/testdata/sf{sf}/lineitem.parquet' GROUP BY 1)"""
        ).fetchall()
        assert mx <= 64, (
            f"sf{sf}: a part has {mx} suppliers — above the engine's df-cap; "
            "mirror the cap in _TRIANGLES_SQL/_ALSO_BOUGHT_SQL or raise max_df"
        )


def test_gap_fill_flags_observed_null_months(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import gap_fill_monthly

    rows = [
        ("f", dt.date(2001, 1, 1), 10.0),
        ("f", dt.date(2001, 2, 1), None),  # observed month, NULL value
        ("f", dt.date(2001, 4, 1), 40.0),  # march is a true gap
    ]
    df = spark.createDataFrame(rows, "k string, mes date, v double")
    got = {r.mes.month: (r.v, r.is_observed) for r in gap_fill_monthly(df, "k", "mes", "v").collect()}
    assert got[1] == (10.0, True)
    assert got[2] == (10.0, True)   # carried forward BUT flagged observed
    assert got[3] == (10.0, False)  # true gap
    assert got[4] == (40.0, True)


def test_swap_directory_rolls_back_on_failure(tmp_path):
    import os

    from etl_gamma_spark.sources.sink import swap_directory

    path = tmp_path / "table"
    path.mkdir()
    (path / "data.txt").write_text("old")
    tmp = tmp_path / "table._applying"
    tmp.mkdir()
    (tmp / "data.txt").write_text("new")
    swap_directory(str(tmp), str(path))
    assert (path / "data.txt").read_text() == "new"
    assert not os.path.exists(str(tmp))
    assert not os.path.exists(str(path) + "._replaced")
    # failed swap (tmp missing) must roll the old copy back
    try:
        swap_directory(str(tmp_path / "nope"), str(path))
    except OSError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected OSError")
    assert (path / "data.txt").read_text() == "new"


# --- cap_per_group ---------------------------------------------------------


def test_cap_per_group_exact_k_and_small_groups(spark):
    from etl_gamma_spark.operators.quality import cap_per_group

    df = spark.range(5000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 4990 THEN 'big' ELSE 'small' END AS source",
    )
    got = cap_per_group(df, "source", 100, "doc_id")
    counts = {r.source: r.n for r in got.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    assert counts == {"big": 100, "small": 10}  # under-k group kept whole


def test_cap_per_group_partition_order_independent(spark):
    from etl_gamma_spark.operators.quality import cap_per_group

    df = spark.range(3000).selectExpr("id AS doc_id", "'s' AS source")
    a = sorted(r.doc_id for r in cap_per_group(df, "source", 50, "doc_id").collect())
    b = sorted(
        r.doc_id
        for r in cap_per_group(df.repartition(17), "source", 50, "doc_id").collect()
    )
    assert a == b and len(a) == 50


def test_cms_join_size_overestimates_and_tracks_exact(spark):
    from etl_gamma_spark.operators.sketch import cms_join_size

    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 7]], "k long"
    )
    b = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 4]], "k long"
    )
    row = cms_join_size(a, "k", b, "k").collect()[0]
    # exact |a join b| = 3*1 + 2*3 = 9
    assert row.exact_join_rows == 9
    # CMS inner product can only overestimate
    assert row.est_join_rows >= row.exact_join_rows
    # with 7 distinct keys in 256 buckets collisions are unlikely: the
    # estimate should be exact here (deterministic md5 buckets)
    assert row.est_join_rows == 9
    # disjoint sides -> exact 0 and estimate >= 0
    c = spark.createDataFrame([(100,), (101,)], "k long")
    row2 = cms_join_size(a, "k", c, "k").collect()[0]
    assert row2.exact_join_rows == 0
    assert row2.est_join_rows >= 0


def test_group_trend_exact_ols(spark):
    from decimal import Decimal

    from etl_gamma_spark.operators.stats import group_trend

    df = spark.createDataFrame(
        [
            # hand-computed: slope -45/600 = -0.075 exactly; intercept
            # (2.75 + 0.075*3)/3 = 0.99166... -> HALF_UP 0.991667
            ("a", 0, "1.00"),
            ("a", 1, "0.90"),
            ("a", 2, "0.85"),
            # single point: zero x-variance -> NULL slope/intercept
            ("b", 7, "5.00"),
            # far-from-zero x: centering keeps the arithmetic narrow and
            # the intercept is the fitted value at the group's FIRST x
            ("c", 1000, "1.00"),
            ("c", 1001, "2.00"),
            ("c", 1002, "3.00"),
            # negative values exercise the sign-split on both divisions
            ("d", 0, "-1.00"),
            ("d", 1, "-2.00"),
        ],
        "g string, x long, y string",
    ).selectExpr("g", "x", "CAST(y AS DECIMAL(18,2)) AS y")
    rows = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert rows["a"].slope == Decimal("-0.075000")
    assert rows["a"].intercept == Decimal("0.991667")
    assert rows["a"].n_points == 3
    assert rows["b"].slope is None and rows["b"].intercept is None
    assert rows["c"].slope == Decimal("1.000000")
    assert rows["c"].intercept == Decimal("1.000000")
    assert rows["d"].slope == Decimal("-1.000000")
    assert rows["d"].intercept == Decimal("-1.000000")


def test_fd_report_semantics(spark):
    from etl_gamma_spark.operators.stats import fd_report

    df = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, "a", "x"),
            (3, "b", "y"),
            (4, None, "y"),  # NULL lhs is a value (its own group)
            (5, "b", None),  # NULL rhs breaks b -> rhs determinism
        ],
        "id long, u string, v string",
    )
    rows = {(r.lhs, r.rhs): r for r in fd_report(df, ["id", "u", "v"]).collect()}
    assert len(rows) == 6
    # id is unique -> determines everything
    assert rows[("id", "u")].fd_holds == 1 and rows[("id", "v")].fd_holds == 1
    assert rows[("id", "u")].max_fanout == 1
    # u -> v fails: u='b' maps to both 'y' and NULL
    r = rows[("u", "v")]
    assert (r.n_lhs, r.n_pairs, r.max_fanout, r.fd_holds) == (3, 4, 2, 0)
    # v -> u fails too: v='y' maps to 'b' and NULL
    assert rows[("v", "u")].fd_holds == 0
    # u -> id fails (fanout 2 on 'a' and 'b')
    assert rows[("u", "id")].max_fanout == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fd_report(df, ["id"])


def test_mode_per_group_deterministic_ties_and_nulls(spark):
    from etl_gamma_spark.operators.stats import mode_per_group

    df = spark.createDataFrame(
        [
            ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
            ("g2", None), ("g2", None), ("g2", "z"),
            ("g3", None),
        ],
        "g string, v string",
    )
    rows = {r.g: r for r in mode_per_group(df, "g", "v").collect()}
    # tie between a(2) and b(2) -> smallest value wins
    assert (rows["g1"].mode_value, rows["g1"].mode_n) == ("a", 2)
    # NULLs are excluded by contract: z wins despite NULL being more frequent
    assert (rows["g2"].mode_value, rows["g2"].mode_n) == ("z", 1)
    # all-NULL group disappears entirely
    assert "g3" not in rows


def test_winsorized_mean_hand_computed(spark):
    from decimal import Decimal

    from etl_gamma_spark.operators.stats import winsorized_mean

    rows = [("g", float(v), i) for i, v in enumerate([0, 1, 2, 3, 1000])]
    rows += [("h", float(v), i) for i, v in enumerate([-1000, -3, -2, -1, 0])]
    df = spark.createDataFrame(rows, "grp string, value double, tb long")
    got = {r.grp: r for r in winsorized_mean(df, "grp", "value", "tb").collect()}
    # g: q1=1, q3=3 -> fences [-2, 6]; clamped [0,1,2,3,6] -> mean 2.4
    assert got["g"].wins_mean == Decimal("2.400000")
    assert (got["g"].lo_fence, got["g"].hi_fence) == (-2.0, 6.0)
    # h: mirror image exercises the sign-split division
    assert got["h"].wins_mean == Decimal("-2.400000")
    assert got["g"].n == 5 and got["h"].n == 5


def test_interval_coalesce_islands_touch_and_gap(spark):
    import datetime as dt

    from etl_gamma_spark.operators.ranges import interval_coalesce

    d = dt.date
    rows = [
        # k1: [1,5] + [5,9] touch -> one island of 9 days; [20,21] gaps
        ("k1", d(2020, 1, 1), d(2020, 1, 5), 1),
        ("k1", d(2020, 1, 5), d(2020, 1, 9), 2),
        ("k1", d(2020, 1, 20), d(2020, 1, 21), 3),
        # k2: nested interval merges; inverted row dropped
        ("k2", d(2020, 2, 1), d(2020, 2, 28), 1),
        ("k2", d(2020, 2, 10), d(2020, 2, 12), 2),
        ("k2", d(2020, 2, 5), d(2020, 2, 1), 3),
    ]
    df = spark.createDataFrame(rows, "k string, s date, e date, tb long")
    got = {r.k: r for r in interval_coalesce(df, "k", "s", "e", ["tb"]).collect()}
    assert (got["k1"].n_intervals, got["k1"].n_islands, got["k1"].covered_days) == (3, 2, 11)
    assert (got["k2"].n_intervals, got["k2"].n_islands, got["k2"].covered_days) == (2, 1, 28)


def test_event_transitions_counts_and_probability(spark):
    import datetime as dt
    from decimal import Decimal

    from etl_gamma_spark.operators.temporal import event_transitions

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # user 1: a -> b -> a -> c ; user 2: a -> b (streams never mix)
        (1, t0, "a", 1), (1, t0.replace(hour=1), "b", 2),
        (1, t0.replace(hour=2), "a", 3), (1, t0.replace(hour=3), "c", 4),
        (2, t0, "a", 5), (2, t0.replace(hour=1), "b", 6),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string, eid long")
    got = {
        (r.prev_type, r.next_type): r
        for r in event_transitions(df, "u", "ts", "et", "eid").collect()
    }
    # from 'a': 2x ->b, 1x ->c (total 3); from 'b': 1x ->a
    assert got[("a", "b")].n_trans == 2
    assert got[("a", "c")].n_trans == 1
    assert got[("b", "a")].n_trans == 1
    # 2/3 at scale 6 HALF_UP = 0.666667 (the tie-proof integer form)
    assert got[("a", "b")].p_next == Decimal("0.666667")
    assert got[("a", "c")].p_next == Decimal("0.333333")
    assert got[("b", "a")].p_next == Decimal("1.000000")
    assert ("c", "a") not in got  # streams don't cross users


def test_group_trend_rejects_sub_cent_scale(spark):
    import pytest as _pytest

    from etl_gamma_spark.operators.stats import group_trend

    df = spark.createDataFrame([("a", 0, 1.0)], "g string, x long, y double")
    with _pytest.raises(ValueError):
        group_trend(df, ["g"], "x", "y", scale=1).collect()
