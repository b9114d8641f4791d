"""Small unit tests for helpers not otherwise covered directly."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_gamma_spark.functions.calendar import (
    month_fmt,
    month_floor,
    month_series,
    month_window,
)
from etl_gamma_spark.operators.multimodal import resize_thumbnail, synth_media
from etl_gamma_spark.sources import validate as V
from tests.conftest import SF_SMOKE


def test_month_window_half_open(spark):
    lower, cur = month_window(dt.date(2001, 6, 15), 11)
    row = spark.range(1).select(lower.alias("lo"), cur.alias("hi")).first()
    assert row.lo == dt.date(2000, 7, 1)
    assert row.hi == dt.date(2001, 6, 1)


def test_month_floor_and_fmt(spark):
    row = (
        spark.createDataFrame([(dt.date(2001, 6, 15),)], "d date")
        .select(month_floor(F.col("d")).alias("m"), month_fmt(F.col("d")).alias("f"))
        .first()
    )
    assert row.m == dt.date(2001, 6, 1)
    assert row.f == "06/2001"


def test_month_series_bounds_and_empty(spark):
    months = [r.mes for r in month_series(spark, dt.date(2001, 1, 10), dt.date(2001, 4, 20)).collect()]
    assert months == [dt.date(2001, m, 1) for m in (1, 2, 3, 4)]
    assert month_series(spark, dt.date(2001, 5, 1), dt.date(2001, 1, 1)).count() == 0


def test_in_range_and_matches_rules(spark):
    df = spark.createDataFrame(
        [(5, "abc"), (50, "a1c"), (None, None)], "n int, s string"
    )
    rep = V.run_expectations(
        df, [V.in_range("n", 0, 10), V.matches("s", "^[a-z]+$")]
    )
    # NULLs don't violate range/regex rules (pair with not_null to require)
    assert rep == {"in_range(n, 0, 10)": 1, "matches(s, ^[a-z]+$)": 1}


def test_resize_thumbnail_only_visual_kinds(spark):
    media = synth_media(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    thumbs = resize_thumbnail(media, w=3, h=2).collect()
    kinds = {r.kind for r in thumbs}
    assert kinds <= {"image", "video"}
    assert all(len(r.thumb) <= 6 for r in thumbs if r.thumb is not None)
    assert all((r.thumb_w, r.thumb_h) == (3, 2) for r in thumbs)


def test_word_shingles_short_doc_fallback(spark):
    from etl_gamma_spark.functions import text as T

    row = spark.sql(
        f"SELECT {T.word_shingles(T.split_ws('t', T.SPARK), 't', T.SPARK)} AS sh "
        "FROM (SELECT 'only two' AS t)"
    ).first()
    assert row.sh == ["only two"]


def test_minhash_identical_docs_same_signature(spark):
    from etl_gamma_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "completely different words here now")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: tuple(r[f"m{j}"] for j in range(16)) for r in minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_bcast_attach_null_keys_and_collision_guard(spark):
    # NULL-keyed probe rows must survive (cross-join semantics — ADVICE
    # round 4: a bare NULL % 1 key silently dropped them), and a
    # pre-existing __j column must be rejected, not silently clobbered.
    from etl_gamma_spark.operators.similarity import bcast_attach

    probe = spark.createDataFrame(
        [(1,), (None,), (3,)], "k bigint"
    )
    build = spark.createDataFrame([(None, "attached")], "bk bigint, tag string")
    got = {r.k: r.tag for r in bcast_attach(probe, build, "k", "bk").collect()}
    assert got == {1: "attached", None: "attached", 3: "attached"}

    clash = probe.withColumn("__j", F.lit(9))
    with pytest.raises(ValueError, match="__j"):
        bcast_attach(clash, build, "k", "bk")
    with pytest.raises(ValueError, match="__j"):
        bcast_attach(probe, clash.withColumnRenamed("k", "bk"), "k", "bk")


def test_word_chunks_dialect_parity_on_edges(spark):
    """word_chunks must produce identical chunk arrays in Spark and DuckDB
    on the edge shapes: empty string, single word, exact multiples of the
    width, one-over/one-under, and multi-chunk texts (w=3 keeps cases
    small)."""
    import duckdb

    from etl_gamma_spark.functions import text as T

    texts = [
        "",
        "one",
        "a b",
        "a b c",          # exactly one chunk
        "a b c d",        # one over
        "a b c d e f",    # exactly two chunks
        "a b c d e f g h i j k",
    ]
    s_expr = T.word_chunks(T.split_ws("t", T.SPARK), T.SPARK, 3)
    d_expr = T.word_chunks(T.split_ws("t", T.DUCK), T.DUCK, 3)

    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got_s = {
        r.i: list(r.c)
        for r in sdf.selectExpr("i", f"{s_expr} AS c").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", list(enumerate(texts)))
    got_d = {
        i: list(c) for i, c in con.execute(f"SELECT i, {d_expr} FROM tt").fetchall()
    }
    assert got_s == got_d
    # sanity of the shape itself
    assert got_s[3] == ["a b c"]
    assert got_s[4] == ["a b c", "d"]
    assert got_s[5] == ["a b c", "d e f"]


def test_bench_previous_round_times_reads_driver_wrapper(tmp_path, monkeypatch):
    # the driver archives bench output as a wrapper {n, rc, tail, parsed}
    # whose "tail" is the LAST 2000 bytes of stdout — the JSON line may be
    # cut at the front. The retime pass must still recover per-query
    # numbers from it (r5's artifact yielded zero references and the
    # retime pass silently never fired).
    import importlib
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")

    line = _json.dumps(
        {
            "metric": "m",
            "value": 3.5,
            "queries": {"q_a": 1.25, "q_b": 2.25},
            "sf": 0.1,
            "runs_per_query": 2,
            "loadavg": [1.0, 2.0, 3.0],
            # a float-valued summary field AFTER the queries map: the
            # harvest cut at "runs_per_query" must keep it out of the
            # per-query baseline (ADVICE r8)
            "some_future_ratio": 7.75,
        }
    )
    wrapper = {"n": 5, "rc": 0, "tail": line[10:], "parsed": None}  # cut head
    (tmp_path / "BENCH_r07.json").write_text(_json.dumps(wrapper))
    # the baseline is the running MIN across ALL artifacts (VERDICT r8
    # item 5): an older plain artifact's better number must survive a
    # newer, load-inflated round
    (tmp_path / "BENCH_r06.json").write_text(
        _json.dumps({"queries": {"q_a": 0.5, "q_c": 4.0}})
    )
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _: str(tmp_path)
    )
    got = bench.previous_round_times()
    assert got == {"q_a": 0.5, "q_b": 2.25, "q_c": 4.0}
    assert "some_future_ratio" not in got
