"""Tests for the source layer (schema evolution, gated JDBC) and the
scale-path operators (bucketed interval join ≡ broadcast interval join,
stateful streaming dedup ≡ batch dedup)."""

import pytest
from pyspark.sql import functions as F

from etl_gamma_spark.operators.responsibility import (
    client_farmer_periods,
    filter_by_responsibility,
    filter_by_responsibility_bucketed,
)
from etl_gamma_spark.registry import _ensure_model
from etl_gamma_spark.sources import catalog
from etl_gamma_spark.sources.jdbc import JdbcConfig, read_table
from etl_gamma_spark.streaming.stateful import streaming_dedup_events
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_bucketed_interval_join_matches_broadcast(spark):
    _ensure_model(spark, SF_CORRECT)
    periods = client_farmer_periods(
        spark.table("clients"), spark.table("client_transfers")
    )
    fact = spark.table("revenue_records_historical")
    for farmer in (None, 7):
        a = filter_by_responsibility(fact, periods, "record_date", farmer)
        b = filter_by_responsibility_bucketed(fact, periods, "record_date", farmer)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_schema_evolution_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    catalog.append_with_evolution(spark, v1, path)
    assert catalog.table_exists(path)

    v2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    assert catalog.missing_columns(spark, v2, path) == ["score"]
    catalog.append_with_evolution(spark, v2, path)

    back = catalog.read_evolved(spark, path).orderBy("id").collect()
    assert [r.score for r in back] == [None, 9.5]  # old rows NULL-padded

    conformed = catalog.conform(v1, ["id", "name", "score"])
    assert conformed.columns == ["id", "name", "score"]


def test_jdbc_gated_without_config(spark):
    with pytest.raises(RuntimeError, match="not configured"):
        read_table(spark, JdbcConfig(), "clients")


def test_streaming_dedup_equals_batch_dedup(spark):
    out = streaming_dedup_events(spark, SF_SMOKE, query_name="t_dedup")
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    # event_id is unique in the fixture, so dedup must be lossless…
    assert out.count() == batch.count()
    # …and re-running over the same (fully consumed) feed stays stable
    out2 = streaming_dedup_events(spark, SF_SMOKE, query_name="t_dedup2")
    assert out2.count() == out.count()
    # duplicates within a batch collapse to first-seen
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_conform_padded_columns_are_writable(spark, tmp_path):
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    conformed = catalog.conform(v1, ["id", "name", "score"], types={"score": "double"})
    path = str(tmp_path / "conf")
    conformed.write.parquet(path)  # NullType would raise here
    back = spark.read.parquet(path).collect()
    assert back[0].score is None


def test_streaming_rollup_foreachbatch_sink(spark, tmp_path):
    from etl_gamma_spark.streaming.monthly_rollup import (
        monthly_event_rollup,
        run_streaming_rollup_to_sink,
    )
    from etl_gamma_spark.io import load_table

    out = str(tmp_path / "rollup")
    run_streaming_rollup_to_sink(spark, SF_SMOKE, out, str(tmp_path / "ckpt"))
    got = {
        (r.mes, r.event_type): (r.n_events, str(r.total_value))
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.mes, r.event_type): (r.n_events, str(r.total_value))
        for r in monthly_event_rollup(load_table(spark, SF_SMOKE, "events")).collect()
    }
    assert got == batch
    # idempotent re-run with a FRESH checkpoint reprocesses and overwrites
    # the same partitions to the same state
    run_streaming_rollup_to_sink(spark, SF_SMOKE, out, str(tmp_path / "ckpt2"))
    got2 = {
        (r.mes, r.event_type): (r.n_events, str(r.total_value))
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == batch


def test_expectations_on_model_tables(spark):
    from etl_gamma_spark.sources import validate as V

    _ensure_model(spark, SF_CORRECT)
    clients = spark.table("clients")
    report = V.run_expectations(
        clients,
        [
            V.not_null("client_id", "farmer_id", "creation_date"),
            V.matches("farmer_id", "^[0-9]+$"),
        ],
    )
    assert all(v == 0 for v in report.values()), report

    rev = spark.table("revenue_records_historical")
    V.enforce(rev, [V.not_null("client_id", "record_date"), V.in_range("gross_revenue", 0, 10**9)])
    assert V.referential(rev, "client_id", clients, "client_id") == 0

    # violations are actually counted and enforced
    bad = spark.createDataFrame([(1, "x"), (None, "ok")], "k long, s string")
    rep = V.run_expectations(bad, [V.not_null("k"), V.values_in("s", ["ok"])])
    assert rep == {"not_null(k)": 1, "values_in(s, ['ok'])": 1}
    import pytest as _pt

    with _pt.raises(AssertionError, match="data-quality violations"):
        V.enforce(bad, [V.not_null("k")])
    with _pt.raises(ValueError, match="duplicate expectation"):
        V.run_expectations(bad, [V.not_null("k"), V.not_null("k")])
    with _pt.raises(ValueError, match="at least one"):
        V.run_expectations(bad, [])
    with _pt.raises(ValueError, match="at least one"):
        V.not_null()


def test_multi_file_inputs_identical_results_no_plan_degradation(spark, tmp_path):
    # io.spread() and the single-file fixtures could mask partition-count
    # assumptions: a 1-partition local read makes every small join
    # auto-broadcast and hides ordering/layout sensitivity. Re-materialize
    # documents + embeddings as 8-file parquet and assert the heavy pair /
    # similarity queries return IDENTICAL row sets with no plan
    # degradation (no nested-loop joins sneaking in). All tested outputs
    # are row-local or order-independent computations, so any difference
    # is a real partition-layout sensitivity.
    import os

    from etl_gamma_spark.registry import QUERIES

    mdir = tmp_path / "sf_multi"
    mdir.mkdir()
    for fname in os.listdir(SF_SMOKE):
        table = fname.split(".")[0]
        if table in ("documents", "embeddings", "events", "lineitem", "customer"):
            df = spark.read.parquet(f"{SF_SMOKE}/{fname}")
            df.repartition(8).write.parquet(str(mdir / fname))
        else:
            os.symlink(f"{SF_SMOKE}/{fname}", str(mdir / fname))
    assert len([f for f in os.listdir(mdir / "documents.parquet") if f.endswith(".parquet")]) == 8

    for name in [
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "simhash_neardup_pairs",
        "winnow_overlap_pairs",
        "embedding_topk",
        "embedding_lsh_topk",
        "embedding_neardup_pairs",
        # round-5 batch 4/5: sketches are order-independent by design,
        # the graph/pair/window ops deterministic — any layout sensitivity
        # is a real bug
        "hll_distinct",
        "cms_topk",
        "fuzzy_name_pairs",
        "pagerank_bipartite",
        "supplier_triangles",
        "range_tier_join",
        "supplier_window_overlaps",
        "twap_hourly",
        "iqr_outliers",
    ]:
        base = sorted(map(str, QUERIES[name](spark, SF_SMOKE).collect()))
        multi_df = QUERIES[name](spark, str(mdir))
        plan = multi_df._jdf.queryExecution().explainString(
            multi_df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastNestedLoopJoin" not in plan, name
        multi = sorted(map(str, multi_df.collect()))
        assert multi == base, f"{name}: results differ across file layouts"


def test_round5_heavy_ops_subquadratic_on_replicated_corpus(spark, tmp_path):
    """VERDICT r5 item 6: replicate the sf0.001 corpus 4x with
    tools/scale_probe's structure-preserving mutations and check the
    round-5 heavy ops stay sub-quadratic. Wall-clock on this shared host
    is too noisy to gate tightly, so the primary assert is deterministic
    OUTPUT GROWTH (candidate/pair blowup is what kills banded joins at
    scale — a quadratic generator shows 16x rows at 4x input); a single
    generous wall-clock bound (< half the quadratic ratio) backstops
    execution cost."""
    import time

    from etl_gamma_spark.registry import QUERIES, _REGISTERED
    from tools import scale_probe as sp

    base = SF_SMOKE
    replica = str(tmp_path / "x4")
    old_base = sp.BASE
    sp.BASE = base
    try:
        sp.replicate(spark, replica, 4)

        ops = [
            "fuzzy_name_pairs",
            "supplier_triangles",
            "also_bought_topk",
            "embedding_neardup_pairs",
            "pagerank_bipartite",
            # round-6: linear-output ops (bm25 top-k is constant rows;
            # classifier/semdedup emit <= one row per doc/vector)
            "bm25_topk",
            "quality_classifier_score",
            "semdedup_prune",
        ]
        counts = {}
        timings = {}
        for sf_dir in (base, replica):
            _REGISTERED.pop(spark, None)
            for name in ops:
                best, n = None, None
                for _ in range(2):
                    t0 = time.monotonic()
                    n = QUERIES[name](spark, sf_dir).count()
                    dt_ = time.monotonic() - t0
                    best = dt_ if best is None else min(best, dt_)
                counts.setdefault(name, []).append(n)
                timings.setdefault(name, []).append(best)
    finally:
        sp.BASE = old_base
        _REGISTERED.pop(spark, None)

    for name in ops:
        n1, n4 = counts[name]
        # linear-ish output growth: a quadratic pair generator would emit
        # ~16x at 4x input; allow 6x (graph ops stay ~constant — the
        # distinct co-purchase graph does not grow under orderkey shifts).
        # embedding_neardup_pairs is exempt: replicate() makes every copy
        # a TRUE near-duplicate of its base vector, so the correct answer
        # itself contains the quadratic cross-copy identity pairs — its
        # scale posture is covered by the wall-clock backstop below and
        # the banding plan-shape tests.
        if name != "embedding_neardup_pairs":
            assert n4 <= max(6 * n1, n1 + 64), (name, n1, n4)
        t1, t4 = timings[name]
        # generous noise-tolerant backstop: well under the 16x quadratic
        # signature even if the 1x run hit a fast path. Before failing,
        # RE-TIME once (bench.py's retime rule: ambient load only ever
        # inflates a timing, so min() cannot hide a real blow-up — this
        # test measured a 19.8x "ratio" on unchanged code while a
        # concurrent sf0.1 driver_sim held all 32 cores).
        if t4 > 8 * max(t1, 0.5):
            for i, sf_dir in enumerate((base, replica)):
                _REGISTERED.pop(spark, None)
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).count()
                timings[name][i] = min(
                    timings[name][i], time.monotonic() - t0
                )
            t1, t4 = timings[name]
        assert t4 <= 8 * max(t1, 0.5), (name, t1, t4)
