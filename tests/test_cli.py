"""CLI entry-point tests (reference main.py/run_etl.ps1 surface): run a
pipeline to a warehouse dir, check partition layout, and verify the
farmer-scoped refresh preserves other farmers' rows (S4 scope b)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_gamma_spark import asof
from etl_gamma_spark.cli import run_pipeline
from tests.conftest import SF_SMOKE


def test_cli_full_then_farmer_scoped_refresh(spark, tmp_path):
    out = str(tmp_path)
    n_full = run_pipeline(
        spark, "receita_farmer_m_passado", SF_SMOKE, out,
        farmer_id=None, months_back=11, as_of=asof.AS_OF_TPCH,
    )
    table = f"{out}/receita_farmer_m_passado"
    full = spark.read.parquet(table)
    assert full.count() == n_full
    assert "updated_at" in full.columns
    baseline_other = full.filter(F.col("farmer_id") != 7).drop("updated_at").collect()

    # farmer-scoped rerun must replace ONLY farmer 7's partitions
    run_pipeline(
        spark, "receita_farmer_m_passado", SF_SMOKE, out,
        farmer_id=7, months_back=11, as_of=asof.AS_OF_TPCH,
    )
    after = spark.read.parquet(table)
    assert after.count() == n_full
    after_other = after.filter(F.col("farmer_id") != 7).drop("updated_at").collect()
    assert sorted(map(str, after_other)) == sorted(map(str, baseline_other))


def test_cli_fechamento_runs(spark, tmp_path):
    n = run_pipeline(
        spark, "fechamento_m_presente", SF_SMOKE, str(tmp_path),
        farmer_id=None, months_back=11, as_of=dt.date(2024, 1, 30),
    )
    assert n > 0
    back = spark.read.parquet(f"{tmp_path}/fechamento_m_presente")
    assert back.filter(F.col("is_current_month")).count() == n


def test_cli_unscoped_rerun_replaces_whole_table(spark, tmp_path):
    # S4 scope (a): a narrower unscoped re-run must NOT keep months from
    # the earlier, wider run (regression: dynamic overwrite left them)
    out = str(tmp_path)
    run_pipeline(
        spark, "receita_farmer_m_passado", SF_SMOKE, out,
        farmer_id=None, months_back=11, as_of=asof.AS_OF_TPCH,
    )
    table = f"{out}/receita_farmer_m_passado"
    months_wide = {r.mes for r in spark.read.parquet(table).select("mes").distinct().collect()}
    run_pipeline(
        spark, "receita_farmer_m_passado", SF_SMOKE, out,
        farmer_id=None, months_back=3, as_of=asof.AS_OF_TPCH,
    )
    months_narrow = {r.mes for r in spark.read.parquet(table).select("mes").distinct().collect()}
    assert len(months_narrow) < len(months_wide)
    assert months_narrow == {m for m in months_wide if m >= dt.date(2001, 3, 1)}


def test_cli_round5_pipelines(spark, tmp_path):
    import os

    out = str(tmp_path / "wh")
    n1 = run_pipeline(
        spark, "chunk_dedup", SF_SMOKE, out,
        farmer_id=None, months_back=11, as_of=asof.AS_OF_TPCH,
    )
    n2 = run_pipeline(
        spark, "cdc_merge", SF_SMOKE, out,
        farmer_id=None, months_back=11, as_of=asof.AS_OF_TPCH,
    )
    assert n1 == 500 and n2 > 0
    got = spark.read.parquet(os.path.join(out, "chunk_dedup"))
    assert got.count() == 500 and "updated_at" in got.columns


def test_setup_logging_file_and_stdout(tmp_path, capsys):
    """--log-file parity with reference main.py:29-55 (file + stdout
    handlers); stdout-only when omitted."""
    import logging

    from etl_gamma_spark.cli import setup_logging

    log_file = tmp_path / "logs" / "run.log"
    setup_logging("INFO", str(log_file))
    try:
        logging.getLogger("etl_gamma_spark").info("file-and-stdout probe")
        for h in logging.getLogger().handlers:
            h.flush()
        body = log_file.read_text()
        assert body.count("file-and-stdout probe") == 1
        assert "INFO" in body
        # stdout handler still attached alongside the file handler
        kinds = {type(h).__name__ for h in logging.getLogger().handlers}
        assert kinds == {"StreamHandler", "FileHandler"}

        # omitted log_file -> stdout only, no file handler left behind
        setup_logging("INFO")
        kinds = {type(h).__name__ for h in logging.getLogger().handlers}
        assert kinds == {"StreamHandler"}
    finally:
        # detach the handlers bound to pytest's captured streams — a live
        # StreamHandler on a closed capture object makes py4j's shutdown
        # log line raise "--- Logging error ---" at interpreter exit
        logging.basicConfig(force=True, handlers=[logging.NullHandler()])


def test_cli_group_selector_runs_each_member(monkeypatch, tmp_path):
    # `comissao` must dispatch both fechamento pipelines (the documented
    # intent of run_etl.ps1's -Kpi groups, whose own dispatch falls
    # through); no real Spark work — record the dispatched names
    import etl_gamma_spark.cli as cli

    ran = []
    monkeypatch.setattr(
        cli, "run_pipeline", lambda spark, name, *a, **k: ran.append(name)
    )

    class _FakeSpark:
        def stop(self):
            pass

    import etl_gamma_spark.session as session

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: _FakeSpark())
    rc = cli.main(["comissao", "--out", str(tmp_path)])
    assert rc == 0
    assert ran == ["fechamento_m_presente", "fechamento_m_passado"]
