"""CLI entry point — the reference's per-KPI ``main.py`` + ``run_etl.ps1``
dispatcher surface (SURVEY.md §3 entry point A) as one command.

Reference parity:
  * argparse flags --farmer-id / --months-back / --log-level
    (kpi_receita_farmer_m_passado/main.py:57-88);
  * extract→transform→load staging becomes plan→sink (lazy end-to-end);
  * logging to stdout + file (main.py:29-55);
  * exit code 0 on success / 1 on failure (main.py:137-146);
  * ``all`` runs every pipeline sequentially like run_etl.ps1:34-76 —
    except each pipeline is one Spark job graph, so "sequential" costs
    planning time only, not pandas wall-clock.

Additions over the reference: --as-of pins the clock (reproducible runs;
passing today reproduces reference behavior), --sf-dir / --out select
source fixtures and the output warehouse directory.

Usage:
    python -m etl_gamma_spark.cli receita_farmer_m_passado \
        --sf-dir /root/testdata/sf0.01 --out /tmp/warehouse \
        --as-of 2001-06-15 --months-back 11 [--farmer-id 7]
"""

from __future__ import annotations

import argparse
import datetime as dt
import logging
import os
import sys

from . import asof
from .registry import QUERIES, _ensure_model
from .sources.sink import stamp_audit, write_full_refresh, write_partition_overwrite

log = logging.getLogger("etl_gamma_spark")

PIPELINES = {
    # name -> (query key, partition columns for the idempotent sink).
    # Farmer-grain tables partition by (mes, farmer_id) so dynamic
    # partition overwrite reproduces the reference's delete-scopes exactly:
    # a farmer-scoped refresh replaces only that farmer's partitions and
    # leaves other farmers' rows in the same months intact (S4 scope b);
    # month-grain tables partition by mes (scopes a/d).
    "receita_farmer_m_passado": ("receita_farmer_m_passado", ["mes", "farmer_id"]),
    "receita_farmer_m_presente": ("receita_farmer_m_presente", ["mes"]),
    "receita_cliente": ("receita_cliente", ["mes"]),
    "receita_produto_f_m_passado": ("receita_produto_f_m_passado", ["mes", "farmer_id"]),
    "fechamento_m_presente": ("fechamento_m_presente", ["mes"]),
    "fechamento_m_passado": ("fechamento_m_passado", ["mes"]),
    # extension surface: the training-data curation composition (quality
    # gate → exact dedup → stratified sample), partitioned by language so
    # per-language refreshes replace only their partitions
    "curation": ("curation_pipeline", ["lang"]),
    # round-5 extensions: sub-document dedup produces a doc-grain cleaned
    # corpus; cdc_merge a keyed snapshot — neither is month/farmer-scoped,
    # so both refresh whole-table (partition_by None)
    "chunk_dedup": ("chunk_dedup", None),
    # round-8: exact-substring keep-first dedup (Lee et al. class) — the
    # stricter sub-document sibling, same doc-grain whole-table refresh
    "substring_dedup": ("substring_dedup", None),
    "cdc_merge": ("cdc_merge", None),
    # data-ops utilities: column profile and the expectation report are
    # the natural pre-load CLI steps (small whole-table outputs)
    "profile": ("profile_orders", None),
    "expectations": ("orders_expectations", None),
}

# KPI-group selectors. The reference's run_etl.ps1 documents group names
# ("receita_*", "comissao_farmer") in its -Kpi comment but its dispatch
# has no branches for them (any unknown value falls through to the
# m_passado default) — this implements the documented intent instead of
# the fall-through bug (divergence noted, SURVEY §3 pattern).
GROUPS = {
    "receita": [
        "receita_farmer_m_passado",
        "receita_farmer_m_presente",
        "receita_cliente",
        "receita_produto_f_m_passado",
    ],
    "comissao": ["fechamento_m_presente", "fechamento_m_passado"],
}


def setup_logging(level: str, log_file: str | None = None) -> None:
    """Configure stdout + optional file logging.

    Reference parity: kpi_*/main.py:29-55 attaches both a StreamHandler
    and a FileHandler so operators can tail the run live and keep an
    audit trail; ``log_file=None`` keeps the stdout-only behavior.
    """
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stdout)]
    if log_file:
        parent = os.path.dirname(os.path.abspath(log_file))
        os.makedirs(parent, exist_ok=True)
        handlers.append(logging.FileHandler(log_file, encoding="utf-8"))
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


def run_pipeline(spark, name: str, sf_dir: str, out_dir: str,
                 farmer_id: int | None, months_back: int, as_of: dt.date) -> int:
    from pyspark.sql import functions as F

    _ensure_model(spark, sf_dir)
    key, partition_by = PIPELINES[name]

    if name == "receita_farmer_m_passado":
        from .plans.receita_farmer_passado import receita_farmer_m_passado

        df = receita_farmer_m_passado(
            spark.table("revenue_records_historical"),
            spark.table("clients"),
            spark.table("employees"),
            as_of=as_of, months_back=months_back, farmer_id=farmer_id,
        )
    elif name == "receita_produto_f_m_passado":
        from .plans.receita_produto import receita_produto_f_m_passado

        df = receita_produto_f_m_passado(
            spark.table("revenue_records_historical"),
            spark.table("clients"),
            spark.table("employees"),
            as_of=as_of, months_back=months_back, farmer_id=farmer_id,
        )
    else:
        # presente/cliente/fechamento take no farmer/months CLI params in
        # this fixture-backed mode — reuse the registered plan
        df = QUERIES[key](spark, sf_dir)

    df = stamp_audit(df)
    target = os.path.join(out_dir, name)
    # write first, count the written files after: counting the plan before
    # the write would execute the whole job graph twice.
    # Scope selection mirrors the reference's S4 semantics: an unscoped run
    # replaces the WHOLE table (static — dynamic overwrite would keep stale
    # partitions from earlier, wider runs); a farmer-scoped run replaces
    # only that farmer's partitions (dynamic).
    if farmer_id is None or not partition_by:
        write_full_refresh(df, target, partition_by)
    else:
        write_partition_overwrite(df, target, partition_by)
    if not any(f.endswith(".parquet") for _, _, fs in os.walk(target) for f in fs):
        log.info("pipeline=%s table_rows=0 (empty scope) out=%s", name, target)
        return 0
    n_table = spark.read.parquet(target).count()
    log.info("pipeline=%s table_rows=%d out=%s", name, n_table, target)
    return n_table


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="etl_gamma_spark")
    parser.add_argument("pipeline", choices=[*PIPELINES, *GROUPS, "all"])
    parser.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    parser.add_argument("--out", default="/tmp/etl_gamma_warehouse")
    parser.add_argument("--farmer-id", type=int, default=None)
    parser.add_argument("--months-back", type=int, default=11)
    parser.add_argument("--as-of", type=dt.date.fromisoformat, default=asof.AS_OF_TPCH)
    parser.add_argument("--log-level", default="INFO")
    parser.add_argument(
        "--log-file",
        default=None,
        help="also append logs to this file (reference main.py logs to "
        "file+stdout); stdout-only when omitted",
    )
    args = parser.parse_args(argv)

    setup_logging(args.log_level, args.log_file)
    from .session import get_spark

    spark = get_spark("etl-gamma-cli")
    try:
        if args.pipeline == "all":
            names = list(PIPELINES)
        elif args.pipeline in GROUPS:
            names = GROUPS[args.pipeline]
        else:
            names = [args.pipeline]
        for name in names:
            run_pipeline(
                spark, name, args.sf_dir, args.out,
                args.farmer_id, args.months_back, args.as_of,
            )
        return 0
    except Exception:
        log.exception("pipeline failed")
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
