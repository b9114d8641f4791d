#!/usr/bin/env python3
"""Dump .explain("formatted") for registered queries into plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [query ...]
  tag    subdirectory under plans/ (e.g. r12); files land as
         plans/<tag>/<query>_<suffix>.txt with suffix from
         SPARK_GRAFT_PLAN_SUFFIX (default "before").

With no query names, dumps every registered query. Carriers with eager
side effects (index writes) run their jobs during plan construction —
that is inherent to capturing their real probe-side plan.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gamma_spark.registry import QUERIES  # noqa: E402
from etl_gamma_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    names = sys.argv[2:] or list(QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("etl-gamma-plan-dump")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(plan + "\n")
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
