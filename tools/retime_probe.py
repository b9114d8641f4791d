#!/usr/bin/env python3
"""Isolated retime of suspect queries (repo round-5 rule: two clean passes,
loadavg < 2, min reported). Writes results to /tmp/retime_r10.txt.

Usage: python tools/retime_probe.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gamma_spark.registry import QUERIES  # noqa: E402
from etl_gamma_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_RETIME_OUT", "/tmp/retime_r10.txt")


def main() -> None:
    names = sys.argv[1:] or ["cluster_prune", "dsir_weights"]
    spark = get_spark("etl-gamma-retime")
    lines = [f"loadavg_start={os.getloadavg()}"]
    # warmup: flagship + worker pool spin-up, matching bench.py
    QUERIES["receita_farmer_m_passado"](spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()
    for name in names:
        times = []
        for _ in range(2):
            t0 = time.monotonic()
            QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.monotonic() - t0, 3))
        lines.append(f"{name}: runs={times} min={min(times)}")
    lines.append(f"loadavg_end={os.getloadavg()}")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
