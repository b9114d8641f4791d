#!/usr/bin/env python3
"""Round-count probe for the iterative CC family (VERDICT r9 item 4):
run neardup_clusters on the base corpus and on a scale_probe replica dir
and report wall + convergence rounds (per-round localCheckpoint count).

Usage: python tools/iter_probe.py [replica_dir ...]
Writes results to /tmp/iter_probe_r10.txt (tools file-output pattern).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/iter_probe_r10.txt"


def main() -> None:
    from etl_gamma_spark.io import load_table
    from etl_gamma_spark.operators.dedup import (
        minhash_lsh_pairs,
        neardup_clusters,
    )
    from etl_gamma_spark.session import get_spark

    dirs = sys.argv[1:] or [BASE]
    spark = get_spark("iter-probe")
    lines = [f"loadavg_start={os.getloadavg()}"]
    for d in dirs:
        docs = load_table(spark, d, "documents")
        pairs = minhash_lsh_pairs(docs).localCheckpoint()
        stats: dict = {}
        t0 = time.monotonic()
        neardup_clusters(docs, pairs, stats=stats).write.mode(
            "overwrite"
        ).format("noop").save()
        wall = round(time.monotonic() - t0, 2)
        lines.append(
            f"{d}: cc_wall={wall}s rounds={stats.get('rounds')} "
            f"n_pairs={pairs.count()}"
        )
    lines.append(f"loadavg_end={os.getloadavg()}")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
