#!/usr/bin/env python3
"""Simulate the grading driver against __spark_entry__.py.

Creates a PLAIN SparkSession (no engine confs — exactly like the external
driver), runs entry() as the smoke check, then every queries() entry at
the given scale factor, comparing oracle-backed queries against DuckDB via
the canonicalizing comparator. This is the project's primary verification
surface (.claude/skills/verify/SKILL.md).

Usage: python tools/driver_sim.py [sf_dir]    (default /root/testdata/sf0.01)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from etl_gamma_spark.testing.oracle import compare

    t0 = time.monotonic()
    n = entry_mod.entry(spark).count()
    print(f"SMOKE entry: {n} rows", flush=True)
    assert n > 0

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for name in queries:
        try:
            if name in oracles:
                compare(queries[name](spark, sf), oracles[name], sf)
                print("MATCH", name, flush=True)
            else:
                c = queries[name](spark, sf).count()
                assert c > 0, f"{name}: empty result"
                print("rows-only", name, c, flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append(name)
            print("FAIL", name, str(ex)[:300], flush=True)
    print(
        f"DONE {len(queries)} queries, {len(oracles)} oracles, "
        f"fails={fails}, {time.monotonic() - t0:.0f}s",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
