#!/usr/bin/env python3
"""Subset oracle check: driver_sim's comparison loop for NAMED queries only
(fast inner-loop verification while optimizing; the full driver_sim pass
stays the commit gate).

Usage: python tools/oracle_check.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    if not args:
        print("usage: oracle_check.py [--sf DIR] query [query ...]")
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from etl_gamma_spark.testing.oracle import compare

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for name in args:
        t0 = time.monotonic()
        try:
            if name in oracles:
                compare(queries[name](spark, sf), oracles[name], sf)
                print(f"MATCH {name} ({time.monotonic() - t0:.1f}s)", flush=True)
            else:
                c = queries[name](spark, sf).count()
                assert c > 0, f"{name}: empty result"
                print(f"rows-only {name} {c} ({time.monotonic() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print("FAIL", name, str(ex)[:300], flush=True)
    print(f"DONE fails={fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
