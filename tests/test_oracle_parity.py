"""Differential tests: every queries() entry vs its oracle_sql() at sf0.01.

This mirrors the driver's t2 correctness gate (BASELINE.md) so failures
surface locally first.
"""

import pytest

import __spark_entry__ as entry_mod
from etl_gamma_spark.testing.oracle import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    # non-SQL-expressible ops: the driver records a weaker rows-only check
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
