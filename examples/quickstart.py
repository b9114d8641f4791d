#!/usr/bin/env python3
"""Quickstart: using etl_gamma_spark as a library on your own tables.

Every pipeline is a pure function over DataFrames — point them at your
own gammadata-shaped inputs (sources/schemas.py documents the expected
columns) or at the bundled fixture model as below.

Run from the repo root: python examples/quickstart.py
"""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gamma_spark.model import register_model_views
from etl_gamma_spark.operators.dedup import exact_dedup_keep, minhash_lsh_pairs
from etl_gamma_spark.operators.responsibility import (
    client_farmer_periods,
    filter_by_responsibility,
)
from etl_gamma_spark.plans.fechamento import fechamento
from etl_gamma_spark.plans.receita_farmer_passado import receita_farmer_m_passado
from etl_gamma_spark.session import get_spark
from etl_gamma_spark.sources.sink import write_partition_overwrite

spark = get_spark("quickstart")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
register_model_views(spark, sf_dir)  # or createOrReplaceTempView your own tables

# 1. monthly revenue per farmer, trailing 11 closed months
revenue = receita_farmer_m_passado(
    spark.table("revenue_records_historical"),
    spark.table("clients"),
    spark.table("employees"),
    as_of=dt.date(2001, 6, 15),
)
revenue.show(5)

# 2. point-in-time responsibility scoping
periods = client_farmer_periods(spark.table("clients"), spark.table("client_transfers"))
scoped = filter_by_responsibility(
    spark.table("revenue_records_historical"), periods, "record_date", farmer_id=7
)
print("farmer 7 responsible-period fact rows:", scoped.count())

# 3. commission closing for a specific month
closing = fechamento(
    spark.table("positivador_historical"),
    spark.table("coe"),
    spark.table("operacoes_estruturadas"),
    spark.table("clients"),
    spark.table("employees"),
    spark.table("client_transfers"),
    spark.table("compensation"),
    as_of=dt.date(2024, 1, 30),
)
closing.select("farmer_name", "status_receita", "bonus_total").show(5)

# 4. corpus dedup + curation
docs = spark.table("documents")
print("docs after exact dedup:", exact_dedup_keep(docs).count())
print("near-dup candidate pairs:", minhash_lsh_pairs(docs).count())

from etl_gamma_spark.operators.dedup import chunk_dedup
from etl_gamma_spark.operators.quality import quality_prune

cleaned = chunk_dedup(docs)  # sub-document boilerplate removal
print(
    "chunk dedup kept",
    cleaned.selectExpr("sum(n_kept) k", "sum(n_chunks) n").first().asDict(),
)
print("top-half quality docs:", quality_prune(docs, keep_pct=50).count())

# 5. sketches, graph analytics, and data-ops over the same tables
from pyspark.sql import functions as F

from etl_gamma_spark.operators.sketch import cms_heavy_hitters, hll_distinct
from etl_gamma_spark.operators.stats import profile_table

events = spark.table("events")
hll_distinct(spark, events, "event_type", "user_id").show(5)
cms_heavy_hitters(events, "user_id", k=3).show()
profile_table(
    spark.table("orders").withColumn(
        "o_totalprice", F.round("o_totalprice", 2).cast("decimal(18,2)")
    ),
    ["o_orderkey", "o_orderstatus", "o_totalprice"],
).show(truncate=False)

# 6. idempotent month-partitioned sink
write_partition_overwrite(revenue, "/tmp/quickstart_out/receita_farmer", ["mes"])
print("written to /tmp/quickstart_out/receita_farmer")
spark.stop()
