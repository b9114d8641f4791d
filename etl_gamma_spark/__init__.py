"""etl_gamma_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL system (gui-montanari/
ETL-Gamma), re-expressed Spark-first.

The reference (surveyed in SURVEY.md) is a batch KPI/ETL system: monthly
revenue and commission rollups per farmer/client/product plus a commission
closing with target/bonus logic, built on SQL-pushdown-to-Postgres + pandas.
This package reproduces every operator in SURVEY.md §2 as lazy DataFrame
plans (Catalyst optimizes; Tungsten executes), adds idempotent Parquet
sinks, and extends the surface with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session.py    SparkSession factory (local + cluster-shaped confs)
    io.py         testdata readers (incl. ns-timestamp workaround) + the
                  shared streaming events reader
    model.py      gammadata-shaped semantic model — shared Spark/DuckDB SQL
    registry.py   every query + its DuckDB oracle (driver contract backend)
    rates.py      commission constants (reference parity)
    asof.py       fixed as_of clocks (replaces the reference's NOW())
    cli.py        per-pipeline CLI (reference main.py/run_etl dispatcher)
    functions/    calendar / text expression generators / diagnostics
    operators/    snapshots, responsibility intervals, dedup (exact /
                  MinHash+LSH / SimHash / Jaccard / CC clustering),
                  similarity (top-k, kNN, SRP-LSH, IVF, near-dup pairs),
                  temporal (as-of join, sessionize, top-k per group),
                  skew (salted agg/join), multimodal (Arrow kernels)
    plans/        the six reference pipelines as pure DataFrame functions
    sources/      sinks (4 delete-scopes, merge upsert), schemas, catalog
                  evolution, bucketing, gated JDBC, data-quality rules
    streaming/    rollup / watermarked windows / session windows /
                  stateful dedup / foreachBatch-to-sink
    testing/      DuckDB differential-oracle harness (mirrors the driver)
"""

__version__ = "0.1.0"
