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
    io.py         testdata readers (incl. ns-timestamp workaround)
    model.py      gammadata-shaped semantic model — shared Spark/DuckDB SQL
    rates.py      commission constants (reference parity)
    asof.py       fixed as_of clocks (replaces the reference's NOW())
    functions/    calendar / money / text column helpers
    operators/    snapshots, responsibility intervals, dedup, similarity
    plans/        the six reference pipelines as pure DataFrame functions
    sources/      sink layer (idempotent delete-scope overwrite), jdbc stub
    streaming/    Structured Streaming incrementalization of the rollup
    testing/      DuckDB differential-oracle harness (mirrors the driver)
"""

__version__ = "0.1.0"
