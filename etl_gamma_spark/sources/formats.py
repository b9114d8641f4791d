"""Format-agnostic readers/writers: parquet, ORC, CSV, JSON(-lines).

The fixture corpus is parquet, but an engine replacing the reference's
Postgres extracts (utils/db_connection.py in /root/reference) must ingest
whatever lands — exports are routinely CSV or JSON-lines. Policy:

* **Schema is always explicit.** ``inferSchema``/sampling costs a full
  extra pass over the data at 100 TB and infers unstable types across
  batches; callers pass a StructType (usually from ``sources.schemas`` or
  an existing table's ``.schema``). Malformed rows fail loudly
  (mode=FAILFAST) — silently nulled columns poison downstream money
  arithmetic.
* Text formats get explicit timestamp/date formats so a CSV written by
  this layer round-trips bit-identically through the session's UTC clock.
* Writers default to snappy parquet; CSV/JSON writers exist for export
  interop, not as the scale path (they lose types and compress worse —
  the docstring is the warning label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_DATE_FMT = "yyyy-MM-dd"


CORRUPT_COL = "_corrupt_record"


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
    quarantine: bool = False,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``. Self-describing formats (parquet/orc) may
    omit ``schema``; text formats (csv/json) REQUIRE it (see module
    policy).

    ``quarantine=True`` switches text formats from FAILFAST to PERMISSIVE
    with the raw malformed line captured in ``_corrupt_record`` — the
    dead-letter pattern: a 100 TB backfill should route bad records to a
    side sink (filter on the column) instead of dying at hour nine. The
    default stays FAILFAST: silently nulled columns poison money math.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if quarantine and fmt not in ("csv", "json"):
        # self-describing binary formats have no malformed-line concept;
        # silently ignoring the flag would leave a caller believing bad
        # records are routed to _corrupt_record when nothing is
        raise ValueError(
            f"quarantine=True applies only to text formats (csv/json), not {fmt!r}"
        )
    reader = spark.read
    text_mode = "PERMISSIVE" if quarantine else "FAILFAST"
    if fmt == "csv":
        if schema is None:
            raise ValueError("csv reads require an explicit schema (no inferSchema at scale)")
        # nullValue/emptyValue disambiguate NULL vs '' (by default Spark
        # writes both as an empty field and reads it back as NULL). The
        # \\N sentinel is the MySQL/Hive convention; a literal '\\N' field
        # value is the one residual ambiguity (reads back as NULL).
        reader = reader.options(
            header="true",
            mode=text_mode,
            timestampFormat=_TS_FMT,
            dateFormat=_DATE_FMT,
            nullValue="\\N",
            emptyValue="",
        )
    elif fmt == "json":
        if schema is None:
            raise ValueError("json reads require an explicit schema (no sampling pass at scale)")
        reader = reader.options(mode=text_mode, timestampFormat=_TS_FMT, dateFormat=_DATE_FMT)
    if quarantine and fmt in ("csv", "json"):
        from pyspark.sql.types import StringType, StructField, StructType

        if schema is not None and CORRUPT_COL not in schema.fieldNames():
            # fresh StructType — StructType.add mutates the caller's object
            schema = StructType(
                list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
            )
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return getattr(reader, fmt)(path)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options: str) -> None:
    """Write ``df`` to ``path`` in ``fmt``. CSV/JSON are export interop —
    they erase types (decimal→string on re-read without a schema) and are
    not the 100 TB storage path; parquet/orc are."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.options(
            header="true",
            timestampFormat=_TS_FMT,
            dateFormat=_DATE_FMT,
            nullValue="\\N",
        )
    elif fmt == "json":
        writer = writer.options(timestampFormat=_TS_FMT, dateFormat=_DATE_FMT)
    if options:
        writer = writer.options(**options)
    getattr(writer, fmt)(path)
