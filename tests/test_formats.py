"""Round-trip every supported format against the parquet fixtures:
identical rows (including dates, timestamps, decimals-after-cast) must
come back through csv/json/orc with the parquet schema applied."""

import pytest

from etl_gamma_spark.io import load_table
from etl_gamma_spark.sources.formats import FORMATS, read_any, write_any
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("fmt", [f for f in FORMATS if f != "parquet"])
@pytest.mark.parametrize("table", ["nation", "orders", "events"])
def test_roundtrip(spark, tmp_path, fmt, table):
    src = load_table(spark, SF_SMOKE, table)
    path = str(tmp_path / f"{table}.{fmt}")
    write_any(src, path, fmt)
    back = read_any(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_csv_and_json_require_schema(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"n.{fmt}")
        write_any(src, path, fmt)
        with pytest.raises(ValueError, match="explicit schema"):
            read_any(spark, path, fmt)


def test_csv_null_vs_empty_string_roundtrip(spark, tmp_path):
    # Default Spark CSV writes NULL and '' as the same empty field and
    # reads both back as NULL. The \\N nullValue sentinel (ADVICE round 4)
    # must keep them distinct through a full write→read cycle.
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("s", StringType())]
    )
    src = spark.createDataFrame([(1, None), (2, ""), (3, "x")], schema)
    path = str(tmp_path / "ne.csv")
    write_any(src, path, "csv")
    back = read_any(spark, path, "csv", schema=schema)
    assert {r.id: r.s for r in back.collect()} == {1: None, 2: "", 3: "x"}


def test_unknown_format_rejected(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    with pytest.raises(ValueError, match="unsupported format"):
        write_any(src, str(tmp_path / "x"), "avro")


def test_quarantine_rejected_for_binary_formats(spark, tmp_path):
    # parquet/orc have no malformed-line concept; silently ignoring the
    # flag would fake dead-letter routing the caller believes exists
    p = tmp_path / "t"
    write_any(load_table(spark, SF_SMOKE, "nation"), str(p), "parquet")
    with pytest.raises(ValueError, match="quarantine"):
        read_any(spark, str(p), "parquet", quarantine=True)


def test_quarantine_captures_malformed_json_rows(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etl_gamma_spark.sources.formats import CORRUPT_COL, read_any

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": oops not json\n'
        '{"id": 3, "name": "fine"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = read_any(spark, str(p), "json", schema, quarantine=True).cache()
    try:
        good = df.filter(F.col(CORRUPT_COL).isNull())
        bad = df.filter(F.col(CORRUPT_COL).isNotNull())
        assert {r.id for r in good.collect()} == {1, 3}
        [row] = bad.collect()
        assert "oops" in row[CORRUPT_COL] and row.id is None
        # the caller's schema object must not have been mutated
        assert CORRUPT_COL not in schema.fieldNames()
    finally:
        df.unpersist()
    # default stays FAILFAST: the same file must raise
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_any(spark, str(p), "json", schema).collect()
