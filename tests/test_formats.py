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


def test_unknown_format_rejected(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    with pytest.raises(ValueError, match="unsupported format"):
        write_any(src, str(tmp_path / "x"), "avro")
