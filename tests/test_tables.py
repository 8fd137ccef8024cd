"""Loader-level schema contracts.

These exist so a testdata regeneration that changes a parquet encoding
fails ONE loud loader test instead of every downstream operator suite
(the round-3 failure mode: ``events.ts`` flipped from TIMESTAMP(NANOS)
to ``timestamp[us]`` and 83 tests died on the stale conversion).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from mapreduce_on_google_cloud_platform_spark.sources import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_events_ts_is_timestamp_regardless_of_encoding(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, (TimestampType, TimestampNTZType)), (
        f"events.ts must load as a timestamp, got {ts_type}; "
        "_load_events needs a branch for this parquet encoding"
    )
    # The column must also be usable: event-time arithmetic analyzes and
    # produces sane epoch-era values (not 1970-adjacent nanos misreads).
    row = df.selectExpr(
        "min(year(ts)) AS lo", "max(year(ts)) AS hi", "count(*) AS n"
    ).first()
    assert row["n"] > 0
    assert 2000 <= row["lo"] <= row["hi"] <= 2100


def test_events_nanos_int64_branch_converts(spark, tmp_path):
    """The legacy branch (ts stored as int64 epoch-nanos) still converts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nanos = [1_700_000_000_000_000_000, 1_700_000_123_456_789_000]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(nanos, type=pa.int64()),
        }
    )
    sf_dir = tmp_path / "sfx"
    sf_dir.mkdir()
    pq.write_table(tbl, sf_dir / "events.parquet")

    df = load_table(spark, str(sf_dir), "events")
    assert isinstance(
        df.schema["ts"].dataType, (TimestampType, TimestampNTZType)
    )
    got = [r["us"] for r in df.selectExpr("unix_micros(ts) AS us").collect()]
    assert sorted(got) == sorted(n // 1000 for n in nanos)


def test_all_tables_load_and_are_nonempty(spark):
    from mapreduce_on_google_cloud_platform_spark.sources.tables import TABLES

    for name in TABLES:
        df = load_table(spark, SF_SMOKE, name)
        assert len(df.columns) > 0, name
        assert df.limit(1).count() == 1, f"{name} is empty"
