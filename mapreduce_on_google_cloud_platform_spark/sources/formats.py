"""Interchange formats beyond parquet: ORC round-trip.

Parquet is the canonical at-rest format (TESTDATA.md); some lakes hand
over ORC instead.  Spark reads/writes ORC natively with the same
pushdown/pruning machinery as parquet (the scan reports PushedFilters
against the ORC reader), so supporting it is a writer/reader pair, not
an engine change.  Avro/Delta/Iceberg need external packages this
environment does not ship, so they are intentionally absent rather than
stubbed — a deployment adds the package and the same `spark.read`
pattern applies.

tests/test_formats.py pins: lossless round-trip of every column type in
the star schema (timestamps, doubles, strings, arrays of floats) and
predicate pushdown into the ORC scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an evolving schema as one DataFrame.

    ``mergeSchema`` unions the footers of every file: columns added in
    newer writes surface as nullable everywhere, older files null-fill
    them.  This is the long-lived-table reality at 100 TB -- a dataset
    written over months gains columns, and re-writing history to
    backfill is off the table.  Costs one footer read per file at
    planning (not a data scan); pushdown/pruning on common columns is
    unaffected (pinned in tests/test_formats.py)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
