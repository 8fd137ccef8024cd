"""Table loaders for the testdata star schema.

The reference's only source is a multi-file UTF-8 text scan performed
single-threaded on the master (``/root/reference/master.py:54-64`` -- its
#1 scalability anti-pattern). Here every source is a distributed
columnar scan: ``spark.read.parquet`` plans splits per file/row-group, so
a 100 TB table fans out across all executors with predicate pushdown and
column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region is 5 rows, nation 25 at every SF; supplier/part grow slowly).
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to TIMESTAMP whatever the parquet stored.

    Testdata generations have stored ``ts`` three ways: TIMESTAMP(NANOS)
    (which Spark's vectorized reader either rejects or, with
    ``spark.sql.legacy.parquet.nanosAsLong``, surfaces as raw int64 nanos),
    plain ``timestamp[us]`` surfacing as TIMESTAMP_NTZ, and
    timezone-adjusted ``timestamp[us, UTC]`` surfacing as TIMESTAMP.
    Branch on what the scan actually produced instead of assuming an
    encoding; works for batch and streaming DataFrames alike (pure column
    expressions, no action).  The NTZ->TIMESTAMP cast is value-identical
    under the session's pinned UTC timezone (session.py), matching the
    naive timestamps DuckDB reads from the same file."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, TimestampType):
        return df
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    if isinstance(ts_type, LongType):
        # legacy nanos-as-int64: truncate to micros, the resolution DuckDB
        # reads at, so event-time results stay oracle-comparable
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raise TypeError(
        f"events.ts has unsupported parquet type {ts_type}; expected a "
        "timestamp or int64-nanos column"
    )


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive loader for the ``events`` table (see
    ``normalize_events_ts``)."""
    # Keep the legacy conf on so a nanos-encoded file reads as int64 instead
    # of failing the scan outright; it is a no-op for timestamp[us] files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_events_ts(spark.read.parquet(table_path(sf_dir, "events")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views, so SQL-string queries read identically)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
