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


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which the vectorized
    parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).  Read nanos as raw int64
    and truncate to microseconds -- the same resolution DuckDB reads the
    column at, so event-time results stay oracle-comparable."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views, so SQL-string queries read identically)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
