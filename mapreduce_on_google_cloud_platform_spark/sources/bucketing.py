"""Bucketed table layout: pre-shuffled storage for exchange-free joins.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem) is
shuffling both sides on the join key on EVERY query.  Bucketing moves
that shuffle to write time, once: both tables are hash-partitioned into
the same number of buckets on the join key as they are written, so any
later equi-join (or groupBy) on that key reads co-located buckets and
plans with NO Exchange on either side -- asserted in
tests/test_bucketing.py.

Spark specifics encoded here:

* both sides must bucket on the same key with the same bucket count
  (bucket b of one table joins only bucket b of the other);
* ``sortBy`` within buckets lets the join skip its per-task sort too
  (plan shows SortMergeJoin whose children have neither Exchange nor
  Sort);
* bucketed tables must go through ``saveAsTable`` (the catalog carries
  the bucket metadata; a bare ``.parquet(path)`` write silently drops
  it);
* bucket count is a layout decision: pick so one bucket of the LARGER
  table fits an executor's task comfortably (e.g. 100 TB lineitem /
  4096 buckets ~ 25 GB per bucket -> split further by row-group within
  the scan).  Too few buckets caps join parallelism at write-time
  choices; AQE cannot re-split a bucketed scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    bucket-sorted) on ``bucket_cols``.  ``path`` makes it an external
    table (bucket metadata still lives in the catalog), pinning the
    files independent of the session's warehouse dir."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
