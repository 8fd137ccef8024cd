"""Bucketed-layout audit: the join that never shuffles.

Writes orders and lineitem bucketed on the join key, then asserts the
equi-join plan contains NO Exchange on either side (the whole point of
bucketing: the shuffle happened once, at write time) and that results
are identical to the plain join.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mapreduce_on_google_cloud_platform_spark.sources import load_table
from mapreduce_on_google_cloud_platform_spark.sources.bucketing import (
    drop_table,
    write_bucketed,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def bucketed_pair(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield orders, lineitem
    drop_table(spark, "orders_b")
    drop_table(spark, "lineitem_b")


def _joined(spark):
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    return o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev"),
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    # broadcast would hide the point at this tiny SF (the small side just
    # ships whole); force the fact-fact shape bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # the only exchange allowed is the aggregation's (on o_orderpriority);
    # neither join side may shuffle on the join key
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(col.startswith("o_orderpriority") for col in exchanges), exchanges


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    orders, lineitem = bucketed_pair
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )
    got = {(r.o_orderpriority, r.n, r.rev) for r in _joined(spark).collect()}
    want = {(r.o_orderpriority, r.n, r.rev) for r in plain.collect()}
    assert got == want


def test_compaction_file_count_and_pruning_layout(spark, tmp_path):
    """Compaction must hit the computed file count, preserve every row, and
    (with sort_col) give each file a disjoint key range so min/max stats
    prune."""
    import glob

    from mapreduce_on_google_cloud_platform_spark.sources.compaction import compact

    src = f"{SF_SMOKE}/lineitem.parquet"
    dst = str(tmp_path / "lineitem_compacted")
    # force a multi-file layout with a tiny target
    n = compact(spark, src, dst, target_bytes=64 * 1024, sort_col="l_orderkey")
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n > 1

    orig = spark.read.parquet(src)
    comp = spark.read.parquet(dst)
    assert comp.count() == orig.count()

    # disjoint ranges: per-file min/max of the sort key must not overlap
    from pyspark.sql import functions as F

    ranges = sorted(
        (r.lo, r.hi)
        for r in comp.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
