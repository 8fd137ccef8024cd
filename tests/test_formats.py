"""ORC round-trip: lossless for every schema type, pushdown intact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_on_google_cloud_platform_spark.sources import load_table
from mapreduce_on_google_cloud_platform_spark.sources.formats import (
    read_orc,
    write_orc,
)

from .conftest import SF_SMOKE


@pytest.mark.parametrize("table", ["events", "embeddings", "orders"])
def test_orc_round_trip_lossless(spark, table, tmp_path):
    """Timestamps, doubles, strings, float arrays must survive
    parquet -> ORC -> read unchanged."""
    src = load_table(spark, SF_SMOKE, table)
    path = str(tmp_path / f"{table}_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    a = sorted(map(str, src.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b


def test_orc_scan_pushes_predicates(spark, tmp_path):
    path = str(tmp_path / "orders_orc")
    write_orc(load_table(spark, SF_SMOKE, "orders"), path)
    df = read_orc(spark, path).filter(F.col("o_totalprice") > 100000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]
    # column pruning: only the two selected columns in ReadSchema
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_orderpriority" not in read_schema


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A table written under an evolving schema reads as one DataFrame:
    new columns are null-filled for old files, and predicate pushdown on
    a common column still reaches every scan."""
    from mapreduce_on_google_cloud_platform_spark.sources.formats import (
        read_parquet_evolved,
    )

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.select("o_orderkey", "o_custkey").write.parquet(v1)
    orders.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.parquet(v2)

    merged = read_parquet_evolved(spark, v1, v2)
    assert set(merged.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}

    n_orders = orders.count()
    assert merged.count() == 2 * n_orders
    # old files null-fill the evolved column; new files carry it
    assert merged.filter(F.col("o_totalprice").isNull()).count() == n_orders

    # pushdown on a common column survives schema merging
    plan = (
        merged.filter(F.col("o_orderkey") == 1)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "EqualTo(o_orderkey,1)" in plan


def test_range_sorted_layout_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted must produce files whose sort-column ranges are
    DISJOINT (so min/max footer stats skip whole files for range
    predicates), and a range filter must still push into the scan."""
    import pyarrow.parquet as pq

    from mapreduce_on_google_cloud_platform_spark.sources.sorted_layout import (
        read_sorted,
        write_range_sorted,
    )

    out = str(tmp_path / "li_sorted")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_range_sorted(li, out, "l_shipdate", n_files=4)

    import glob

    ranges = []
    for f in sorted(glob.glob(f"{out}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_shipdate")
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) >= 3  # range partitioner may merge tiny ranges
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"

    # round-trip completeness + pushdown on the sort column
    back = read_sorted(spark, out)
    assert back.count() == li.count()
    plan = (
        back.filter(F.col("l_shipdate") >= "1999-01-01")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """The Morton-clustered layout must (a) round-trip completely,
    (b) give NARROW per-file footer ranges on BOTH curve columns, so a
    predicate on the SECOND column skips files -- which the
    single-column range-sorted layout structurally cannot do (every
    x-sorted file spans the full y range)."""
    import glob

    import pyarrow.parquet as pq

    from mapreduce_on_google_cloud_platform_spark.sources.sorted_layout import (
        write_range_sorted,
    )
    from mapreduce_on_google_cloud_platform_spark.sources.zorder import (
        read_zordered,
        write_zordered,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zout = str(tmp_path / "li_z")
    sout = str(tmp_path / "li_sorted")
    write_zordered(li, zout, "l_partkey", "l_suppkey", n_files=16)
    write_range_sorted(li, sout, "l_partkey", n_files=16)

    def file_ranges(path, col):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    back = read_zordered(spark, zout)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)

    # y-only box predicate: bottom ~1/4 of the l_suppkey range
    sy = sorted(r.l_suppkey for r in li.select("l_suppkey").collect())
    y_lo, y_hi = sy[0], sy[len(sy) // 4]

    def files_hit(ranges):
        return sum(1 for lo, hi in ranges if not (hi < y_lo or lo > y_hi))

    z_hit = files_hit(file_ranges(zout, "l_suppkey"))
    s_hit = files_hit(file_ranges(sout, "l_suppkey"))
    z_total = len(file_ranges(zout, "l_suppkey"))
    s_total = len(file_ranges(sout, "l_suppkey"))
    # the x-sorted layout cannot skip on y: every file overlaps the box
    assert s_hit == s_total
    # the z-ordered layout must skip a meaningful fraction on y alone
    assert z_hit <= z_total * 0.75, (z_hit, z_total)
    # and it still skips on x too (clustered, if coarser than pure sort)
    sx = sorted(r.l_partkey for r in li.select("l_partkey").collect())
    x_lo, x_hi = sx[0], sx[len(sx) // 4]
    zx = sum(
        1
        for lo, hi in file_ranges(zout, "l_partkey")
        if not (hi < x_lo or lo > x_hi)
    )
    assert zx <= z_total * 0.75, (zx, z_total)


def test_zorder_interleave_matches_python_reference(spark):
    """The JVM bit-interleave must agree with an independent pure-python
    Morton encoding on a grid of values (bijectivity + bit placement)."""
    from mapreduce_on_google_cloud_platform_spark.sources.zorder import zvalue

    def morton(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    vals = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(vals, "x int, y int").select(
        "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")
    )
    got = {(r.x, r.y): r.z for r in df.collect()}
    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)
    assert len(set(got.values())) == len(got)  # injective on the grid
