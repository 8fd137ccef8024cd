"""Partitioned-layout audit: directory pruning, static and dynamic.

Writes events hive-partitioned by event_date, then proves from the
physical plan (and the files actually read) that

* a literal date predicate becomes a ``PartitionFilters`` entry and the
  scan touches ONLY the matching directory (static pruning);
* a join against a filtered date dimension inserts a
  ``dynamicpruningexpression`` into the fact scan (DPP), so partition
  selection happens at runtime from the dim side;
* results through the partitioned layout equal the plain-table query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_on_google_cloud_platform_spark.sources import load_table
from mapreduce_on_google_cloud_platform_spark.sources.partitioned import (
    events_by_date,
    read_partitioned,
    write_partitioned,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_date")
    write_partitioned(events_by_date(spark, SF_SMOKE), path, ["event_date"])
    return path


PICK_DAY = "2024-01-05"


def test_static_pruning_in_plan_and_files(spark, events_path):
    df = read_partitioned(spark, events_path).filter(
        F.col("event_date") == PICK_DAY
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(event_date" in plan or "PartitionFilters" in plan
    # the partition predicate must NOT appear as a post-scan Filter
    assert "PushedFilters: []" in plan
    # execution-level proof: the files actually touched all come from the
    # one matching directory (inputFiles() reflects the PRE-pruning index,
    # so ask the executed rows instead)
    files = [
        r.f for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "pruned scan should still read the matching partition"
    assert all(f"event_date={PICK_DAY}" in f for f in files)
    # and the unpruned read sees many partitions
    all_files = read_partitioned(spark, events_path).inputFiles()
    assert len(set(all_files)) > len(set(files))


def test_partitioned_read_matches_plain_table(spark, events_path):
    via_layout = (
        read_partitioned(spark, events_path)
        .filter(F.col("event_date") == PICK_DAY)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        events_by_date(spark, SF_SMOKE)
        .filter(F.col("event_date") == PICK_DAY)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, via_layout.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_dynamic_partition_pruning_via_dim_join(spark, events_path, tmp_path):
    """A dim-side filter (no literal on the fact) must still prune: the
    fact scan's partition filters carry a dynamicpruning expression.

    Gotcha pinned by this test: Spark's PartitionPruning rule only fires
    for dim predicates its selectivity heuristic recognizes (comparisons,
    IN, LIKE...) — a bare boolean column (``filter(col("is_pick"))``) is
    NOT considered selective and silently disables DPP.  Hence the
    equality filter on a categorical dim attribute below."""
    fact = read_partitioned(spark, events_path)
    dim_path = str(tmp_path / "dates_dim")
    (
        fact.select("event_date")
        .distinct()
        .withColumn(
            "day_kind",
            F.when(F.col("event_date") == PICK_DAY, "pick").otherwise("other"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path)
    joined = fact.join(
        F.broadcast(dim.filter(F.col("day_kind") == "pick")), "event_date"
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # correctness of the pruned result
    expect = {
        (r.event_type, r.n)
        for r in fact.filter(F.col("event_date") == PICK_DAY)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r.event_type, r.n) for r in joined.collect()} == expect


def test_writer_one_file_per_partition(spark, events_path):
    """The repartition-before-write discipline: each date directory holds
    a single data file (no small-file explosion)."""
    from collections import Counter

    files = read_partitioned(spark, events_path).inputFiles()
    per_dir = Counter(f.rsplit("/", 1)[0] for f in files)
    assert per_dir and all(n == 1 for n in per_dir.values()), per_dir


def test_dynamic_partition_overwrite_touches_only_written_days(spark, tmp_path):
    """Rewriting one day with overwrite_partitions_dynamic must replace
    that directory and leave every other partition byte-identical -- the
    idempotent daily-backfill contract (a plain overwrite would wipe the
    table)."""
    from mapreduce_on_google_cloud_platform_spark.sources.partitioned import (
        events_by_date,
        overwrite_partitions_dynamic,
        read_partitioned,
        write_partitioned,
    )

    path = str(tmp_path / "events_by_date")
    ev = events_by_date(spark, SF_SMOKE)
    write_partitioned(ev, path, ["event_date"])

    day = ev.select(F.min("event_date").alias("d")).collect()[0].d
    before_other = (
        read_partitioned(spark, path).filter(F.col("event_date") != day).count()
    )

    # backfill: re-write ONE day with a marker mutation (value + 1000)
    patch = ev.filter(F.col("event_date") == day).withColumn(
        "value", F.col("value") + 1000
    )
    overwrite_partitions_dynamic(patch, path, ["event_date"])

    after = read_partitioned(spark, path)
    assert after.filter(F.col("event_date") != day).count() == before_other
    # the patched day fully replaced (all values carry the marker)
    assert (
        after.filter((F.col("event_date") == day) & (F.col("value") < 1000)).count()
        == 0
    )
    assert after.filter(F.col("event_date") == day).count() == patch.count()
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        != "dynamic"
    )


def test_compaction_shrinks_file_count_and_preserves_data(spark, tmp_path):
    """compact_partitions must collapse a fragmented layout (many small
    files per partition directory) to ~one file per directory while
    keeping the row multiset identical."""
    import glob

    from mapreduce_on_google_cloud_platform_spark.sources.partitioned import (
        compact_partitions,
        events_by_date,
        read_partitioned,
    )

    frag = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")
    ev = events_by_date(spark, SF_SMOKE)
    # deliberately fragment: 16 write tasks x every partition directory
    (
        ev.repartition(16)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(frag)
    )

    def nfiles(root):
        return len(glob.glob(f"{root}/event_date=*/part-*.parquet"))

    n_dirs = len(glob.glob(f"{frag}/event_date=*"))
    assert nfiles(frag) > 3 * n_dirs  # fragmentation actually happened

    compact_partitions(spark, frag, compacted, ["event_date"])
    assert nfiles(compacted) == n_dirs  # one full-size file per directory

    a = sorted(map(tuple, read_partitioned(spark, frag).collect()))
    b = sorted(map(tuple, read_partitioned(spark, compacted).collect()))
    assert a == b

    # the max_records knob re-splits oversized partitions
    resplit = str(tmp_path / "resplit")
    rows_per_dir = ev.count() // n_dirs
    compact_partitions(
        spark, frag, resplit, ["event_date"],
        max_records_per_file=max(1, rows_per_dir // 3),
    )
    assert nfiles(resplit) > n_dirs
    c = sorted(map(tuple, read_partitioned(spark, resplit).collect()))
    assert a == c
