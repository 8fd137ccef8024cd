"""Index-store (round 10) pins: the materialized probe tables must be
row-identical to the from-raw pipelines they replace, and the store must
invalidate itself when the source dataset changes."""

from __future__ import annotations

import os

from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
    dedup_clusters,
    dedup_minhash_lsh,
    neardup_pairs_indexed,
    simhash_clusters_indexed,
)
from mapreduce_on_google_cloud_platform_spark.sources.index_store import (
    index_path,
    materialized,
)

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_neardup_pairs_index_matches_from_raw(spark):
    """The store builds the verified pair table from the UNRESTRICTED
    exact pair index (cand join full-jaccard) while dedup_minhash_lsh
    verifies over candidate-restricted shingles -- the two must be
    row-identical (pair stats depend only on the two docs' own sets)."""
    assert _rows(neardup_pairs_indexed(spark, SF_SMOKE)) == _rows(
        dedup_minhash_lsh(spark, SF_SMOKE)
    )


def test_simhash_clusters_index_matches_from_raw(spark):
    assert _rows(simhash_clusters_indexed(spark, SF_SMOKE)) == _rows(
        dedup_clusters(spark, SF_SMOKE)
    )


def test_store_path_tracks_dataset_fingerprint(tmp_path, spark):
    """Regenerated source data (mtime/size change) must change the store
    path, so a stale index can never be served across driver rounds."""
    import shutil

    src = str(tmp_path / "sfX")
    shutil.copytree(SF_SMOKE, src)
    p1 = index_path(src, "shingles", "v1")
    os.utime(
        os.path.join(src, "documents.parquet"), ns=(1_000_000_000, 1_000_000_000)
    )
    p2 = index_path(src, "shingles", "v1")
    assert p1 != p2


def test_fingerprint_sees_nested_directory_mutations(tmp_path):
    """A directory-layout table (partitioned parquet dir) keeps the
    top-level dir's size stable when an inner part-file changes -- the
    fingerprint must recurse so the mutation still rotates the store
    path (VERDICT r10 item #5)."""
    src = tmp_path / "sfY"
    inner = src / "events.parquet" / "day=2024-01-01"
    inner.mkdir(parents=True)
    part = inner / "part-000.parquet"
    part.write_bytes(b"aaaa")
    p1 = index_path(str(src), "shingles", "v1")
    # mutate ONLY the nested file (content + mtime); top-level unchanged
    part.write_bytes(b"bbbbbb")
    os.utime(part, ns=(2_000_000_000, 2_000_000_000))
    os.utime(src / "events.parquet", ns=(1_000_000_000, 1_000_000_000))
    os.utime(src, ns=(1_000_000_000, 1_000_000_000))
    p2 = index_path(str(src), "shingles", "v1")
    assert p1 != p2


def test_materialized_builds_once_and_rereads(tmp_path, spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "store"))
    calls = []

    def build(s, d):
        calls.append(d)
        return s.range(5).selectExpr("id AS v")

    df1 = materialized(spark, SF_SMOKE, "probe_test", "v1", build)
    df2 = materialized(spark, SF_SMOKE, "probe_test", "v1", build)
    assert len(calls) == 1  # second call served from parquet
    assert _rows(df1) == _rows(df2) == [(i,) for i in range(5)]
    # a version bump forces a rebuild
    materialized(spark, SF_SMOKE, "probe_test", "v2", build)
    assert len(calls) == 2
