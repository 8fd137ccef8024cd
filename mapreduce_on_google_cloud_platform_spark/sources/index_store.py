"""Per-scale-factor materialized intermediates: index once, probe many.

Round 10 (VERDICT r9 item #3).  The heavy dedup/ANN/k-means queries all
share a small set of expensive deterministic intermediates -- the shingle
set, the MinHash signature/band table, the verified near-dup pair table,
the fixed-point embedding grid, LSH signatures, PQ codes, the k-means
assignment.  Rebuilt from raw inside every query they dominated the
bench floor (25 queries > 4 s at sf0.1, all one family); at 100 TB the
correct architecture is the classic index-build / probe separation: the
intermediate is materialized ONCE per dataset as a persisted columnar
table and every downstream query starts from the parquet scan (with
pushdown + pruning), exactly like a production search/dedup system keeps
its signature and posting tables beside the corpus.

``materialized`` is the whole mechanism: read the table if it exists,
else build it with the supplied builder, write atomically (tmp dir +
rename; a concurrent builder losing the race just discards its copy),
and read back.  Correctness is unaffected -- every materialized table is
a deterministic exact function of the raw tables (integer/md5/fixed-point
arithmetic; doubles round-trip parquet bit-exactly), and each family
keeps one end-to-end-from-raw variant whose oracle checks the full
pipeline.  ``version`` participates in the path: bump it when a
builder's semantics change so stale tables can never be served.

The store lives under the (gitignored) ``spark-warehouse/index_store``
unless ``SPARK_GRAFT_INDEX_DIR`` overrides it, keyed by the sf_dir
basename PLUS a fingerprint of the source parquet files (size + mtime of
every table file): the checkout -- and with it the store -- persists
across rounds while the round driver REGENERATES ``/root/testdata``, so
without the fingerprint a stale index could silently serve last round's
data.  A regenerated dataset changes the fingerprint, which changes the
path, which forces a rebuild.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _store_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(_REPO_ROOT, "spark-warehouse", "index_store"),
    )


def _dataset_fingerprint(sf_dir: str) -> str:
    """Stable token for the dataset's current contents: (relative path,
    size, mtime_ns) of every file under sf_dir -- RECURSIVELY, so a
    directory-layout table (e.g. a partitioned ``events.parquet/`` dir)
    can't serve a stale index after only its inner part-files change
    (VERDICT r10 item #5) -- hashed.  Regeneration by the round driver
    changes mtimes, so stale indexes become unreachable."""
    h = hashlib.md5()
    try:
        for root, dirs, files in os.walk(sf_dir):
            dirs.sort()  # deterministic walk order
            rel_root = os.path.relpath(root, sf_dir)
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                rel = fn if rel_root == "." else os.path.join(rel_root, fn)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    except OSError:
        pass  # nonexistent sf_dir: the builder's scan will raise cleanly
    return h.hexdigest()[:12]


def index_path(sf_dir: str, name: str, version: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = _dataset_fingerprint(sf_dir)
    return os.path.join(_store_root(), f"{tag}-{fp}", f"{name}.{version}")


# per-process log of index paths this process actually BUILT (vs read):
# lets build_all_indexes report cold builds vs warm reuse honestly
_BUILD_LOG: list[str] = []


def materialized(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    version: str,
    build,
) -> DataFrame:
    """Return the materialized intermediate ``name`` for ``sf_dir``,
    building it via ``build(spark, sf_dir) -> DataFrame`` on first use."""
    from ..session import default_parallelism

    path = index_path(sf_dir, name, version)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.tmp.{os.getpid()}"
        # Write the index round-robin across default_parallelism part
        # files (optimization round 12): small builds otherwise land in
        # ONE parquet file / one row group, and every probe query that
        # scans the table inherits a single-task scan for its whole
        # pre-shuffle pipeline (measured: the PQ/ANN probe family ran
        # its 64-wide integer arithmetic on one core).  The fan-out is
        # derived from the session's core count, not a constant, so a
        # cluster build spreads the same way; values are unaffected
        # (every consumer is pinned order-independent by the two-layout
        # stability sweeps).
        build(spark, sf_dir).repartition(default_parallelism()).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(tmp, path)
        except OSError:
            # a concurrent builder won the rename race; both copies are
            # deterministic functions of the same input -- discard ours
            shutil.rmtree(tmp, ignore_errors=True)
        _BUILD_LOG.append(path)
    return spark.read.parquet(path)


def drop_index(sf_dir: str, name: str, version: str) -> None:
    """Test hook: force the next ``materialized`` call to rebuild."""
    shutil.rmtree(index_path(sf_dir, name, version), ignore_errors=True)


def build_all_indexes(spark: SparkSession, sf_dir: str) -> dict:
    """Build (or verify) every declared index table for ``sf_dir`` --
    the explicit index-build phase of the index/probe split.  bench.py
    runs and times this BEFORE the query trials so probe timings measure
    serving cost and the one-time build is reported separately (at 100 TB
    this is the scheduled indexing job, not part of any query).

    Returns {"built": [...], "reused": [...]} so a bench record shows
    honestly whether its index-build time was a cold build or a warm
    existence check of tables persisted by an earlier run."""
    from ..operators import dedup, similarity

    accessors = [
        dedup.shingles_indexed,
        dedup.minhash_sig_indexed,
        dedup.jaccard_pairs_indexed,
        dedup.neardup_pairs_indexed,
        dedup.simhash_pairs_indexed,
        dedup.simhash_clusters_indexed,
        similarity.emb_norm_indexed,
        similarity.lsh_sig_indexed,
        similarity.pq_vectors_indexed,
        similarity.pq_codes_indexed,
        similarity.pq_coarse_assign_indexed,
        similarity.pq_residuals_indexed,
        similarity.pq_res_codes_indexed,
        similarity.ivf_assign_indexed,
        similarity.ann_truth_indexed,
        similarity.ivf_topk_indexed,
        similarity.knn_edges_indexed,
        similarity.kmeans_assign_indexed,
    ]
    built, reused = [], []
    for fn in accessors:
        before = len(_BUILD_LOG)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (built if len(_BUILD_LOG) > before else reused).append(fn.__name__)
    return {"built": built, "reused": reused}
