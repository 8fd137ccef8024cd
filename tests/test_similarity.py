from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
    K_NEIGHBORS,
    QUERY_STRIDE,
    SIMILARITY_QUERIES,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in SIMILARITY_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_bruteforce_topk_shape(spark):
    df = QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE)
    rows = df.collect()
    n_queries = len({r.q_id for r in rows})
    assert n_queries > 0
    # every query gets exactly K neighbors (corpus is bigger than K)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, K_NEIGHBORS + 1)), q


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with NPROBE=2 is approximate; recall@10 should still be
    meaningfully above random (sanity that the pruning isn't nonsense)."""
    brute = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    ivf = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_ivf_topk"](spark, SF_SMOKE).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall > 0.2, f"IVF recall@{K_NEIGHBORS} suspiciously low: {recall:.2f}"
