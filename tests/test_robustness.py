"""Robustness checks: randomized tokenizer equivalence and error paths.

The tokenizer is the single most load-bearing shared expression (every
text operator and every DuckDB oracle builds on it), so beyond the fixed
FIXTURES.md cases it gets a randomized differential test: one seeded
corpus of adversarial strings, tokenized by Spark and by an independent
pure-Python implementation of the spec, must agree exactly.
"""

from __future__ import annotations

import random
import re
import string

import pytest
from pyspark.sql import functions as F

from mapreduce_on_google_cloud_platform_spark.functions.text import tokenize
from mapreduce_on_google_cloud_platform_spark.sources import load_table

ALPHABET = (
    string.ascii_letters
    + string.digits
    + string.punctuation
    + " \t\n\réß中Ж "  # accents, CJK, Cyrillic: must be stripped
)


def _pure_python_tokens(text: str) -> list[str]:
    out = []
    for tok in text.split():
        w = re.sub(r"[^0-9a-z]", "", tok.lower())
        if w:
            out.append(w)
    return out


def test_tokenizer_randomized_differential(spark):
    rng = random.Random(20260813)
    rows = []
    for i in range(300):
        n = rng.randint(0, 60)
        rows.append((i, "".join(rng.choice(ALPHABET) for _ in range(n))))
    # plus targeted edge shapes
    rows += [
        (1000, ""),
        (1001, "   "),
        (1002, "---"),
        (1003, "don't stop-me now_42"),
        (1004, "\tmixed\nwhite\r\nspace  runs"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: list(r.toks)
        for r in df.select("doc_id", tokenize(F.col("text")).alias("toks")).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _pure_python_tokens(text), (doc_id, text)


def test_unknown_table_raises_keyerror(spark):
    with pytest.raises(KeyError):
        load_table(spark, "/root/testdata/sf0.001", "nonexistent_table")


def test_missing_sf_dir_raises_cleanly(spark):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/sf_nope", "orders").collect()


@pytest.mark.parametrize(
    "name",
    [
        "kmeans_assign",
        "dedup_minhash_lsh",
        "quantile_summary",
        "q1_pricing_summary",
        # session additions most exposed to partitioning: window-merge
        # MERGE, broadcast-total thresholds, signature bucketing,
        # per-doc array reassembly, correlation components
        "merge_upsert_orders",
        "q11_revenue_concentration",
        "ann_lsh_multiprobe_topk",
        "vocab_encode_documents",
        "price_balance_correlation",
        # global-prefix-sum shard assignment and spine-window lags are the
        # most order-sensitive of the late additions
        "token_budget_packing",
        "lag_feature_matrix",
        "neardup_pagerank",
        # round 4: bucketed cosine pairs + fused-init label propagation
        "dedup_embedding_lsh",
        "q21_waiting_suppliers",
        "dedup_clusters",
        # round-4 curation additions: decimal log sums, fixed-point
        # codes, integer top-k ranking, full-outer CDC classification
        "geomean_event_value_exact",
        "text_repetition_filter",
        "embedding_quantize_int8",
        "ann_int8_topk",
        "snapshot_diff_orders",
        "corpus_mixture_sample",
        # triple partitionless ntile with explicit tie-breaks
        "customer_rfm_features",
        # round 5: decimal log-ratio sums over hashed feature buckets,
        # and the iterative merge sequence's total-order tie-break
        "dsir_importance_weights",
        "bpe_learn_merges",
        # round 5b: decimal entropy sums, integer ADC argmins + double
        # rerank, double BM25 trees + rank fusion, decayed decimal sums
        "text_char_entropy",
        "pq_adc_topk",
        "hybrid_search_rrf",
        "time_decayed_user_value",
        "repeated_passage_windows",
        # round 5c: the shared two-pass prefix sum (range assignment must
        # not leak into results) + ordered collect_list inside sequences
        "sequence_pack_tokens",
        "token_budget_packing",
        "dedup_cluster_survivors",
        "exact_substring_dedup",
        # round 5d/e: double-jaccard argmax tie-breaks, min/max(struct)
        # touch picks, set-join count metrics, decimal residual sums
        "incremental_minhash_admission",
        "purchase_attribution",
        "dedup_method_eval",
        "seasonality_adjusted_daily",
    ],
)
def test_shuffle_partition_invariance(spark, name):
    """SURVEY §5: results must be invariant to parallelism degrees.  The
    queries most exposed to execution-order effects (iterative argmin,
    LSH banding, exact quantiles, decimal money sums) must return
    identical rows under a different shuffle-partition count."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    base = sorted(tuple(r) for r in QUERIES[name](spark, sf).collect())
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        alt = sorted(tuple(r) for r in QUERIES[name](spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert base == alt


def test_release_caches_empties_the_plan_cache(spark):
    """THE CACHE CONTRACT (session.release_caches): operators may persist
    lazily-consumed intermediates (dedup signatures, normalized vectors,
    the packing range table), so a multi-query harness MUST be able to
    reclaim everything between queries.  Run the cache-heaviest families'
    representatives, then assert release_caches leaves the session's
    CacheManager empty -- an operator that acquires a cache the contract
    can't release fails here instead of leaking across a long session.
    (localCheckpoint storage is ContextCleaner-managed, not covered.)"""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.session import release_caches

    from .conftest import SF_SMOKE

    cache_heavy = [
        "dedup_minhash_lsh",
        "semantic_dedup_hybrid",
        "ann_lsh_topk",
        "kmeans_assign",
        "token_budget_packing",
        "repeated_passage_windows",
        # round-5c/d persist users: shingle streams, band/candidate
        # tables, the shared prefix-sum range table, PMI presence/top,
        # and the melted PQ LUT
        "dedup_containment",
        "dedup_minhash_stopshingle",
        "incremental_minhash_admission",
        "sequence_pack_tokens",
        "exact_substring_dedup",
        "term_pmi_pairs",
        "pq_adc_topk",
    ]
    touched_cache = 0
    for name in cache_heavy:
        QUERIES[name](spark, SF_SMOKE).write.format("noop").mode(
            "overwrite"
        ).save()
        cm = spark._jsparkSession.sharedState().cacheManager()
        touched_cache += 0 if cm.isEmpty() else 1
        release_caches(spark)
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), name
    # the selection must actually exercise the contract: at least one of
    # these queries left a cached plan behind before release
    assert touched_cache >= 1
