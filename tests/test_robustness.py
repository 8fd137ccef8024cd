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


def test_cusum_randomized_differential(spark, tmp_path):
    """cusum_changepoint vs an independent pure-Python CUSUM over a
    seeded random event frame: per-type per-day cusum values and peak
    flags must agree exactly (the Spark path is decimal-exact, so the
    Python reference's integer arithmetic reproduces it bit-for-bit
    after the same single division + round)."""
    import datetime as dt

    import pandas as pd

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        cusum_changepoint,
    )

    rng = random.Random(20260814)
    rows = []
    base = dt.datetime(2026, 1, 1)
    for i in range(800):
        rows.append(
            (
                i,
                base + dt.timedelta(days=rng.randint(0, 20), seconds=rng.randint(0, 86399)),
                rng.randint(1, 50),
                rng.choice(["a", "b"]),
                round(rng.uniform(0, 500), 2),
                "{}",
            )
        )
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    got = cusum_changepoint(spark, str(tmp_path)).collect()

    daily: dict[tuple[str, dt.date], int] = {}
    for _, ts, _, et, v, _ in rows:
        daily[(et, ts.date())] = daily.get((et, ts.date()), 0) + round(v * 100)
    expected: dict[tuple[str, dt.date], tuple[float, bool]] = {}
    for et in {"a", "b"}:
        days = sorted(d for (t, d) in daily if t == et)
        xs = [daily[(et, d)] for d in days]
        n, total = len(xs), sum(xs)
        nums = []
        p = 0
        for t, x in enumerate(xs, start=1):
            p += x
            nums.append(n * p - t * total)
        peak = max(abs(v) for v in nums)
        for d, num in zip(days, nums):
            # unrounded single IEEE division of exact ints -- matches the
            # query's round-8 de-float (num/n emitted raw on both engines)
            expected[(et, d)] = (num / n, abs(num) == peak)
    assert len(got) == len(expected)
    for r in got:
        exp_c, exp_peak = expected[(r.event_type, r.day)]
        assert r.cusum_cents == exp_c, (r.event_type, r.day)
        assert r.is_peak == exp_peak


def test_welch_t_randomized_differential(spark, tmp_path):
    """welch_t_test vs an independent float computation from integer
    sufficient statistics on a seeded random frame: identical op order
    reproduces the unrounded t/df bit-exactly, and the exact decimal
    numerator columns match python's arbitrary-precision integers."""
    import datetime as dt
    import math

    import pandas as pd

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        welch_t_test,
    )

    rng = random.Random(99)
    rows = []
    base = dt.datetime(2026, 2, 1)
    for i in range(1200):
        rows.append(
            (
                i,
                base + dt.timedelta(seconds=rng.randint(0, 9_999_999)),
                1,
                rng.choice(["x", "y", "z"]),
                round(rng.uniform(0, 300), 2),
                "{}",
            )
        )
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    got = {r.event_type: r for r in welch_t_test(spark, str(tmp_path)).collect()}

    us = [int(ts.timestamp() * 1_000_000) for _, ts, *_ in rows]
    mid = (min(us) + max(us)) // 2
    stats: dict[str, list[int]] = {}
    for (_, ts, _, et, v, _), u in zip(rows, us):
        s = stats.setdefault(et, [0, 0, 0, 0, 0, 0])
        c = round(v * 100)
        if u <= mid:
            s[0] += 1
            s[1] += c
            s[2] += c * c
        else:
            s[3] += 1
            s[4] += c
            s[5] += c * c
    for et, (nb, sxb, sxxb, nc, sxc, sxxc) in stats.items():
        r = got[et]
        assert (r.n_b, r.n_c) == (nb, nc)
        mean_b, mean_c = sxb / nb, sxc / nc
        var_b = (nb * sxxb - sxb * sxb) / (nb * (nb - 1))
        var_c = (nc * sxxc - sxc * sxc) / (nc * (nc - 1))
        se_b, se_c = var_b / nb, var_c / nc
        t = (mean_b - mean_c) / math.sqrt(se_b + se_c)
        df = (se_b + se_c) * (se_b + se_c) / (
            se_b * se_b / (nb - 1) + se_c * se_c / (nc - 1)
        )
        assert r.t_stat == t and r.welch_df == df
        assert r.mean_shifted == (abs(t) > 1.96)
        # exact decimal companions restate the float chain's inputs
        assert int(r.mean_diff_num) == nc * sxb - nb * sxc
        assert int(r.var_num_b) == nb * sxxb - sxb * sxb
        assert int(r.var_num_c) == nc * sxxc - sxc * sxc
