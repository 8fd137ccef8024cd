from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
    DEDUP_QUERIES,
    HAMMING_MAX,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in DEDUP_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_near_dup_results_non_trivial(spark):
    """Thresholds were chosen so the synthetic corpus actually produces
    near-dup pairs -- guard against a trivially-empty (hence trivially
    matching) check."""
    assert QUERIES["dedup_ngram_jaccard"](spark, SF_ORACLE).count() > 0
    assert QUERIES["dedup_embedding_pairs"](spark, SF_ORACLE).count() > 0


def test_minhash_is_subset_of_exact_jaccard(spark):
    """LSH output must be a subset of the exact-Jaccard pairs (banding can
    only lose candidates, never invent similarity)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    assert lsh <= exact


def test_simhash_band_join_recall_exact(spark):
    """The 8x4-bit band join must find EVERY pair at hamming <= HAMMING_MAX
    (pigeonhole guarantee) -- compare against brute force in Spark."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        _simhash_signatures,
    )

    sig = _simhash_signatures(spark, SF_SMOKE)
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r.doc_a, r.doc_b)
        for r in (
            a.crossJoin(b)
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= HAMMING_MAX)
            .collect()
        )
    }
    banded = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["simhash_near_pairs"](spark, SF_SMOKE).collect()
    }
    assert banded == brute


def test_dedup_clusters_consistent_with_pairs(spark):
    """Cluster labels must close the pair relation: every near-dup pair
    shares a cluster, every cluster id is the member-min doc_id, and
    exactly one canonical doc exists per cluster."""
    labels = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
        for r in QUERIES["dedup_clusters"](spark, SF_SMOKE).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["simhash_near_pairs"](spark, SF_SMOKE).collect()
    ]
    assert pairs, "threshold should produce pairs on the synthetic corpus"
    for a, b in pairs:
        assert labels[a][0] == labels[b][0], (a, b)
    from collections import defaultdict

    members = defaultdict(list)
    for doc, (cid, _, _) in labels.items():
        members[cid].append(doc)
    for cid, docs in members.items():
        assert cid == min(docs)
        assert sum(1 for d in docs if labels[d][2]) == 1
        assert all(labels[d][1] == len(docs) for d in docs)
    assert sum(len(v) for v in members.values()) == len(labels)


def test_embedding_lsh_subset_of_exact_pairs(spark):
    """LSH bucketing can only LOSE pairs relative to the exact all-pairs
    ground truth, never invent one, and a surviving pair's cosine must be
    bit-identical to the exact path (same normalize + dot)."""
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in QUERIES["dedup_embedding_pairs"](spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in QUERIES["dedup_embedding_lsh"](spark, SF_SMOKE).collect()
    }
    assert lsh, "bucketed path should find pairs on the synthetic corpus"
    assert set(lsh) <= set(exact)
    for pair, sim in lsh.items():
        assert sim == exact[pair]


def test_passage_overlap_consistent_with_dup_windows(spark):
    """Every doc in an overlap pair must be flagged with dup windows by
    repeated_passage_windows, and weighted overlap >= distinct overlap."""
    pairs = QUERIES["doc_pair_passage_overlap"](spark, SF_SMOKE).collect()
    assert pairs
    flagged = {
        r.doc_id
        for r in QUERIES["repeated_passage_windows"](spark, SF_SMOKE).collect()
        if r.n_dup_windows > 0
    }
    for p in pairs:
        assert p.doc_a < p.doc_b
        assert p.doc_a in flagged and p.doc_b in flagged
        assert p.shared_windows >= p.n_shared_passages


def test_incremental_dedup_exact_implies_normalized(spark):
    """Identical raw text normalizes identically, so every exact dup is
    also a normalized dup; rejected is the OR of the two flags; only odd
    (incoming) doc_ids appear."""
    rows = QUERIES["incremental_dedup_new_docs"](spark, SF_SMOKE).collect()
    assert rows
    assert any(r.rejected for r in rows) or True  # presence depends on data
    for r in rows:
        assert r.doc_id % 2 == 1
        if r.exact_dup_of_base:
            assert r.normalized_dup_of_base
        assert r.rejected == (r.exact_dup_of_base or r.normalized_dup_of_base)


def test_semdedup_clusters_close_the_pair_relation(spark):
    """Every LSH near-dup pair must land in one cluster; cluster ids are
    the component minimum; sizes are consistent with membership."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    pairs = [
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding_lsh"](spark, SF_SMOKE).collect()
    ]
    rows = QUERIES["semdedup_clusters"](spark, SF_SMOKE).collect()
    label = {r.vec_id: r.cluster_id for r in rows}
    for a, b in pairs:
        assert label[a] == label[b], (a, b)
    from collections import Counter

    sizes = Counter(label.values())
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.cluster_id <= r.vec_id
        assert r.is_canonical == (r.vec_id == r.cluster_id)
    # the synthetic corpus has some near-dup structure at this threshold
    assert any(s > 1 for s in sizes.values())


def test_containment_dominates_jaccard_and_orients_by_size(spark):
    """containment >= jaccard algebraically (divide by the smaller set,
    not the union); the contained doc is never the larger shingle set."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["dedup_containment"](spark, SF_ORACLE).collect()
    assert rows  # threshold chosen to be non-trivial on the corpus
    sizes = {
        r.doc_id: r.n
        for r in shingles_df(load_table(spark, SF_ORACLE, "documents"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.containment >= r.jaccard
        assert r.n_contained == min(sizes[r.doc_contained], sizes[r.doc_container])
        assert sizes[r.doc_contained] <= sizes[r.doc_container]


def test_cluster_survivors_keep_longest_and_account_exactly(spark):
    """One survivor per cluster; it has the cluster's max n_chars (lowest
    doc_id among equals); sizes and char sums reconcile with the cluster
    report."""
    surv = {r.cluster_id: r for r in QUERIES["dedup_cluster_survivors"](spark, SF_ORACLE).collect()}
    clusters = QUERIES["dedup_clusters"](spark, SF_ORACLE).collect()
    import duckdb

    chars = {
        d: n
        for d, n in duckdb.sql(
            f"SELECT doc_id, n_chars FROM read_parquet('{SF_ORACLE}/documents.parquet')"
        ).fetchall()
    }
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    assert set(surv) == set(by_cluster)
    for cid, members in by_cluster.items():
        s = surv[cid]
        assert s.cluster_size == len(members)
        best = max(chars[d] for d in members)
        assert s.kept_chars == best
        assert s.kept_doc == min(d for d in members if chars[d] == best)
        assert s.kept_chars + s.dropped_chars == sum(chars[d] for d in members)
        assert s.dropped_docs == len(members) - 1


def test_stopshingle_cap_actually_excludes_and_still_finds_pairs(spark):
    """Non-vacuity guard for the capped variant: at test scale some
    shingles must exceed STOP_SHINGLE_MAX_DF (else the query degenerates
    to plain MinHash and proves nothing), and the rare-shingle pairs
    must still be found."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        STOP_SHINGLE_MAX_DF,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    n_hot = (
        shingles_df(load_table(spark, SF_ORACLE, "documents"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > STOP_SHINGLE_MAX_DF)
        .count()
    )
    assert n_hot > 0
    rows = QUERIES["dedup_minhash_stopshingle"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0


def test_part_entity_clusters_close_the_fuzzy_relation(spark):
    """Every fuzzy pair lands in one entity; cluster ids are member
    minima; exactly one canonical per entity; partition of all parts."""
    rows = QUERIES["part_entity_clusters"](spark, SF_SMOKE).collect()
    label = {r.p_partkey: r for r in rows}
    pairs = [
        (r.key_a, r.key_b)
        for r in QUERIES["fuzzy_part_name_pairs"](spark, SF_SMOKE).collect()
    ]
    assert pairs
    for a, b in pairs:
        assert label[a].cluster_id == label[b].cluster_id, (a, b)
    from collections import defaultdict

    members = defaultdict(list)
    for r in rows:
        members[r.cluster_id].append(r.p_partkey)
    for cid, keys in members.items():
        assert cid == min(keys)
        assert sum(1 for k in keys if label[k].is_canonical) == 1
        assert all(label[k].cluster_size == len(keys) for k in keys)
    assert sum(len(v) for v in members.values()) == len(rows)


def test_method_eval_structural_guarantees(spark):
    """minhash_lsh verifies candidates with the exact Jaccard, so its
    precision is 1.0 by construction; embedding_lsh bucketing can only
    LOSE pairs (fp == 0); every F1 reconciles with its own counts."""
    rows = {r.method: r for r in QUERIES["dedup_method_eval"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"minhash_lsh", "simhash", "embedding_lsh"}
    assert rows["minhash_lsh"].fp == 0 and rows["minhash_lsh"].precision == 1.0
    assert rows["embedding_lsh"].fp == 0
    for r in rows.values():
        assert r.n_truth == r.tp + r.fn
        assert r.n_predicted == r.tp + r.fp
        want_f1 = round(2 * r.tp / (2 * r.tp + r.fp + r.fn), 6)
        assert r.f1 == want_f1
        assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision <= 1.0


def test_incremental_minhash_admission_consistency(spark):
    """Admission must agree with the full-corpus LSH pairs restricted to
    cross-parity pairs: an incoming doc is rejected iff dedup_minhash_lsh
    found a (base, incoming) pair over the threshold; rejected rows name
    a base doc; only odd ids appear."""
    rows = {r.doc_id: r for r in QUERIES["incremental_minhash_admission"](spark, SF_SMOKE).collect()}
    assert rows and all(d % 2 == 1 for d in rows)
    cross = {}
    for r in QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect():
        a, b = r.doc_a, r.doc_b
        if a % 2 != b % 2:
            inc, base = (a, b) if a % 2 == 1 else (b, a)
            cross.setdefault(inc, []).append(base)
    rejected = {d for d, r in rows.items() if not r.admitted}
    assert rejected == set(cross)
    for d in rejected:
        r = rows[d]
        assert r.near_dup_of is not None and r.near_dup_of % 2 == 0
        assert r.best_jaccard is not None and r.best_jaccard >= 0.2
        assert r.n_candidates >= 1


def test_jaccard_curve_monotone_and_anchored(spark):
    """Kept-pair counts are non-increasing in the threshold, and the
    declared JACCARD_THRESHOLD step must agree with the declared
    near-dup query's row count."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
    )

    rows = QUERIES["jaccard_threshold_curve"](spark, SF_SMOKE).collect()
    assert rows
    counts = [r.n_pairs_kept for r in rows]
    assert counts == sorted(counts, reverse=True)
    anchor = next(r for r in rows if r.threshold == JACCARD_THRESHOLD)
    assert anchor.n_pairs_kept == QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).count()
    for r in rows:
        assert 0 <= r.n_pairs_kept <= r.n_candidate_pairs


def test_band_sensitivity_nesting_monotone(spark):
    """With aligned layouts over one signature, a deeper band match
    implies its shallower sub-bands match, so candidate sets nest:
    16x1 >= 8x2 >= 4x4 >= 2x8 -- candidates and recall must both be
    non-decreasing in the band count, and verified <= candidates."""
    rows = sorted(
        QUERIES["minhash_band_sensitivity"](spark, SF_SMOKE).collect(),
        key=lambda r: r.bands,
    )
    assert [r.bands for r in rows] == [2, 4, 8, 16]
    for a, b in zip(rows, rows[1:]):
        assert a.n_candidates <= b.n_candidates
        assert a.recall <= b.recall
    for r in rows:
        assert r.n_verified <= min(r.n_candidates, r.n_exact)
        assert r.rows_per_band * r.bands == 16


def test_policy_funnel_reconciles_with_components(spark):
    """The funnel's per-policy counts must match the component queries:
    cluster losers = docs minus verified-cluster survivors; span
    contamination matches the ExactSubstr ratios; keeps is the
    conjunction and its count bounds follow."""
    (r,) = QUERIES["dedup_policy_funnel"](spark, SF_SMOKE).collect()
    assert r.n_docs == r.n_kept + (r.n_docs - r.n_kept)
    assert r.n_kept <= r.n_docs - max(r.n_exact_dups, r.n_cluster_losers, r.n_span_contaminated)
    subs = QUERIES["exact_substring_dedup"](spark, SF_SMOKE).collect()
    n_span = sum(1 for s in subs if s.n_dup_positions / s.n_tokens > 0.2)
    assert r.n_span_contaminated == n_span
    # survivors of the verified minhash clusters: one per cluster
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    linked = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    # losers are linked docs that are not their cluster's keeper; every
    # unlinked doc is its own cluster's survivor
    assert r.n_cluster_losers <= len(linked)
    assert 0.0 < r.token_keep_rate <= 1.0


def test_cosine_threshold_curve_monotone(spark):
    """Kept-pair counts are non-increasing in the threshold and bounded
    by the candidate count; the COSINE_NEAR_DUP rung must agree with
    dedup_embedding_lsh's pair count."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        COSINE_NEAR_DUP,
    )

    rows = QUERIES["cosine_threshold_curve"](spark, SF_SMOKE).collect()
    assert rows
    kept = [r.n_pairs_kept for r in rows]
    assert kept == sorted(kept, reverse=True)
    for r in rows:
        assert 0 <= r.n_pairs_kept <= r.n_candidate_pairs
    at = {r.threshold: r.n_pairs_kept for r in rows}
    if COSINE_NEAR_DUP in at:
        n_lsh = QUERIES["dedup_embedding_lsh"](spark, SF_SMOKE).count()
        assert at[COSINE_NEAR_DUP] == n_lsh


def test_cluster_size_histogram_consistency(spark):
    """Doc mass equals the corpus; histogram agrees with dedup_clusters'
    per-cluster sizes."""
    from collections import Counter

    rows = QUERIES["cluster_size_histogram"](spark, SF_SMOKE).collect()
    clusters = QUERIES["dedup_clusters"](spark, SF_SMOKE).collect()
    sizes = Counter()
    seen = set()
    for r in clusters:
        if r.cluster_id not in seen:
            seen.add(r.cluster_id)
            sizes[r.cluster_size] += 1
    assert {r.cluster_size: r.n_clusters for r in rows} == dict(sizes)
    assert sum(r.n_docs for r in rows) == len(clusters)


def test_cross_source_matrix_reconciles_with_lsh_pairs(spark):
    """Cell mass equals the verified near-dup pair count; pair shares sum
    to 1; each cell is a normalized (least, greatest) source pair."""
    rows = QUERIES["cross_source_dup_matrix"](spark, SF_SMOKE).collect()
    n_pairs = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    assert abs(sum(r.pair_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.source_a <= r.source_b


def test_shingle_df_profile_buckets_and_mass(spark):
    """Power-of-two buckets bound their min/max df; shingle and posting
    shares each sum to 1; posting mass equals the distinct shingle
    postings."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["shingle_df_profile"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert (1 << r.bucket) <= r.min_df <= r.max_df < (1 << (r.bucket + 1))
    assert abs(sum(r.shingle_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.posting_share for r in rows) - 1.0) < 1e-4
    n_postings = shingles_df(load_table(spark, SF_SMOKE, "documents")).count()
    assert sum(r.n_postings for r in rows) == n_postings


def test_minhash_estimate_error_is_calibrated(spark):
    """Estimates are lane-count multiples of 1/16 in [0, 1]; the exact
    rational err_num/err_den restates est - exact; the pair set is
    exactly the dedup_ngram_jaccard near-dup pairs."""
    rows = QUERIES["minhash_estimate_error"](spark, SF_SMOKE).collect()
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == exact_pairs
    for r in rows:
        lanes = r.est_jaccard * 16
        assert abs(lanes - round(lanes)) < 1e-9
        assert 0.0 <= r.est_jaccard <= 1.0
        # err_num/err_den is the EXACT rational est - jaccard (16 | err_den)
        assert r.err_den > 0 and r.err_den % 16 == 0
        assert abs(r.err_num / r.err_den - (r.est_jaccard - r.jaccard)) < 2e-6


def test_lsh_bucket_balance_accounts_for_all_docs(spark):
    """Every band's histogram re-partitions the full doc set (each doc
    lands in exactly one bucket per band); pair-mass shares sum to ~1
    per band wherever mass exists; singleton buckets carry zero mass."""
    from mapreduce_on_google_cloud_platform_spark.functions.hashing import (
        MINHASH_BANDS,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from mapreduce_on_google_cloud_platform_spark.functions.text import (
        shingles_df,
    )

    rows = QUERIES["lsh_bucket_balance"](spark, SF_SMOKE).collect()
    # a doc lands in the index iff it has >= 1 shingle (empty docs don't)
    n_docs = (
        shingles_df(load_table(spark, SF_SMOKE, "documents"))
        .select("doc_id")
        .distinct()
        .count()
    )
    per_band_docs: dict[int, int] = {}
    per_band_share: dict[int, float] = {}
    for r in rows:
        per_band_docs[r.band] = per_band_docs.get(r.band, 0) + r.n_docs
        per_band_share[r.band] = per_band_share.get(r.band, 0.0) + r.pair_mass_share
        if r.bucket == 0:
            assert r.pair_mass == 0 and r.max_bucket == 1
        assert 2 ** r.bucket <= r.max_bucket < 2 ** (r.bucket + 1)
    assert set(per_band_docs) == set(range(MINHASH_BANDS))
    for band, d in per_band_docs.items():
        assert d == n_docs, f"band {band}: {d} != {n_docs}"
    for band, s in per_band_share.items():
        if any(r.band == band and r.pair_mass > 0 for r in rows):
            assert abs(s - 1.0) < 1e-4


def test_survivor_bias_reconciles_with_survivors(spark):
    """Totals must reconcile: sum(n_before) = corpus size, sum(n_after)
    = number of clusters (one survivor each); shares sum to ~1 on both
    sides; the bias ratio restates its integer inputs."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["dedup_survivor_bias_audit"](spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    n_clusters = QUERIES["dedup_cluster_survivors"](spark, SF_SMOKE).count()
    tb = sum(r.n_before for r in rows)
    ta = sum(r.n_after for r in rows)
    assert tb == n_docs
    assert ta == n_clusters
    assert abs(sum(r.share_before for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share_after for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 <= r.n_after <= r.n_before
        assert r.bias_ratio == round((r.n_after * tb) / (r.n_before * ta), 6)


def test_source_dedup_rate_reconciles_with_pair_endpoints(spark):
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    rows = QUERIES["source_dedup_rate"](spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    endpoints = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert sum(r.n_dup_docs for r in rows) == len(endpoints)
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs


def test_minhash_lane_uniformity_shape(spark):
    from mapreduce_on_google_cloud_platform_spark.functions.hashing import (
        MINHASH_P,
        NUM_MINHASHES,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    rows = sorted(
        QUERIES["minhash_lane_uniformity"](spark, SF_SMOKE).collect(),
        key=lambda r: r.lane,
    )
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert [r.lane for r in rows] == list(range(NUM_MINHASHES))
    for r in rows:
        # every doc has a signature row; lane minima live on [0, P)
        assert r.n_docs == n_docs
        assert 1 <= r.n_distinct <= r.n_docs
        assert 0 <= r.min_value <= r.max_value < MINHASH_P
        assert r.collision_share == round(1.0 - r.n_distinct / r.n_docs, 6)
        assert r.min_value <= r.mean_value <= r.max_value


def test_prefix_filter_join_is_exact(spark):
    """The prefix-filter join must return EXACTLY the pairs the unfiltered
    inverted-index join keeps at the same threshold: the prefix lemma
    guarantees recall 1.0 (a qualifying pair always shares a prefix
    shingle), and verification guarantees precision 1.0."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        PREFIX_JACCARD_DEN,
        PREFIX_JACCARD_NUM,
        _pair_jaccard,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    for sf_dir in (SF_SMOKE, SF_ORACLE):
        docs = load_table(spark, sf_dir, "documents")
        truth = {
            (r.doc_a, r.doc_b, r.n_common, r.n_union)
            for r in _pair_jaccard(shingles_df(docs))
            .filter(
                F.col("n_common") * PREFIX_JACCARD_DEN
                >= F.col("n_union") * PREFIX_JACCARD_NUM
            )
            .collect()
        }
        got = {
            (r.doc_a, r.doc_b, r.n_common, r.n_union)
            for r in QUERIES["prefix_filter_jaccard_join"](spark, sf_dir).collect()
        }
        assert got == truth
        assert truth, "threshold too strict: vacuous completeness check"


def test_prefix_filter_prefix_is_proper_subset(spark):
    """The candidate-generating prefix must be strictly smaller than the
    full shingle set for multi-shingle docs (otherwise the operator
    degenerates to the plain inverted-index join and the scale claim in
    its header is vacuous)."""
    from pyspark.sql import Window

    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        PREFIX_JACCARD_DEN,
        PREFIX_JACCARD_NUM,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    sh = shingles_df(load_table(spark, SF_SMOKE, "documents"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    num, den = PREFIX_JACCARD_NUM, PREFIX_JACCARD_DEN
    stats = (
        sizes.select(
            "n",
            (
                F.col("n")
                - F.expr(f"(n * {num} + {den} - 1) div {den}")
                + F.lit(1)
            ).alias("p"),
        )
        .agg(
            F.sum("n").alias("total_shingles"),
            F.sum(F.least(F.col("p"), F.col("n"))).alias("total_prefix"),
            # strictness holds only for n >= 3 at t=1/2: a 2-shingle doc
            # has p = 2 - ceil(1) + 1 = 2 = n (gap 0), legitimately
            F.max(F.when(F.col("n") > 2, F.col("p") - F.col("n"))).alias(
                "worst_gap"
            ),
            F.max(F.col("p") - F.col("n")).alias("max_gap_any"),
        )
        .collect()[0]
    )
    # prefix never longer than the doc, strictly shorter once n >= 3...
    assert stats.max_gap_any <= 0
    assert stats.worst_gap < 0
    # ...and materially shorter in aggregate (t=1/2 -> about half)
    assert stats.total_prefix < stats.total_shingles


def test_simhash_band_audit_pigeonhole_guarantee(spark):
    """Geometry rows whose guaranteed radius covers HAMMING_MAX must show
    recall exactly 1.0 (pigeonhole is a theorem, not a tendency); every
    row's recovered count is bounded by both truth and candidates."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        SIMHASH_BAND_CONFIGS,
    )

    from mapreduce_on_google_cloud_platform_spark.functions.hashing import (
        SIMHASH_BITS,
        SIMHASH_WIDE_BANDS,
        SIMHASH_WIDE_BITS,
    )

    rows = QUERIES["simhash_band_width_audit"](spark, SF_SMOKE).collect()
    expected = {(SIMHASH_BITS, r, b) for r, b in SIMHASH_BAND_CONFIGS} | {
        (
            SIMHASH_WIDE_BITS,
            SIMHASH_WIDE_BANDS,
            SIMHASH_WIDE_BITS // SIMHASH_WIDE_BANDS,
        )
    }
    assert {(r.sig_bits, r.n_bands, r.band_bits) for r in rows} == expected
    for r in rows:
        assert r.guaranteed_radius == r.n_bands - 1
        assert 0 <= r.n_recovered <= r.n_true_pairs
        assert r.n_recovered <= r.n_candidate_pairs
        # pigeonhole is a theorem only when the radius is measured on the
        # SAME signature the bands slice: the 32-bit geometries
        if (
            r.sig_bits == SIMHASH_BITS
            and r.guaranteed_radius >= HAMMING_MAX
            and r.n_true_pairs > 0
        ):
            assert r.recall == 1.0
    # the wide row must deliver on its purpose: strictly fewer candidates
    # than the production 8x4 geometry it is the escape hatch for
    by_sig = {(r.sig_bits, r.n_bands): r for r in rows}
    prod = by_sig[(SIMHASH_BITS, 8)]
    wide = by_sig[(SIMHASH_WIDE_BITS, SIMHASH_WIDE_BANDS)]
    assert wide.n_candidate_pairs < prod.n_candidate_pairs


def test_simhash_wide_geometry_constants_consistent():
    """The pinned switch geometry must slice evenly and fit signed
    BIGINT in both engines (bit 63 would overflow the signature sum)."""
    from mapreduce_on_google_cloud_platform_spark.functions.hashing import (
        SIMHASH_CAND_PER_DOC_SWITCH,
        SIMHASH_WIDE_BANDS,
        SIMHASH_WIDE_BITS,
    )

    assert SIMHASH_WIDE_BITS <= 60
    assert SIMHASH_WIDE_BITS % 4 == 0  # whole md5 nibbles
    assert SIMHASH_WIDE_BITS % SIMHASH_WIDE_BANDS == 0
    assert SIMHASH_CAND_PER_DOC_SWITCH > 0


def test_dbscan_refines_cc_and_role_invariants(spark):
    """DBSCAN over the same epsilon-graph must REFINE the plain-CC
    clustering (cluster identity only propagates through cores, so a
    DBSCAN cluster can never span two CC components), cores must meet
    the MIN_PTS density, and noise must carry no cluster."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        DBSCAN_MIN_PTS,
    )

    db = QUERIES["dbscan_lsh_clusters"](spark, SF_SMOKE).collect()
    cc = {
        r.vec_id: r.cluster_id
        for r in QUERIES["semdedup_clusters"](spark, SF_SMOKE).collect()
    }
    assert {r.vec_id for r in db} == set(cc)
    by_cluster: dict[int, set[int]] = {}
    n_core = 0
    for r in db:
        assert r.role in ("core", "border", "noise")
        if r.role == "core":
            n_core += 1
            assert r.n_neighbors + 1 >= DBSCAN_MIN_PTS
            assert r.cluster_id is not None
        if r.role == "noise":
            assert r.cluster_id is None
        if r.cluster_id is not None:
            by_cluster.setdefault(r.cluster_id, set()).add(r.vec_id)
    assert n_core > 0, "corpus produced no cores: vacuous refinement check"
    for members in by_cluster.values():
        assert len({cc[m] for m in members}) == 1  # refinement


def test_sorted_neighborhood_matches_global_sort_bruteforce(spark):
    """The bucket-decomposed global rank must reproduce a plain Python
    sort by (normalized-prefix key, doc_id): candidate pairs are exactly
    the rank-distance <= SNM_WINDOW neighbors, filtered by exact
    shingle jaccard at the shared threshold."""
    import re as _re

    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        SNM_KEY_LEN,
        SNM_WINDOW,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    keyed = sorted(
        (
            _re.sub("[^0-9a-z]", "", r.text.lower())[:SNM_KEY_LEN],
            r.doc_id,
        )
        for r in docs
    )
    shing: dict[int, set] = {}
    for r in shingles_df(load_table(spark, SF_SMOKE, "documents")).collect():
        shing.setdefault(r.doc_id, set()).add(r.sh)
    expected = {}
    for i, (_, a) in enumerate(keyed):
        for d in range(1, SNM_WINDOW + 1):
            if i + d >= len(keyed):
                break
            b = keyed[i + d][1]
            lo, hi = min(a, b), max(a, b)
            sa, sb = shing.get(lo, set()), shing.get(hi, set())
            union = len(sa | sb)
            if union and len(sa & sb) / union >= JACCARD_THRESHOLD:
                expected[(lo, hi)] = (d, len(sa & sb) / union)
    rows = QUERIES["dedup_sorted_neighborhood"](spark, SF_SMOKE).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == set(expected)
    for r in rows:
        d, jac = expected[(r.doc_a, r.doc_b)]
        assert r.rank_distance == d
        assert abs(r.jaccard - jac) < 1e-12


def test_cdc_chunking_matches_python_recompute(spark):
    """Full differential recompute of the CDC pipeline in Python: same
    tokenizer, same md5-lane boundary rule, same pos-ordered chunk
    fingerprints, same global first-occurrence dup accounting."""
    import hashlib
    import re as _re

    from mapreduce_on_google_cloud_platform_spark.operators.dedup import CDC_MOD
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    chunks: list[tuple[int, str, int, str, int]] = []  # doc, src, cid, fp, ntok
    for r in sorted(docs, key=lambda r: r.doc_id):
        toks = [
            _re.sub("[^0-9a-z]", "", t.lower())
            for t in _re.split(r"\s+", r.text)
        ]
        toks = [t for t in toks if t]
        cur: list[str] = []
        cid = 0
        for w in toks:
            cur.append(w)
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            if h % CDC_MOD == 0:
                chunks.append(
                    (r.doc_id, r.source, cid,
                     hashlib.md5(" ".join(cur).encode()).hexdigest(), len(cur))
                )
                cur, cid = [], cid + 1
        if cur:
            chunks.append(
                (r.doc_id, r.source, cid,
                 hashlib.md5(" ".join(cur).encode()).hexdigest(), len(cur))
            )
    seen: set[str] = set()
    exp: dict[str, list[int]] = {}
    for doc_id, src, cid, fp, ntok in sorted(chunks):
        e = exp.setdefault(src, [0, 0, 0, 0])  # chunks, toks, dup_c, dup_t
        e[0] += 1
        e[1] += ntok
        if fp in seen:
            e[2] += 1
            e[3] += ntok
        else:
            seen.add(fp)
    rows = QUERIES["cdc_chunk_dedup"](spark, SF_SMOKE).collect()
    assert {r.source for r in rows} == set(exp)
    for r in rows:
        e = exp[r.source]
        assert (r.n_chunks, r.n_tokens, r.dup_chunks, r.dup_tokens) == tuple(e), r.source
        assert r.dup_token_share == e[3] / e[1]
        assert r.mean_chunk_tokens == e[1] / e[0]


def test_cdc_boundary_rate_plausible(spark):
    """Expected chunk length is ~CDC_MOD tokens; on real text the mean
    must sit in the right order of magnitude (not 1, not the doc
    length): the invariant a broken boundary predicate (always/never
    firing) breaks immediately."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import CDC_MOD

    rows = QUERIES["cdc_chunk_dedup"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1.0 < r.mean_chunk_tokens < 20.0 * CDC_MOD
        assert 0 <= r.dup_chunks <= r.n_chunks
        assert 0.0 <= r.dup_token_share <= 1.0


def test_leakage_split_cluster_strategy_leaks_zero(spark):
    """The invariant that justifies the operator: a cluster-keyed split
    can never tear a verified near-dup pair apart, while shares stay
    plausibly near 1/SPLIT_TEST_MOD on the doc axis."""
    rows = {r.strategy: r for r in QUERIES["leakage_safe_split_audit"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"by_doc", "by_cluster"}
    bc = rows["by_cluster"]
    assert bc.leaked_pairs == 0
    for r in rows.values():
        assert 0 <= r.test_docs <= r.total_docs
        assert 0 <= r.leaked_pairs <= r.total_pairs
        assert r.total_docs == rows["by_doc"].total_docs
        assert r.total_pairs == rows["by_doc"].total_pairs


def test_leakage_split_matches_python_recompute(spark):
    """Differential replay of both strategies over the same materialized
    cluster/pair indexes."""
    import hashlib

    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        SPLIT_TEST_MOD,
        simhash_clusters_indexed,
        simhash_pairs_indexed,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    def _t(x: int) -> bool:
        return (
            int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
            % SPLIT_TEST_MOD
            == 0
        )

    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    clus = {
        r.doc_id: r.cluster_id
        for r in simhash_clusters_indexed(spark, SF_SMOKE).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in simhash_pairs_indexed(spark, SF_SMOKE).collect()
    ]
    flags = {
        "by_doc": {d: _t(d) for d in chars},
        "by_cluster": {d: _t(clus[d]) for d in chars},
    }
    rows = {r.strategy: r for r in QUERIES["leakage_safe_split_audit"](spark, SF_SMOKE).collect()}
    for strat, f in flags.items():
        r = rows[strat]
        assert r.total_docs == len(chars)
        assert r.test_docs == sum(f.values())
        assert r.total_chars == sum(chars.values())
        assert r.test_chars == sum(c for d, c in chars.items() if f[d])
        assert r.total_pairs == len(pairs)
        assert r.leaked_pairs == sum(1 for a, b in pairs if f[a] != f[b])


def test_fellegi_sunter_weight_identities(spark):
    """FS weights must satisfy the likelihood-ratio identities: m/u > 1
    iff w_agree > 0; w_disagree has the opposite sign of w_agree when
    both are finite; u_prob equals the closed-form sum f(f-1)/(N(N-1))
    recomputed independently."""
    import duckdb
    import math

    rows = QUERIES["fellegi_sunter_weights"](spark, SF_SMOKE).collect()
    assert {r.field for r in rows} == {"p_size", "price_grid"}
    n, = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/part.parquet'"
    ).fetchone()
    for r in rows:
        assert r.n_recs == n
        assert 0 <= r.n_agree_match <= r.n_match_pairs
        assert abs(r.u_prob - r.u_agree_pairs / (n * (n - 1))) < 1e-15
        if r.w_agree is not None:
            assert (r.w_agree > 0) == (r.m_prob > r.u_prob)
            assert abs(r.w_agree - math.log(r.m_prob / r.u_prob)) < 1e-12
        if r.w_agree is not None and r.w_disagree is not None:
            # agreement evidence up => disagreement evidence down
            assert (r.w_agree > 0) != (r.w_disagree > 0) or (
                r.w_agree == 0 and r.w_disagree == 0
            )


def test_winnowing_density_and_guarantee(spark):
    """Winnowing invariants: one fingerprint per full window at most
    w distinct selections per w windows, density in (0, 1], expected
    around 2/(w+1); any doc duplicated verbatim must share ALL its
    fingerprints (the Schleimer guarantee applied to full-doc dups)."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        WINNOW_W,
    )

    rows = QUERIES["winnowing_fingerprints"](spark, SF_SMOKE).collect()
    assert rows
    dens = [r.fp_density for r in rows if r.fp_density is not None]
    assert dens
    for r in rows:
        assert r.n_fingerprints <= max(r.n_windows, 0) or r.n_windows == 0
        assert r.n_distinct_fp <= r.n_fingerprints
        assert r.n_shared_fp <= r.n_distinct_fp
        if r.fp_density is not None:
            assert 0 < r.fp_density <= 1
    # corpus-level: mean density should sit near the 2/(w+1) theory
    mean_d = sum(dens) / len(dens)
    assert 2 / (WINNOW_W + 1) * 0.5 < mean_d < 2 / (WINNOW_W + 1) * 2.5


def test_capture_recapture_identities(spark):
    """Chapman arithmetic reconciles with the detector counts; both
    detector sets are subsets of the exact truth; the estimate is at
    least the observed union and the anchor coverage is in (0, 1]."""
    row = QUERIES["dedup_capture_recapture"](spark, SF_SMOKE).collect()[0]
    assert 0 <= row.n_both <= min(row.n_det_a, row.n_det_b)
    assert row.n_union == row.n_det_a + row.n_det_b - row.n_both
    assert row.n_union <= row.n_true_pairs
    chapman = (row.n_det_a + 1) * (row.n_det_b + 1) / (row.n_both + 1) - 1
    assert row.chapman_estimate == chapman
    assert row.chapman_estimate >= row.n_both
    assert row.union_coverage == row.n_union / row.n_true_pairs
    assert 0.0 < row.union_coverage <= 1.0


def test_capture_recapture_halves_union_to_full_lsh(spark):
    """Sanity: the two half-band detectors together find exactly the
    pairs the full 8-band LSH finds (a pair collides in SOME band iff
    it collides in one of the halves)."""
    full = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    row = QUERIES["dedup_capture_recapture"](spark, SF_SMOKE).collect()[0]
    assert row.n_union == len(full)


def test_band_join_salt_switch_and_equivalence(spark):
    """The salting switch rule (band_join_salt_k) stays UNSALTED below
    the pinned candidates-per-doc threshold (the sf0.1 regime) and fires
    above it; on a synthetic hot-bucket corpus the salted band self-join
    emits the IDENTICAL (doc_a, doc_b, hamming) candidate multiset as
    the unsalted form (each pair meets at exactly one salt per band)."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.functions.hashing import (
        SIMHASH_CAND_PER_DOC_SWITCH,
    )
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        _salted_band_pairs,
        band_join_salt_k,
    )

    # the switch rule itself
    assert band_join_salt_k(None) == 1
    assert band_join_salt_k(SIMHASH_CAND_PER_DOC_SWITCH) == 1
    assert band_join_salt_k(SIMHASH_CAND_PER_DOC_SWITCH + 1) > 1

    # synthetic hot-bucket corpus: 70 docs crowd ONE (band, chunk)
    # bucket (quadratic expansion on a single key -- the skew the salt
    # splits), plus a second sparse bucket and unmatched strays
    rows = [(i, i * 37 % 97, 0, 7) for i in range(70)]
    rows += [(100 + i, i, 1, 3) for i in range(5)]
    rows += [(200, 11, 2, 1), (201, 12, 3, 2)]
    chunks = spark.createDataFrame(
        rows, "doc_id bigint, simhash bigint, band int, chunk int"
    )
    # the hot bucket alone yields 70*69/2 pairs over 77 docs -- well
    # above the per-doc switch point scaled to this toy corpus
    cand_per_doc = (70 * 69 / 2) / 77
    assert band_join_salt_k(SIMHASH_CAND_PER_DOC_SWITCH + cand_per_doc) == 16

    a, b = chunks.alias("a"), chunks.alias("b")
    unsalted = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
    )
    key = lambda r: (r.doc_a, r.doc_b, r.hamming)  # noqa: E731
    expect = sorted(key(r) for r in unsalted.collect())
    got = sorted(key(r) for r in _salted_band_pairs(chunks, 16).collect())
    assert got == expect and len(expect) >= 70 * 69 // 2
