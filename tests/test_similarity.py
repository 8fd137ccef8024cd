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

NAMES = [name for name, _, o in SIMILARITY_QUERIES if o is not None]


def _hash_rank_ids(vec_ids, k: int) -> set[int]:
    """Independent (hashlib) replica of similarity.codebook_ids: the k
    vec_ids with the smallest md5(str(vec_id)) hex digests."""
    import hashlib

    ranked = sorted(
        (int(v) for v in vec_ids),
        key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
    )
    return set(ranked[:k])


def test_codebook_cardinality_is_corpus_independent(spark):
    """VERDICT r10 item #1's enforced invariant: doubling the corpus must
    leave the codebook cardinality unchanged (k is a pinned constant,
    never a corpus ratio), and the Spark md5-rank selection must match
    the independent hashlib replica exactly."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_CENTROIDS,
        codebook_ids,
    )

    base = spark.range(0, 1000).withColumnRenamed("id", "vec_id")
    doubled = spark.range(0, 2000).withColumnRenamed("id", "vec_id")
    sel_base = {r.vec_id for r in codebook_ids(base, K_CENTROIDS).collect()}
    sel_doubled = {
        r.vec_id for r in codebook_ids(doubled, K_CENTROIDS).collect()
    }
    assert len(sel_base) == K_CENTROIDS
    assert len(sel_doubled) == K_CENTROIDS  # 2x corpus, SAME k
    assert sel_base == _hash_rank_ids(range(1000), K_CENTROIDS)
    assert sel_doubled == _hash_rank_ids(range(2000), K_CENTROIDS)
    # degenerate corpora smaller than k select everything, loudly finite
    tiny = spark.range(0, 5).withColumnRenamed("id", "vec_id")
    assert codebook_ids(tiny, K_CENTROIDS).count() == 5


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


def test_kmeans_matches_numpy_reference(spark):
    """Independent third implementation: quantized Lloyd's in numpy with
    the same init/tie-break rules must produce the identical assignment
    (catches errors a shared-SQL-shape oracle could mirror)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_CENTROIDS,
        KMEANS_ITERS,
        QUANT_SCALE,
    )

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    vec_ids = np.array(t["vec_id"])
    v = np.array([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    q = np.floor(v * QUANT_SCALE + 0.5).astype(np.int64)

    init_ids = _hash_rank_ids(vec_ids.tolist(), K_CENTROIDS)
    mask = np.array([int(x) in init_ids for x in vec_ids])
    cids = vec_ids[mask].astype(np.int64)
    sums = q[mask].astype(object)  # python ints: exact wide arithmetic
    ns = np.ones(len(cids), dtype=np.int64)
    assign = None
    for _ in range(KMEANS_ITERS):
        best = {}
        for vid, qv in zip(vec_ids, q):
            qq = int(np.dot(qv, qv))
            cands = []
            for c in range(len(cids)):
                n = int(ns[c])
                s = sums[c]
                xp = int(np.dot(qv, s.astype(np.int64)))
                ss = sum(int(x) * int(x) for x in s)
                dist = float(n * n * qq - 2 * n * xp + ss) / float(n * n)
                cands.append((dist, int(cids[c])))
            best[int(vid)] = min(cands)
        assign = best
        members = {}
        for vid, (_, cid) in best.items():
            members.setdefault(cid, []).append(vid)
        cids = np.array(sorted(members), dtype=np.int64)
        idx = {int(v): i for i, v in enumerate(vec_ids)}
        sums = np.array(
            [
                np.sum(q[[idx[m] for m in members[int(c)]]].astype(object), axis=0)
                for c in cids
            ],
            dtype=object,
        )
        ns = np.array([len(members[int(c)]) for c in cids], dtype=np.int64)

    got = {
        r.vec_id: (r.dist, r.cluster_id)
        for r in QUERIES["kmeans_assign"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(assign)
    for vid in got:
        assert got[vid] == assign[vid], (vid, got[vid], assign[vid])


def test_lsh_multiprobe_recall_dominates_single_probe(spark):
    """Hamming-1 probing can only ADD candidate buckets, so its recall
    against brute force must be >= the single-probe variant's, and both
    must beat random (the hyperplanes actually separate the space)."""
    brute = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    single = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_lsh_topk"](spark, SF_SMOKE).collect()
    }
    multi = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_lsh_multiprobe_topk"](spark, SF_SMOKE).collect()
    }
    r_single = len(brute & single) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    assert r_multi >= r_single
    # absolute floor: the synthetic embeddings are near-random, so recall
    # tracks the searched fraction (~7 probes x corpus/64 buckets ~= 11%);
    # anything clearly above zero shows the machinery works, the dominance
    # check above is the real property.
    assert r_multi > 0.03, f"multi-probe LSH recall suspiciously low: {r_multi:.2f}"


def test_int8_topk_recall_against_float_groundtruth(spark):
    """Quantized serving must track the exact float ranking closely:
    top-10 recall vs ann_topk_bruteforce >= 0.9 averaged over queries
    (reconstructed-dot scoring measures 0.98 here; the plain centered
    code-dot that ignores per-dim scale/offset craters to ~0.78 and a
    broken code layout to ~0.1)."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    exact: dict[int, set[int]] = {}
    for r in QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    got: dict[int, set[int]] = {}
    for r in QUERIES["ann_int8_topk"](spark, SF_SMOKE).collect():
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact)
    recalls = [len(got[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9


def test_hybrid_rrf_ranks_consistent(spark):
    """RRF output: ranks are within ARM_TOPK, at least one arm ranked
    every fused item, the score restates 1/(K+rank) fusion exactly, and
    the list is HYBRID_TOPK items sorted by (score desc, id)."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        ARM_TOPK,
        HYBRID_QUERY_ID,
        HYBRID_TOPK,
        RRF_K,
    )

    rows = QUERIES["hybrid_search_rrf"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= HYBRID_TOPK
    assert len({r.item_id for r in rows}) == len(rows)
    for r in rows:
        assert r.item_id != HYBRID_QUERY_ID
        assert r.kw_rank is not None or r.vec_rank is not None
        expect = 0.0
        if r.kw_rank is not None:
            assert 1 <= r.kw_rank <= ARM_TOPK
            expect += 1.0 / (RRF_K + r.kw_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= ARM_TOPK
            expect += 1.0 / (RRF_K + r.vec_rank)
        assert abs(r.rrf_score - round(expect, 9)) < 1e-12
    scores = [(-r.rrf_score, r.item_id) for r in rows]
    assert scores == sorted(scores)


def test_pq_adc_rerank_recall_floor(spark):
    """PQ-ADC shortlist + exact rerank must recover a solid majority of
    the exact top-10 (the synthetic embeddings have no low-rank
    structure, so raw ADC alone recalls ~0.35 -- the rerank is what
    makes PQ servable; floor chosen under the measured 0.72)."""
    pq = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["pq_adc_topk"](spark, SF_SMOKE).collect()
    }
    gt = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    assert len(pq & gt) / len(gt) >= 0.6


def test_pq_codes_and_ranks_shapes(spark):
    """Every query returns K_NEIGHBORS ranked rows; approx distances are
    non-negative ints; rerank order is by exact cosine."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_NEIGHBORS,
    )

    rows = QUERIES["pq_adc_topk"](spark, SF_SMOKE).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.d2pq >= 0
        assert r.neighbor_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r)
    for q, grp in by_q.items():
        assert len(grp) == K_NEIGHBORS
        grp.sort(key=lambda r: r.rank)
        cos = [(-r.cos_sim, r.neighbor_id) for r in grp]
        assert cos == sorted(cos)


def test_knn_graph_covers_corpus_with_good_recall(spark):
    """The LSH kNN graph gives every vector a neighbor list, and the
    multiprobe buckets recover most of each vector's true top-5."""
    import duckdb

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        KNN_GRAPH_K,
    )
    from mapreduce_on_google_cloud_platform_spark.functions.vectors import (
        SQL_NORMALIZED_CTE,
        sql_dot,
    )

    rows = QUERIES["knn_graph_lsh"](spark, SF_SMOKE).collect()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchone()[0]
    covered = {r.vec_id for r in rows}
    assert len(covered) == n_vecs  # every vector has at least one neighbor
    for r in rows:
        assert r.vec_id != r.neighbor_id
        assert 1 <= r.rank <= KNN_GRAPH_K

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet'"
    )
    exact = con.execute(f"""
        WITH {SQL_NORMALIZED_CTE},
        scored AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                   {sql_dot('a.vn', 'b.vn')} AS cos_sim
            FROM en a, en b WHERE a.vec_id <> b.vec_id
        )
        SELECT vec_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= {KNN_GRAPH_K}
    """).fetchall()
    truth = set(map(tuple, exact))
    got = {(r.vec_id, r.neighbor_id) for r in rows}
    recall = len(truth & got) / len(truth)
    # the synthetic embeddings are near-random, so recall tracks the
    # searched fraction (7 probes x ~n/64 per bucket ~= 11% of the
    # corpus); measuring ~0.24 = 2x chance shows the buckets carry real
    # signal.  Floor just above the searched fraction.
    assert recall >= 0.12, f"kNN-graph recall@{KNN_GRAPH_K} too low: {recall:.2f}"


def test_dim_stats_matches_numpy(spark):
    """Exact integer-grid stats agree with numpy computed on the same
    fixed-point grid."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    x = np.array([list(v) for v in tbl.column("embedding").to_pylist()], dtype=np.float64)
    q = np.floor(x * 1_000_000 + 0.5)
    rows = {r.dim: r for r in QUERIES["embedding_dim_stats"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(1, 65))
    for d in range(64):
        r = rows[d + 1]
        col = q[:, d]
        assert r.n == len(col)
        assert abs(r.mean_v - col.mean() / 1e6) < 1e-8
        # var_num is the exact integer numerator n*sum(q^2) - sum(q)^2;
        # var = var_num / (n^2 * 1e12) (python ints are exact here)
        qi = col.astype(np.int64)
        n = len(qi)
        exp_num = n * int((qi * qi).sum()) - int(qi.sum()) ** 2
        assert int(r.var_num) == exp_num
        var = exp_num / (n * n * 1e12)
        assert abs(var - (np.mean(col**2) / 1e12 - (col.mean() / 1e6) ** 2)) < 1e-7
        assert r.min_v == col.min() / 1e6
        assert r.max_v == col.max() / 1e6


def test_pca_power_iteration_matches_numpy_twin(spark):
    """The distributed loop must agree with an identical-algorithm
    single-node numpy power iteration (same start vector, same iteration
    count) -- and its Rayleigh eigenvalue estimate must be a valid lower
    bound near the exact top eigenvalue.  (The synthetic embeddings have
    a near-flat spectrum, so NO power method converges to the exact top
    eigendirection in a fixed few iterations; agreement with the twin is
    the implementation check, the eigenvalue band is the math check.)"""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        PCA_ITERS,
    )

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    x = np.array([list(v) for v in tbl.column("embedding").to_pylist()], dtype=np.float64)
    n = len(x)
    mu_np = x.mean(axis=0)
    xc = x - mu_np
    cov = x.T @ x / n - np.outer(mu_np, mu_np)  # same centering form as the op
    v = np.full(64, 1.0 / 8.0)
    eig = 0.0
    for _ in range(PCA_ITERS):
        s = cov @ v
        nrm = float(np.sqrt(s @ s))
        eig = nrm
        v = s / nrm

    rows = sorted(QUERIES["pca_power_iteration"](spark, SF_SMOKE).collect(),
                  key=lambda r: r.dim)
    got = np.array([r.loading for r in rows])
    assert abs(abs(got @ v) - 1.0) < 1e-6, "disagrees with identical numpy twin"
    assert abs(rows[0].eigenvalue - eig) / eig < 1e-6

    top_val = np.linalg.eigh(xc.T @ xc / n)[0][-1]
    # Rayleigh estimate of a unit vector never exceeds the top eigenvalue,
    # and after PCA_ITERS it should be well inside the top of the spectrum.
    assert rows[0].eigenvalue <= top_val * (1 + 1e-9)
    assert rows[0].eigenvalue >= 0.7 * top_val
    mu = np.array([r.mean_v for r in rows])
    assert np.allclose(mu, mu_np, atol=1e-9)


def test_ivf_pq_is_cell_restricted_pq(spark):
    """The composed query's results must be exactly pq_adc_topk's
    ADC+rerank restricted to probed cells: every (q, neighbor) it
    returns carries the SAME d2pq and cos_sim as the exhaustive PQ path
    computes for that pair (same codes, same LUT), and it can only
    lose neighbors, never invent them with different distances."""
    from .conftest import SF_SMOKE

    exhaustive = {
        (r.q_id, r.neighbor_id): (r.d2pq, r.cos_sim)
        for r in QUERIES["pq_adc_topk"](spark, SF_SMOKE).collect()
    }
    composed = QUERIES["ann_ivf_pq_topk"](spark, SF_SMOKE).collect()
    assert composed
    overlap = 0
    for r in composed:
        key = (r.q_id, r.neighbor_id)
        if key in exhaustive:
            overlap += 1
            assert (r.d2pq, r.cos_sim) == exhaustive[key], key
    # the recall of cell pruning is data- and NPROBE-dependent (41% at
    # sf0.001 with NPROBE=2); the load-bearing assertion is the value
    # identity above -- here only guard against zero overlap, which
    # would mean the composed path scores different codes entirely
    assert overlap > 0


def test_ann_method_recall_structural_order(spark):
    """Multi-probe LSH searches a superset of the single-bucket LSH
    candidates and both rank by exact cosine, so its recall can only be
    >= -- and every recall is a valid fraction of the same truth set."""
    from .conftest import SF_SMOKE

    rows = {r.method: r for r in QUERIES["ann_method_recall"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"int8", "ivf", "ivf_pq", "lsh", "lsh_multiprobe", "pq_adc"}
    truth_sizes = {r.n_truth for r in rows.values()}
    assert len(truth_sizes) == 1
    for r in rows.values():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits <= min(r.n_truth, r.n_predicted)
    assert rows["lsh_multiprobe"].recall_at_k >= rows["lsh"].recall_at_k


def test_pca_gram_stats_matches_power_iteration_cov(spark):
    """The oracle-checked fixed-point sufficient statistics must agree
    with the float covariance pca_power_iteration iterates on: recompute
    cov = E[xx] - E[x]E[x] per dim pair from the raw embeddings with
    numpy and compare every reconstructed cov_num / (n^2 * 1e12) cell to
    quantization tolerance (1e-6 grid -> ~1e-5 on covariances of
    unit-scale data); means cross-check against pca_power_iteration's
    emitted mean_v."""
    import numpy as np

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    gram_rows = QUERIES["pca_gram_stats"](spark, SF_SMOKE).collect()
    gram = {
        (r.dim_i, r.dim_j): int(r.cov_num) / (r.n * r.n * 1e12)
        for r in gram_rows
    }
    pca = {
        r.dim: r.mean_v
        for r in QUERIES["pca_power_iteration"](spark, SF_SMOKE).collect()
    }
    assert set(pca) == {i for i, _ in gram}

    x = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    mu = x.mean(axis=0)
    cov = (x.T @ x) / x.shape[0] - np.outer(mu, mu)
    for (i, j), c_q in gram.items():
        assert abs(c_q - cov[i - 1, j - 1]) < 1e-5, (
            f"cov_num[{i},{j}]/(n^2*1e12)={c_q} vs float cov {cov[i - 1, j - 1]}"
        )
    for d, m in pca.items():
        # mean_v is the float mean of the same column the s_i sums quantize
        assert abs(m - mu[d - 1]) < 1e-9


def test_embedding_norm_outliers_flags_partition(spark):
    """keep/near_zero/extreme partition every vector; flags agree with
    the emitted norm against the declared thresholds."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        NORM_HI,
        NORM_LO,
    )

    rows = QUERIES["embedding_norm_outliers"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert (r.near_zero + r.extreme + r.keep) == 1
        if r.keep:
            # fixed-point threshold vs rounded norm: allow the 1e-6 seam
            assert NORM_LO - 1e-5 <= r.norm <= NORM_HI + 1e-5


def test_kmeans_cluster_quality_consistency(spark):
    """Member shares sum to 1; per-cluster floor-int distance stats agree
    with the raw assignment."""
    import math
    from collections import defaultdict

    quality = {r.cluster_id: r for r in QUERIES["kmeans_cluster_quality"](spark, SF_SMOKE).collect()}
    assign = QUERIES["kmeans_assign"](spark, SF_SMOKE).collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_floor, max_floor
    for r in assign:
        a = agg[r.cluster_id]
        a[0] += 1
        a[1] += math.floor(r.dist)
        a[2] = max(a[2], math.floor(r.dist))
    assert set(agg) == set(quality)
    share = 0.0
    for cid, (n, s, mx) in agg.items():
        q = quality[cid]
        assert q.n_members == n and q.max_dist_q == mx
        assert q.mean_dist_q == s / n
        share += q.member_share
    assert abs(share - 1.0) < 1e-3


def test_kmeans_label_purity_invariants(spark):
    """Purity in (0, 1]; majority count <= members; member totals match
    the assignment; corpus purity is the weighted mean of cluster
    purities."""
    rows = QUERIES["kmeans_label_purity"](spark, SF_SMOKE).collect()
    assert rows
    n_assign = QUERIES["kmeans_assign"](spark, SF_SMOKE).count()
    assert sum(r.n_members for r in rows) == n_assign
    for r in rows:
        assert 0 < r.majority_count <= r.n_members
        assert 0 < r.purity <= 1.0


def test_embedding_centroid_drift_matches_numpy(spark):
    """dist2_q and centroid_dist must agree with a direct numpy
    computation on the same fixed-point grid."""
    import numpy as np

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import QUANT_SCALE
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select("label", "embedding").collect()
    q = {
        lab: np.array(
            [np.floor(np.array(e, dtype=np.float64) * QUANT_SCALE + 0.5) for l2, e in
             [(r.label, r.embedding) for r in emb] if l2 == lab],
            dtype=object,
        )
        for lab in {r.label for r in emb}
    }
    sums = {lab: np.sum(np.array(list(v), dtype=np.int64), axis=0, dtype=object) for lab, v in q.items()}
    ns = {lab: len(v) for lab, v in q.items()}
    sg = sum(sums.values())
    ng = sum(ns.values())
    rows = QUERIES["embedding_centroid_drift"](spark, SF_SMOKE).collect()
    assert {r.label for r in rows} == set(ns)
    for r in rows:
        diff = sums[r.label] * ng - sg * ns[r.label]
        dist2 = int(np.sum(diff * diff, dtype=object))
        assert int(r.dist2_q) == dist2, r.label
        # same fixed IEEE chain as the query (int->double is correctly
        # rounded in both CPython and Spark's BigDecimal path; sqrt and
        # the divisions are IEEE correctly-rounded) -- bit-exact match
        expect = (dist2 ** 0.5) / (ns[r.label] * ng * float(QUANT_SCALE))
        assert r.centroid_dist == expect, r.label


def test_recall_curve_monotone_and_consistent(spark):
    """recall@K is the method-recall at full K for k=10; hits grow with
    k; every recall is a valid fraction."""
    rows = {r.k: r for r in QUERIES["ann_recall_at_k_curve"](spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2, 5, 10}
    prev = 0
    for k in sorted(rows):
        assert rows[k].n_hits >= prev
        prev = rows[k].n_hits
        assert 0.0 <= rows[k].recall_at_k <= 1.0
    full = {r.method: r for r in QUERIES["ann_method_recall"](spark, SF_SMOKE).collect()}
    assert rows[10].n_hits == full["ivf"].n_hits


def test_matryoshka_recall_monotone_in_dim(spark):
    """More prefix dims can only help: recall@K is nondecreasing in the
    truncation dim, bounded by 1, over the full query set."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_NEIGHBORS,
        MATRYOSHKA_DIMS,
    )

    rows = QUERIES["matryoshka_dim_recall"](spark, SF_SMOKE).collect()
    assert [r.dim for r in rows] == list(MATRYOSHKA_DIMS)
    for r in rows:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits <= r.n_queries * K_NEIGHBORS
    for a, b in zip(rows, rows[1:]):
        assert a.recall_at_k <= b.recall_at_k + 1e-9


def test_knn_label_agreement_reconciles_with_graph(spark):
    """Edge totals reconcile with the kNN graph; node classes partition;
    random synthetic labels give ~1/n_labels micro agreement."""
    rows = QUERIES["knn_label_agreement"](spark, SF_SMOKE).collect()
    n_edges_graph = QUERIES["knn_graph_lsh"](spark, SF_SMOKE).count()
    assert sum(r.n_edges for r in rows) == n_edges_graph
    for r in rows:
        assert r.n_all_same + r.n_none_same <= r.n_nodes
        assert 0.0 <= r.agreement_rate <= 1.0
        assert r.n_same <= r.n_edges
    micro = sum(r.n_same for r in rows) / sum(r.n_edges for r in rows)
    assert 0.0 <= micro < 0.5  # labels are independent of geometry


def test_label_centroid_matrix_consistent_with_drift(spark):
    """Full strict-upper-triangle pair set over the label universe;
    distances positive and symmetric-by-construction; pair counts match
    the drift query's per-label counts; triangle inequality holds on the
    derived metric."""
    import itertools

    drift = {
        r.label: r.n_vecs
        for r in QUERIES["embedding_centroid_drift"](spark, SF_SMOKE).collect()
    }
    rows = QUERIES["label_centroid_distance_matrix"](spark, SF_SMOKE).collect()
    labels = sorted(drift)
    assert {(r.label_a, r.label_b) for r in rows} == set(
        itertools.combinations(labels, 2)
    )
    d = {}
    for r in rows:
        assert r.label_a < r.label_b
        assert (r.n_a, r.n_b) == (drift[r.label_a], drift[r.label_b])
        assert r.centroid_dist > 0  # distinct label clusters
        d[(r.label_a, r.label_b)] = r.centroid_dist
    get = lambda x, y: d[(x, y)] if x < y else d[(y, x)]  # noqa: E731
    for x, y, z in itertools.combinations(labels, 3):
        assert get(x, z) <= get(x, y) + get(y, z) + 1e-5


def test_nprobe_curve_monotone_and_consistent_with_ivf(spark):
    """Candidate recall is nondecreasing in nprobe; n_pairs equals the
    brute-force truth size; the shipped NPROBE's candidate recall bounds
    ann_recall_at_k_curve's recall@K from above (re-ranking can only
    lose neighbors, never find unprobed ones)."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_NEIGHBORS,
        NPROBE,
    )

    rows = sorted(
        QUERIES["ann_ivf_nprobe_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r.nprobe,
    )
    truth_n = QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE).count()
    recalls = [r.candidate_recall for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert r.n_pairs == truth_n
        assert r.candidate_recall == round(r.n_hits / r.n_pairs, 6)
    by_np = {r.nprobe: r.candidate_recall for r in rows}
    recall_at_k = {
        r.k: r.recall_at_k
        for r in QUERIES["ann_recall_at_k_curve"](spark, SF_SMOKE).collect()
    }
    assert recall_at_k[K_NEIGHBORS] <= by_np[NPROBE] + 1e-9


def test_kmeans_dist_expr_exact_past_int64_overflow(spark):
    """VERDICT r9 item #2: the <q,s> cross term must stay exact past the
    old int64 bound (~1e5 members per cluster).  Synthetic cluster of
    n = 2,000,000 identical max-magnitude vectors: the single-lane int64
    dot product would wrap (sum q_i*s_i ~ 8.2e21 >> 2^63), silently
    corrupting distances; the split-lane DECIMAL recombination must
    reproduce the arbitrary-precision Python value bit-for-bit."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        KMEANS_CENT_SCHEMA,
        _centroid_tuple,
        kmeans_dist_expr,
    )

    DIM = 64
    n = 2_000_000
    q = [8_000_000 - 17 * i for i in range(DIM)]  # qmax at the |v|<=8 bound
    cases = {
        # centroid == the vector itself, n copies -> dist exactly 0
        0: [n * qi for qi in q],
        # centroid offset per-dim -> large nonzero exact distance
        1: [n * qi + 999_983 * (i + 1) for i, qi in enumerate(q)],
    }
    qq = sum(qi * qi for qi in q)
    cent_rows = [_centroid_tuple(cid, n, sums) for cid, sums in cases.items()]
    centroids = spark.createDataFrame(cent_rows, KMEANS_CENT_SCHEMA)
    vec = spark.createDataFrame(
        [(0, *q, qq)],
        "vec_id bigint, "
        + ", ".join(f"q{i} bigint" for i in range(DIM))
        + ", qq bigint",
    )
    got = {
        r["cluster_id"]: r["dist"]
        for r in vec.crossJoin(centroids)
        .select("cluster_id", kmeans_dist_expr().alias("dist"))
        .collect()
    }
    for cid, sums in cases.items():
        cross = sum(qi * si for qi, si in zip(q, sums))
        assert cross > 2**63, "test must exercise the overflow regime"
        num = n * n * qq - 2 * n * cross + sum(s * s for s in sums)
        expected = float(num) / float(n * n)
        assert got[cid] == expected, (cid, got[cid], expected)
    assert got[0] == 0.0


def test_ivf_cell_balance_accounts_for_every_vector(spark):
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["ivf_cell_balance"](spark, SF_SMOKE).collect()
    n_emb = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_emb
    assert abs(sum(r.vector_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 2**r.bucket <= r.min_cell <= r.max_cell < 2 ** (r.bucket + 1)


def test_pq_code_usage_shape(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        PQ_M,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = sorted(
        QUERIES["pq_code_usage"](spark, SF_SMOKE).collect(), key=lambda r: r.m
    )
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        PQ_CODEWORDS,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n_emb = emb.count()
    book_ids = _hash_rank_ids(
        [r.vec_id for r in emb.select("vec_id").collect()], PQ_CODEWORDS
    )
    assert [r.m for r in rows] == list(range(PQ_M))
    for r in rows:
        assert 1 <= r.n_codes_used <= r.codebook_size
        assert 1 <= r.top_code_n <= n_emb
        assert r.top_code in book_ids  # codes index md5-rank codebook rows


def test_knn_reciprocity_bounds(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        KNN_GRAPH_K,
    )

    rows = sorted(
        QUERIES["knn_reciprocity_audit"](spark, SF_SMOKE).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, KNN_GRAPH_K + 1))
    for r in rows:
        assert 0 <= r.n_reciprocal <= r.n_edges
        assert r.reciprocity == round(r.n_reciprocal / r.n_edges, 6)


def test_pq_distortion_consistency(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        PQ_CODEWORDS,
        PQ_M,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = sorted(
        QUERIES["pq_distortion_stats"](spark, SF_SMOKE).collect(),
        key=lambda r: r.m,
    )
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n_emb = emb.count()
    n_book = len(
        _hash_rank_ids(
            [r.vec_id for r in emb.select("vec_id").collect()], PQ_CODEWORDS
        )
    )
    assert [r.m for r in rows] == list(range(PQ_M))
    for r in rows:
        assert r.n_vectors == n_emb
        assert 0 <= r.max_d2
        assert r.total_d2 >= 0
        assert r.mean_d2 == round(r.total_d2 / r.n_vectors, 6)
        # codebook rows are their own codewords: exact-fit floor
        assert r.zero_share >= round(n_book / n_emb, 6) - 1e-9


def test_rank_quality_curve_bounds_and_monotonicity(spark):
    """MRR/NDCG live on [0, 1]; MRR@k is non-decreasing in k (the
    first-relevant rank is a min over a growing condition set); and the
    DCG numerator dominates the MRR numerator at every depth (DCG
    includes the first relevant hit's term plus the rest)."""
    from .conftest import SF_SMOKE

    rows = sorted(
        QUERIES["ann_rank_quality_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r.k,
    )
    assert rows
    prev_mrr = 0.0
    for r in rows:
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg <= 1.0
        assert r.dcg_num >= r.mrr_num >= 0
        assert r.mrr >= prev_mrr
        prev_mrr = r.mrr
    # NOT asserted: MRR@1 == 1 under self-retrieval -- exact-duplicate
    # vectors tie at cosine 1.0 and the id tie-break can outrank the
    # query itself, so a perfect score is data-dependent, not a theorem.


def test_residual_pq_serving_contract(spark):
    """The residual IVF-PQ list must carry exactly K results per query
    over the probed cells, with exact-rerank cosines bounded to [-1, 1]
    and the same query set as the non-residual IVF-PQ path."""
    from .conftest import SF_SMOKE

    res = QUERIES["ann_ivf_residual_pq_topk"](spark, SF_SMOKE).collect()
    raw = QUERIES["ann_ivf_pq_topk"](spark, SF_SMOKE).collect()
    assert {r.q_id for r in res} == {r.q_id for r in raw}
    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r.q_id, []).append(r)
        assert -1.0 <= r.cos_sim <= 1.0
        assert r.d2pq >= 0
    for rows in by_q.values():
        ranks = sorted(x.rank for x in rows)
        assert ranks == list(range(1, len(ranks) + 1))


def test_residual_gain_audit_structure(spark):
    """One row per subspace; both distortion sums are non-negative exact
    ints over the same vector population; gain is raw/residual.  The
    direction of the gain is corpus-dependent (measured ~0.53 here --
    the audit's whole point), so only the arithmetic is asserted."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        PQ_M,
    )

    from .conftest import SF_SMOKE

    rows = sorted(
        QUERIES["pq_residual_gain_audit"](spark, SF_SMOKE).collect(),
        key=lambda r: r.subspace,
    )
    assert [r.subspace for r in rows] == list(range(PQ_M))
    assert len({r.n_vectors for r in rows}) == 1
    for r in rows:
        assert r.raw_d2_sum >= 0 and r.residual_d2_sum >= 0
        if r.residual_d2_sum > 0:
            assert r.gain == r.raw_d2_sum / r.residual_d2_sum


def test_jl_distortion_matches_python_recompute(spark):
    """Full differential: per-decile pair counts and ratio stats
    reproduce a pure-Python recompute using the same md5-derived sign
    matrix, md5-rank sample, and fold order; and the mean distortion
    stays in a sane JL band on every decile."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.functions.vectors import DIM
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        _JL_SIGNS,
        JL_DOUT,
        JL_SAMPLE,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    sample = sorted(
        emb, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:JL_SAMPLE]

    def proj(v: list) -> list:
        out = []
        for k in range(JL_DOUT):
            acc = 0.0
            for i in range(DIM):
                acc = acc + v[i] if _JL_SIGNS[i][k] > 0 else acc - v[i]
            out.append(acc)
        return out

    import math

    ps = {v: proj(emb[v]) for v in sample}
    pairs = []
    for i, a in enumerate(sorted(sample)):
        for b in sorted(sample)[i + 1 :]:
            acc = 0.0
            for d in range(DIM):
                acc = acc + (emb[a][d] - emb[b][d]) * (emb[a][d] - emb[b][d])
            d_orig = math.sqrt(acc)
            acc = 0.0
            for k in range(JL_DOUT):
                acc = acc + (ps[a][k] - ps[b][k]) * (ps[a][k] - ps[b][k])
            d_proj = math.sqrt(acc) / math.sqrt(JL_DOUT)
            if d_orig > 0:
                pairs.append((d_orig, a, b, d_proj / d_orig))
    pairs.sort()
    n = len(pairs)
    deciles: dict[int, list] = {}
    for idx, (_, _, _, ratio) in enumerate(pairs):
        # ntile semantics: first n % 10 tiles get ceil(n/10)
        base, rem = divmod(n, 10)
        tile = (
            idx // (base + 1) + 1
            if idx < (base + 1) * rem
            else rem + (idx - (base + 1) * rem) // base + 1
        )
        deciles.setdefault(tile, []).append(ratio)
    rows = QUERIES["jl_projection_distortion"](spark, SF_SMOKE).collect()
    assert {r.decile for r in rows} == set(deciles)
    for r in rows:
        rs = deciles[r.decile]
        assert r.n_pairs == len(rs)
        assert abs(r.min_ratio - min(rs)) < 1e-12
        assert abs(r.max_ratio - max(rs)) < 1e-12
        mean = float(
            sum(
                Decimal(repr(x)).quantize(
                    Decimal("1.000000000"), rounding=ROUND_HALF_UP
                )
                for x in rs
            )
        ) / len(rs)
        assert abs(r.mean_ratio - mean) < 1e-9
        assert 0.3 < r.mean_ratio < 1.7, "distortion far outside the JL band"


def test_filtered_topk_honors_predicate_and_rank(spark):
    """Every served neighbor carries the query's own label (the
    predicate prunes BEFORE scoring, so nothing else can leak through),
    ranks are dense from 1 and bounded by ANN_FILTER_K, and scores
    descend within each query."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        ANN_FILTER_K,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    per_q: dict[int, list] = {}
    for r in QUERIES["ann_filtered_topk"](spark, SF_SMOKE).collect():
        assert r.q_label == labels[r.q_id]
        assert labels[r.neighbor_id] == r.q_label
        assert r.neighbor_id != r.q_id
        per_q.setdefault(r.q_id, []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= ANN_FILTER_K
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True), q


def test_filter_recall_audit_matches_python_truth(spark):
    """The audit's per-label recall reproduces a pure-Python exact
    same-label truth (normalized dot products, identical fold order via
    math.fsum-free sequential sum) intersected with the served table."""
    from mapreduce_on_google_cloud_platform_spark.functions.vectors import DIM
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        ANN_FILTER_K,
        QUERY_STRIDE,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    emb, labels = {}, {}
    for r in load_table(spark, SF_SMOKE, "embeddings").collect():
        v = [float(x) for x in r.embedding]
        acc = 0.0
        for x in v:
            acc = acc + x * x
        n = acc ** 0.5
        emb[r.vec_id] = [x / n for x in v]
        labels[r.vec_id] = r.label

    def dot(a, b):
        acc = 0.0
        for i in range(DIM):
            acc = acc + a[i] * b[i]
        return acc

    truth: dict[int, list] = {}
    for q in emb:
        if q % QUERY_STRIDE != 0:
            continue
        scored = sorted(
            (
                (-dot(emb[q], emb[v]), v)
                for v in emb
                if v != q and labels[v] == labels[q]
            )
        )[:ANN_FILTER_K]
        truth[q] = [v for _, v in scored]
    served = {
        (r.q_id, r.neighbor_id)
        for r in QUERIES["ann_filtered_topk"](spark, SF_SMOKE).collect()
    }
    expected: dict[str, list] = {}
    for q, vs in truth.items():
        lab = labels[q]
        e = expected.setdefault(lab, [0, 0, 0])
        e[0] += 1
        e[1] += len(vs)
        e[2] += sum(1 for v in vs if (q, v) in served)
    rows = QUERIES["ann_filter_recall_audit"](spark, SF_SMOKE).collect()
    assert {r.label for r in rows} == set(expected)
    for r in rows:
        nq, nt, nh = expected[r.label]
        assert (r.n_queries, r.n_truth_rows, r.n_hits) == (nq, nt, nh)
        assert abs(r.recall - nh / nt) < 1e-12
        assert 0.0 <= r.recall <= 1.0


def test_kcenter_matches_python_greedy(spark):
    """Full differential replay of the Gonzalez trace in Python (exact
    int arithmetic on the same fixed-point grid, same md5-rank seed,
    same vec_id tie-break): the selection order, every gap distance,
    and the final cover radius must agree exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_CORESET,
        QUANT_SCALE,
    )

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    vec_ids = [int(x) for x in t["vec_id"].to_pylist()]
    v = np.array(
        [np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()]
    )
    q = np.floor(v * QUANT_SCALE + 0.5).astype(np.int64)
    by_id = {vid: q[i] for i, vid in enumerate(vec_ids)}

    (seed,) = _hash_rank_ids(vec_ids, 1)
    picks = [(0, seed, None)]
    mind = {
        vid: int(((by_id[vid] - by_id[seed]) ** 2).sum()) for vid in vec_ids
    }
    for t_i in range(1, K_CORESET):
        far = max(vec_ids, key=lambda vid: (mind[vid], -vid))
        picks.append((t_i, far, mind[far]))
        for vid in vec_ids:
            d = int(((by_id[vid] - by_id[far]) ** 2).sum())
            if d < mind[vid]:
                mind[vid] = d
    radius = max(mind.values())

    rows = sorted(
        QUERIES["kcenter_coreset_select"](spark, SF_SMOKE).collect(),
        key=lambda r: r.sel_order,
    )
    assert [(r.sel_order, r.vec_id, r.gap_dist) for r in rows] == picks
    for r in rows:
        assert r.cover_radius == radius


def test_kcenter_greedy_invariants(spark):
    """Structural invariants of any correct farthest-point traversal:
    gap distances are non-increasing, picks are distinct, and the final
    cover radius is bounded by the last gap (the next pick would have
    been the radius witness)."""
    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        K_CORESET,
    )

    rows = sorted(
        QUERIES["kcenter_coreset_select"](spark, SF_SMOKE).collect(),
        key=lambda r: r.sel_order,
    )
    assert len(rows) == K_CORESET
    assert len({r.vec_id for r in rows}) == K_CORESET
    gaps = [r.gap_dist for r in rows[1:]]
    assert all(a >= b for a, b in zip(gaps, gaps[1:]))
    assert all(g >= 0 for g in gaps)
    assert rows[0].gap_dist is None
    assert 0 <= rows[0].cover_radius <= gaps[-1]


def test_rbo_bounds_and_perfect_agreement(spark):
    """0 <= rbo <= truncated-RBO mass; full top-K agreement in both
    ORDER and membership must score exactly the all-depth mass
    W(1) * ... i.e. sum_d (1-p)p^(d-1) (up to the 15-dp quantization),
    and rbo is monotone in the overlap count only when orders agree --
    here we pin the verifiable bounds."""
    from decimal import Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        _RBO_W,
        K_NEIGHBORS,
    )

    # max attainable: every depth fully overlapping = K rows with
    # mx = rank on both sides = d -> sum_d W(d)... equivalently each
    # row at mx=d contributes W(d); the perfect list has rows at
    # mx = 1..K
    perfect = float(sum(Decimal(_RBO_W[m]) for m in range(1, K_NEIGHBORS + 1)))
    rows = QUERIES["rbo_rank_overlap"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.rbo <= perfect + 1e-12
        assert 0 <= r.n_overlap_rows <= K_NEIGHBORS
        if r.n_overlap_rows == 0:
            assert r.rbo == 0.0


def test_rbo_matches_python_recompute(spark):
    """Differential replay: recompute per-query RBO from the two
    materialized rank tables with the same decimal weight table."""
    from decimal import Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.similarity import (
        _RBO_W,
        ann_truth_indexed,
        ivf_topk_indexed,
    )

    t = {
        (r.q_id, r.neighbor_id): r.rank
        for r in ann_truth_indexed(spark, SF_SMOKE).collect()
    }
    m = {
        (r.q_id, r.neighbor_id): r.rank
        for r in ivf_topk_indexed(spark, SF_SMOKE).collect()
    }
    per_q: dict[int, Decimal] = {}
    n_rows: dict[int, int] = {}
    for key, rt in t.items():
        if key in m:
            q = key[0]
            mx = max(rt, m[key])
            per_q[q] = per_q.get(q, Decimal(0)) + Decimal(_RBO_W[mx])
            n_rows[q] = n_rows.get(q, 0) + 1
    rows = QUERIES["rbo_rank_overlap"](spark, SF_SMOKE).collect()
    assert {r.q_id for r in rows} == {q for q, _ in t}
    for r in rows:
        assert r.n_overlap_rows == n_rows.get(r.q_id, 0)
        assert r.rbo == float(per_q.get(r.q_id, Decimal(0)))


def test_silhouette_bounds_and_membership(spark):
    """Silhouette scores live in [-1, 1]; membership counts must cover
    the corpus exactly once; n_negative is bounded by membership."""
    rows = QUERIES["cluster_silhouette_audit"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r.n_members for r in rows) == n_vecs
    for r in rows:
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9
        assert 0 <= r.n_negative <= r.n_members


def test_silhouette_agrees_with_quality_membership(spark):
    """The audit's per-cluster membership must equal the quality
    report's (both ride the same materialized assignment)."""
    sil = {r.cluster_id: r.n_members
           for r in QUERIES["cluster_silhouette_audit"](spark, SF_SMOKE).collect()}
    qual = {r.cluster_id: r.n_members
            for r in QUERIES["kmeans_cluster_quality"](spark, SF_SMOKE).collect()}
    assert sil == qual
