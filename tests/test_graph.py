"""Fixed-point PageRank over the near-dup graph: oracle parity + sanity."""

from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.graph import (
    GRAPH_QUERIES,
    PR_SCALE,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in GRAPH_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_pagerank_mass_and_hub_ordering(spark):
    """Sanity on the semantics, not just cross-engine agreement: ranks
    stay within the damping fixed-point bounds, and the top-ranked node
    has at least median degree (hubs rise)."""
    rows = QUERIES["neardup_pagerank"](spark, SF_SMOKE).collect()
    assert rows, "near-dup graph unexpectedly empty"
    for r in rows:
        assert 0 < r.pagerank_fp < 10 * PR_SCALE
    degs = sorted(r.deg for r in rows)
    assert rows[0].deg >= degs[len(degs) // 2]


def test_neardup_degree_profile_invariants(spark):
    """Degree-0 mass + edge-bearing docs partition the corpus; shares
    sum to 1; total degree mass is twice the pair count."""
    import duckdb

    from .conftest import SF_SMOKE

    rows = QUERIES["neardup_degree_profile"](spark, SF_SMOKE).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    n_pairs = QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).count()
    assert sum(r.degree * r.n_docs for r in rows) == 2 * n_pairs


def test_lpa_communities_cover_edge_nodes_and_refine_components(spark):
    """Every edge-bearing node gets exactly one label; community sizes
    restate the label multiset; and each community is contained in one
    connected component of the text near-dup graph (labels can only
    travel along edges), computed independently via union-find here."""
    from collections import Counter

    from .conftest import SF_SMOKE

    rows = QUERIES["neardup_lpa_communities"](spark, SF_SMOKE).collect()
    assert rows
    sizes = Counter(r.community for r in rows)
    for r in rows:
        assert sizes[r.community] == r.community_size
    pairs = QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    lab = {r.doc_id: r.community for r in rows}
    deg_nodes = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert deg_nodes == set(lab)
    # independent union-find over the same pair list
    parent = {n: n for n in deg_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.doc_a), find(p.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comm_to_comp: dict[int, int] = {}
    for n, c in lab.items():
        root = find(n)
        assert comm_to_comp.setdefault(c, root) == root, (
            f"community {c} spans components"
        )


def test_clustering_coefficient_bounds_and_triangles(spark):
    """cc in [0,1]; n_triangles reconciles with neardup_triangles; only
    deg>=2 nodes appear (a single edge has no wedge capacity)."""
    from .conftest import SF_SMOKE

    rows = QUERIES["neardup_clustering_coefficient"](spark, SF_SMOKE).collect()
    assert rows
    tri = {
        r.doc_id: r.n_triangles
        for r in QUERIES["neardup_triangles"](spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert r.degree >= 2
        assert 0.0 <= r.local_cc <= 1.0 + 1e-9
        assert r.n_triangles == tri.get(r.doc_id, 0)


def test_kcore_survivors_are_dense_subset(spark):
    """Every 2-core survivor must appear in the degree profile with
    degree >= its core degree; survivors shrink monotonically vs the
    full node set; core degrees >= 1 (edges among survivors only)."""
    core = {r.doc_id: r.core_degree for r in QUERIES["neardup_kcore_peel"](spark, SF_SMOKE).collect()}
    assert core, "2-core should be nonempty at smoke scale"
    from mapreduce_on_google_cloud_platform_spark.functions.text import (
        shingles_df,
    )
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _pair_jaccard,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from pyspark.sql import functions as F

    pairs = (
        _pair_jaccard(shingles_df(load_table(spark, SF_SMOKE, "documents")))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    )
    full_deg: dict[int, int] = {}
    for p in pairs:
        full_deg[p.doc_a] = full_deg.get(p.doc_a, 0) + 1
        full_deg[p.doc_b] = full_deg.get(p.doc_b, 0) + 1
    assert set(core) <= set(full_deg)
    for doc_id, cd in core.items():
        assert 1 <= cd <= full_deg[doc_id]


def test_link_prediction_matches_bruteforce_sets(spark):
    """Differential check against a set-based Python recompute over the
    same verified edge list: the candidate set is exactly the
    non-adjacent pairs with >=1 common neighbor, and every score
    reproduces (AA within the per-term decimal quantum)."""
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
    )

    pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
        if r.jaccard >= JACCARD_THRESHOLD
    }
    nbrs: dict[int, set] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expected = {}
    for a in nbrs:
        for b in nbrs:
            if a < b and (a, b) not in pairs:
                common = nbrs[a] & nbrs[b]
                if common:
                    expected[(a, b)] = (
                        len(common),
                        len(nbrs[a]),
                        len(nbrs[b]),
                        sum(1.0 / math.log(len(nbrs[z])) for z in common),
                    )
    rows = QUERIES["link_prediction_scores"](spark, SF_SMOKE).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == set(expected)
    for r in rows:
        cn, da, db, aa = expected[(r.doc_a, r.doc_b)]
        assert (r.common_neighbors, r.deg_a, r.deg_b) == (cn, da, db)
        assert abs(r.jaccard_nbr - round(cn / (da + db - cn), 6)) < 1e-12
        # two decimal(18,9) squashes per term -> <= 2*cn*5e-10 drift
        assert abs(r.adamic_adar - aa) <= 2e-9 * cn + 1e-12


def test_khop_reach_matches_python_bfs(spark):
    """Exact-BFS differential: reach_h equals |{u != v : dist(v,u) <= h}|
    from a pure-Python BFS over the same verified edge list, and reach
    is monotone in h."""
    from collections import deque

    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
    )
    from mapreduce_on_google_cloud_platform_spark.operators.graph import KHOP_H

    nbrs: dict[int, set] = {}
    for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect():
        if r.jaccard >= JACCARD_THRESHOLD:
            nbrs.setdefault(r.doc_a, set()).add(r.doc_b)
            nbrs.setdefault(r.doc_b, set()).add(r.doc_a)

    def bfs(v: int) -> list:
        dist = {v: 0}
        q = deque([v])
        while q:
            x = q.popleft()
            if dist[x] >= KHOP_H:
                continue
            for y in nbrs[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        return [
            sum(1 for u, d in dist.items() if u != v and d <= h)
            for h in range(1, KHOP_H + 1)
        ]

    rows = QUERIES["khop_reach_profile"](spark, SF_SMOKE).collect()
    assert {r.doc_id for r in rows} == set(nbrs)
    for r in rows:
        expect = bfs(r.doc_id)
        got = [r.reach_1, r.reach_2, r.reach_3]
        assert got == expect, r.doc_id
        assert got[0] <= got[1] <= got[2]


def test_ktruss_funnel_matches_python_recompute(spark):
    """Full differential replay of the bounded truss peel in Python over
    the same verified edge set."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        jaccard_pairs_indexed,
    )
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.operators.graph import (
        KTRUSS_K,
        KTRUSS_ROUNDS,
    )

    edges = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs_indexed(spark, SF_SMOKE)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .collect()
    }
    cur = set(edges)
    expect = []
    for r in range(1, KTRUSS_ROUNDS + 1):
        sup: dict[tuple, int] = {}
        adj: dict[int, set] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        for a, b in cur:
            sup[(a, b)] = len(adj[a] & adj[b])
        kept = {e for e in cur if sup[e] >= KTRUSS_K - 2}
        expect.append((r, len(cur), len(cur) - len(kept), len(kept)))
        cur = kept
    rows = sorted(
        QUERIES["ktruss_peel_funnel"](spark, SF_SMOKE).collect(),
        key=lambda r: r.round,
    )
    assert [
        (r.round, r.n_edges_in, r.n_dropped, r.n_edges_out) for r in rows
    ] == expect


def test_ktruss_funnel_is_monotone(spark):
    """Peeling is monotone: survivors only shrink, each round's input is
    the previous round's output, and drops are never negative."""
    from mapreduce_on_google_cloud_platform_spark.operators.graph import (
        KTRUSS_ROUNDS,
    )

    rows = sorted(
        QUERIES["ktruss_peel_funnel"](spark, SF_SMOKE).collect(),
        key=lambda r: r.round,
    )
    assert len(rows) == KTRUSS_ROUNDS
    for a, b in zip(rows, rows[1:]):
        assert b.n_edges_in == a.n_edges_out
    for r in rows:
        assert r.n_dropped >= 0
        assert r.n_edges_out == r.n_edges_in - r.n_dropped


def _python_edges(spark):
    """Independent recompute of the verified near-dup pair list at
    SF_SMOKE (mirrors the test_ktruss fixture construction)."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        jaccard_pairs_indexed,
    )

    return {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs_indexed(spark, SF_SMOKE)
        .filter(f"jaccard >= {JACCARD_THRESHOLD}")
        .select("doc_a", "doc_b")
        .collect()
    }


def test_modularity_contributions_sum_and_bounds(spark):
    """Sum of q_contrib is the modularity Q in (-1, 1]; integer columns
    reconcile: sum(intra_edges) <= m, sum(degree_sum) == 2m, and every
    community's nodes come from the LPA table."""
    pairs = _python_edges(spark)
    m = len(pairs)
    rows = QUERIES["graph_modularity_lpa"](spark, SF_SMOKE).collect()
    assert all(r.m_edges == m for r in rows)
    assert sum(r.degree_sum for r in rows) == 2 * m
    assert sum(r.intra_edges for r in rows) <= m
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0
    lpa = QUERIES["neardup_lpa_communities"](spark, SF_SMOKE).collect()
    comm_sizes = {}
    for r in lpa:
        comm_sizes[r.community] = comm_sizes.get(r.community, 0) + 1
    assert {r.community: r.n_nodes for r in rows} == comm_sizes


def test_assortativity_matches_python(spark):
    """Exact recompute: Pearson over the degree pairs of every directed
    edge end."""
    import math

    pairs = _python_edges(spark)
    ends = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg: dict[int, int] = {}
    for s, _ in ends:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, _ in ends]
    ys = [deg[d] for _, d in ends]
    n = len(ends)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    row = QUERIES["graph_degree_assortativity"](spark, SF_SMOKE).collect()[0]
    assert row.n_edge_ends == n
    fx, fy = float(n * sxx - sx * sx), float(n * syy - sy * sy)
    if fx > 0 and fy > 0:
        r = float(n * sxy - sx * sy) / (math.sqrt(fx) * math.sqrt(fy))
        assert row.assortativity == r
        assert -1.0 - 1e-12 <= row.assortativity <= 1.0 + 1e-12
    else:
        assert row.assortativity is None


def test_personalized_pagerank_matches_python(spark):
    """Exact integer fixed-point recompute of the seeded
    restart-walk recurrence."""
    from mapreduce_on_google_cloud_platform_spark.operators.graph import (
        PPR_SEEDS,
        PR_ITERS,
        PR_SCALE,
    )

    pairs = _python_edges(spark)
    ends = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg: dict[int, int] = {}
    adj_in: dict[int, list] = {}
    for s, d in ends:
        deg[s] = deg.get(s, 0) + 1
        adj_in.setdefault(d, []).append(s)
    seeds = [
        n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:PPR_SEEDS]
    base = 15 * PR_SCALE // 100
    r = {n: PR_SCALE for n in seeds}
    for _ in range(PR_ITERS):
        nxt = {}
        for v, ins in adj_in.items():
            s = sum(r.get(u, 0) // deg[u] for u in ins)
            if s:
                nxt[v] = (85 * s) // 100
        for v in seeds:
            nxt[v] = nxt.get(v, 0) + base
        r = nxt
    expect = {v: x for v, x in r.items() if x > 0}
    rows = QUERIES["personalized_pagerank"](spark, SF_SMOKE).collect()
    got = {x.doc_id: x for x in rows}
    assert set(got) == set(expect)
    for v, x in expect.items():
        assert got[v].ppr_fp == x
        assert got[v].deg == deg[v]
        assert got[v].is_seed == (v in seeds)
    # seeds dominate their own orbit: every seed present and positive
    for v in seeds:
        assert v in got and got[v].ppr_fp > 0
