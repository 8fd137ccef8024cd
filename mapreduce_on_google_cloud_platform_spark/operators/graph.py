"""Graph analytics over the near-dup evidence graph: fixed-point PageRank.

Second iterative operator next to ``dedup.dedup_clusters`` (connected
components): rank documents by their centrality in the n-gram-Jaccard
near-duplicate graph -- high-rank nodes are the "template" documents a
curation pass should inspect first (boilerplate hubs duplicate into many
others).

Determinism contract (same discipline as kmeans_assign): ranks are
FIXED-POINT BIGINT micro-units, every update is integer arithmetic
(`div` floor division in Spark, `//` in DuckDB), so any partitioning,
engine, or iteration order yields bit-identical ranks.  The damping
update is

    r' = (15 * SCALE) div 100  +  (85 * sum_in(r div deg)) div 100

over the symmetrized edge list; PR_ITERS is fixed so the DuckDB oracle
is the same recurrence unrolled.

Scale shape: per iteration one shuffle-on-src join (edges x ranks x deg)
and one partial-aggregated groupBy on dst -- identical movement to one
large-star round.  Nodes outside any edge are excluded (their rank is
the uniform base; carrying them adds nothing).  For many iterations add
lineage truncation per round like dedup_clusters; 3 rounds doesn't need
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import DUCKDB_SHINGLES_CTE
from ..sources import load_table
from .dedup import JACCARD_THRESHOLD, jaccard_pairs_indexed

PR_SCALE = 10**12
PR_ITERS = 3


def neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    # localCheckpoint (eager), not a lazy persist: the expensive
    # shingle-join subplan is cut out of the iteration lineage entirely,
    # so each of the PR_ITERS loop plans is a 3-way join over the tiny
    # materialized edge list -- small plans, small generated code, no
    # risk of the jaccard stage ever re-running.  Same cluster caveat as
    # dedup_clusters: on TB-scale graphs use reliable checkpoints.
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    ranks = deg.select(F.col("src").alias("doc_id"), F.lit(PR_SCALE).alias("r"))
    base = 15 * PR_SCALE // 100
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div deg").alias("c"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("doc_id"),
                (F.lit(base) + F.expr("(85 * s) div 100")).alias("r"),
            )
        )
    return (
        ranks.join(deg, ranks.doc_id == deg.src)
        .select("doc_id", F.col("r").alias("pagerank_fp"), "deg")
        .orderBy(F.desc("pagerank_fp"), F.asc("doc_id"))
    )


def _unrolled_oracle() -> str:
    base = 15 * PR_SCALE // 100
    its = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        its.append(
            f"""
    it{k} AS (
        SELECT e.dst AS doc_id,
               CAST({base} + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
        FROM edges e
        JOIN {prev} r ON e.src = r.doc_id
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    )"""
        )
        prev = f"it{k}"
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    jpairs AS (
        SELECT doc_a, doc_b
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
              >= {JACCARD_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM jpairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT src AS doc_id, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
    {",".join(its)}
    SELECT r.doc_id, r.r AS pagerank_fp, d.deg
    FROM it{PR_ITERS} r JOIN deg d ON r.doc_id = d.src
    ORDER BY pagerank_fp DESC, doc_id
"""


PAGERANK_ORACLE = _unrolled_oracle()


def neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation in the near-dup graph -- the
    local clustering signal: a document whose near-dup neighbors are also
    near-dups of EACH OTHER sits inside a dense boilerplate clique, not a
    chain of pairwise coincidences, and is a stronger drop candidate.

    Plan: canonical (a<b) edges; wedges from one self-join on the middle
    vertex (a<b<c by construction, so each triangle is built exactly
    once); a LEFT SEMI join against the edge list closes them.  Two
    shuffle joins + one aggregate, never an all-triples enumeration.  At
    scale the skew lever is degree-ordered orientation (each edge
    pointed low->high degree bounds wedge fan-out by sqrt(|E|),
    Suri-Vassilvitskii's MapReduce triangle trick); id-orientation is
    kept here because the near-dup graph's degrees are small and the
    oracle stays a three-line SQL join."""
    # eager localCheckpoint for the same reason as neardup_pagerank: the
    # wedge and closure joins reference the edge list three times; cutting
    # the shingle-join lineage keeps those plans (and their codegen) tiny
    e = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    x, y = e.alias("x"), e.alias("y")
    wedges = x.join(y, F.col("x.doc_b") == F.col("y.doc_a")).select(
        F.col("x.doc_a").alias("a"),
        F.col("x.doc_b").alias("b"),
        F.col("y.doc_b").alias("c"),
    )
    tri = wedges.join(
        e,
        (F.col("a") == F.col("doc_a")) & (F.col("c") == F.col("doc_b")),
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "doc_id")
    )


TRIANGLES_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    e AS (
        SELECT doc_a, doc_b
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
              >= {JACCARD_THRESHOLD}
    ),
    tri AS (
        SELECT x.doc_a AS a, x.doc_b AS b, y.doc_b AS c
        FROM e x
        JOIN e y ON x.doc_b = y.doc_a
        WHERE EXISTS (
            SELECT 1 FROM e z WHERE z.doc_a = x.doc_a AND z.doc_b = y.doc_b
        )
    )
    SELECT doc_id, count(*) AS n_triangles
    FROM (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    GROUP BY doc_id
    ORDER BY n_triangles DESC, doc_id
"""

# ---------------------------------------------------------------------------
# Degree-distribution profile of the near-dup graph -- the first graph
# health check before running anything iterative on it: a heavy tail
# (one doc near-dup to hundreds) is the boilerplate-hub signature that
# says "cap shingles / expect skewed bands", degree-0 mass is the clean
# fraction.  One row per degree with doc count and corpus share.
#
# Scale: edge endpoints explode to 2|E| rows, combinable groupBy on
# doc_id for degrees, LEFT join back to documents for the zero-degree
# mass, then a combinable groupBy on degree (output bounded by max
# degree) and one broadcast scalar total.  No windows, no iteration.
# ---------------------------------------------------------------------------


def neardup_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    all_deg = (
        docs.select("doc_id")
        .join(deg, "doc_id", "left")
        .select(F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"))
    )
    hist = all_deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = hist.agg(F.sum("n_docs").cast("bigint").alias("total"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "degree",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("degree")
    )


DEGREE_PROFILE_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    jpairs AS (
        SELECT doc_a, doc_b
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
              >= {JACCARD_THRESHOLD}
    ),
    ends AS (
        SELECT doc_a AS doc_id FROM jpairs
        UNION ALL
        SELECT doc_b AS doc_id FROM jpairs
    ),
    deg AS (SELECT doc_id, count(*) AS degree FROM ends GROUP BY doc_id),
    all_deg AS (
        SELECT CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree
        FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id
    ),
    hist AS (SELECT degree, count(*) AS n_docs FROM all_deg GROUP BY degree),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM hist)
    SELECT degree, n_docs,
           round(CAST(n_docs AS DOUBLE) / total, 6) AS share
    FROM hist, tot
    ORDER BY degree
"""


# Shared SQL fragment: verified near-dup pairs + symmetrized edge list
# (identical text to the pagerank oracle's prelude).
_SQL_EDGES_CTE = f"""
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    jpairs AS (
        SELECT doc_a, doc_b
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
              >= {JACCARD_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM jpairs
    )"""


# ---------------------------------------------------------------------------
# Label-propagation communities -- the third iterative graph operator
# beside connected components (dedup_clusters) and PageRank: every node
# starts labeled by its own doc_id; each synchronous round it adopts
# the most frequent label among its neighbors, ties broken to the
# SMALLEST label.  Unlike components, LPA splits a chain of weak links
# into locally-dense communities -- the granularity at which "pick one
# survivor per template family" actually wants to operate.
#
# Determinism: the argmax is min(struct(-cnt, label)) -- pure integer
# comparison, no RNG, no update-order dependence (synchronous rounds),
# so any engine/partitioning agrees; LPA_ITERS is fixed so the DuckDB
# oracle is the same recurrence unrolled.
#
# Scale: per round one shuffle-on-src join (edges x labels) + one
# combinable (node, label) count + a k-bounded argmax -- the same data
# movement as a PageRank round; the edge list is localCheckpoint-ed so
# every round's plan is a small join over the materialized edges.
# ---------------------------------------------------------------------------

LPA_ITERS = 3


def neardup_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ITERS):
        labels = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("dst")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"),
                        F.col("label").alias("l"),
                    )
                ).alias("b")
            )
            .select(F.col("dst").alias("node"), F.col("b.l").alias("label"))
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("community"),
            "community_size",
        )
        .orderBy("doc_id")
    )


def _lpa_chain_sql() -> str:
    """The lp0..lpN label-propagation CTE chain (shared by the LPA
    oracle and the modularity oracle, which scores the same partition)."""
    its = []
    prev = "lp0"
    for k in range(1, LPA_ITERS + 1):
        its.append(
            f"""
    lp{k} AS (
        SELECT node, label FROM (
            SELECT e.dst AS node, r.label, count(*) AS cnt,
                   row_number() OVER (
                       PARTITION BY e.dst
                       ORDER BY count(*) DESC, r.label ASC
                   ) AS rn
            FROM edges e JOIN {prev} r ON e.src = r.node
            GROUP BY e.dst, r.label
        ) WHERE rn = 1
    )"""
        )
        prev = f"lp{k}"
    return (
        "lp0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),\n    "
        + ",".join(its)
    )


def _lpa_oracle() -> str:
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    {_SQL_EDGES_CTE},
    {_lpa_chain_sql()},
    csizes AS (
        SELECT label, CAST(count(*) AS BIGINT) AS community_size
        FROM lp{LPA_ITERS} GROUP BY label
    )
    SELECT r.node AS doc_id, r.label AS community, s.community_size
    FROM lp{LPA_ITERS} r JOIN csizes s USING (label)
    ORDER BY doc_id
"""


LPA_ORACLE = _lpa_oracle()


# ---------------------------------------------------------------------------
# Local clustering coefficient -- triangles normalized by wedge
# capacity: cc(v) = triangles_through(v) / C(deg(v), 2).  Separates the
# two degree-profile tails: a high-degree LOW-cc node is a boilerplate
# hub stitching unrelated docs together (shingle cap candidate), a
# high-degree HIGH-cc node sits inside one dense template clique (drop
# the clique, keep one survivor).
#
# Scale: reuses the triangle plan (wedge join + semi-join closure,
# never all-triples) and the degree aggregate; the coefficient is one
# integer-exact division per node with deg >= 2, LEFT-joined so
# triangle-free nodes report cc = 0 rather than vanishing.
# ---------------------------------------------------------------------------


def neardup_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    ends = e.select(F.col("doc_a").alias("doc_id")).unionByName(
        e.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    x, y = e.alias("x"), e.alias("y")
    wedges = x.join(y, F.col("x.doc_b") == F.col("y.doc_a")).select(
        F.col("x.doc_a").alias("a"),
        F.col("x.doc_b").alias("b"),
        F.col("y.doc_b").alias("c"),
    )
    tri = wedges.join(
        e,
        (F.col("a") == F.col("doc_a")) & (F.col("c") == F.col("doc_b")),
        "left_semi",
    )
    tri_per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri_per_node, "doc_id", "left")
        .select(
            "doc_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.round(
                F.coalesce("n_triangles", F.lit(0)).cast("double") * 2
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("local_cc"),
        )
        .orderBy("doc_id")
    )


CLUSTERING_COEFF_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    {_SQL_EDGES_CTE},
    deg AS (
        SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY src
    ),
    tri AS (
        SELECT x.doc_a AS a, x.doc_b AS b, y.doc_b AS c
        FROM jpairs x
        JOIN jpairs y ON x.doc_b = y.doc_a
        WHERE EXISTS (
            SELECT 1 FROM jpairs z WHERE z.doc_a = x.doc_a AND z.doc_b = y.doc_b
        )
    ),
    tpn AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS doc_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        GROUP BY doc_id
    )
    SELECT deg.doc_id, degree,
           CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
           round(CAST(coalesce(n_triangles, 0) AS DOUBLE) * 2
                 / (degree * (degree - 1)), 6) AS local_cc
    FROM deg LEFT JOIN tpn ON deg.doc_id = tpn.doc_id
    WHERE degree >= 2
    ORDER BY deg.doc_id
"""


# ---------------------------------------------------------------------------
# Bounded k-core peel -- the density filter between "connected" (components)
# and "locally dense" (LPA/triangles): iteratively remove nodes whose degree
# among the still-alive nodes is < KCORE_K.  Survivors of the 2-core peel
# sit in cyclic near-dup structure (true template families); pendant chains
# of one-off matches fall away.  The round count is FIXED (KCORE_ROUNDS),
# so the declared semantics is the deterministic "R-round peel" and the
# DuckDB oracle is the identical recurrence unrolled -- the
# PageRank/LPA discipline.  (A full fix-point peel would need a
# convergence probe per round; three rounds already removes
# chain-of-length-3 tails, and the recurrence is monotone so survivors
# only shrink.)
#
# Scale: each round is two LeftSemi joins (edges pruned to alive nodes on
# both endpoints) + one combinable degree count + a filter; no window, no
# collect.  Edges localCheckpoint once; each round's alive set is
# node-cardinality.
# ---------------------------------------------------------------------------

KCORE_K = 2
KCORE_ROUNDS = 3


def neardup_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    alive = edges.select(F.col("src").alias("node")).distinct()
    for _ in range(KCORE_ROUNDS):
        live_edges = edges.join(
            alive.select(F.col("node").alias("src")), "src", "left_semi"
        ).join(alive.select(F.col("node").alias("dst")), "dst", "left_semi")
        alive = (
            live_edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select(F.col("src").alias("node"))
        )
    final_edges = edges.join(
        alive.select(F.col("node").alias("src")), "src", "left_semi"
    ).join(alive.select(F.col("node").alias("dst")), "dst", "left_semi")
    return (
        final_edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("src").alias("doc_id"), "core_degree")
        .orderBy("doc_id")
    )


def _kcore_oracle() -> str:
    prev = "alive0"
    rounds = []
    for k in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""
    deg{k} AS (
        SELECT e.src AS node, count(*) AS d
        FROM edges e
        JOIN {prev} a ON e.src = a.node
        JOIN {prev} b ON e.dst = b.node
        GROUP BY e.src
    ),
    alive{k} AS (SELECT node FROM deg{k} WHERE d >= {KCORE_K})""")
        prev = f"alive{k}"
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
{_SQL_EDGES_CTE},
    alive0 AS (SELECT DISTINCT src AS node FROM edges),{",".join(rounds)}
    SELECT e.src AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM edges e
    JOIN {prev} a ON e.src = a.node
    JOIN {prev} b ON e.dst = b.node
    GROUP BY e.src
    ORDER BY doc_id
"""


KCORE_ORACLE = _kcore_oracle()


# ---------------------------------------------------------------------------
# Link prediction over the near-dup graph -- "which documents are
# PROBABLY near-dups that the threshold missed?"  The classic local
# scores for every non-adjacent pair sharing >=1 neighbor:
#
#   common_neighbors(a,b) = |N(a) n N(b)|
#   jaccard_nbr(a,b)      = cn / (deg_a + deg_b - cn)
#   adamic_adar(a,b)      = sum_{{z in N(a) n N(b)}} 1 / ln(deg_z)
#
# High scorers are re-verification candidates for the exact jaccard pass
# (the near-dup analogue of a second LSH band sweep) and the standard
# recall audit for the banded candidate generation itself.
#
# Plan: wedge enumeration a-z-b via one self-join on the shared middle
# vertex (a<b so each unordered pair forms once; z's degree is >=2 by
# construction, so ln(deg_z) > 0), then a LEFT ANTI join against the
# verified edge list drops already-adjacent pairs, a combinable groupBy
# on (a,b) reduces the wedge stream, and two joins attach endpoint
# degrees.  Same wedge-join shape (and the same degree-ordered
# orientation lever at scale) as neardup_triangles -- never an
# all-pairs enumeration.
#
# Float discipline: ln(deg) is squashed through DECIMAL(18,9)
# (text_tfidf precedent), 1/lndeg is then a correctly-rounded double op
# over bit-identical operands, and the per-wedge terms are re-squashed
# to DECIMAL(18,9) so the Adamic-Adar SUM is exact decimal arithmetic --
# order-independent across any shuffle layout, which a raw double sum is
# NOT (the two-layout stability check exists precisely for that bug).
# ---------------------------------------------------------------------------


def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()  # referenced 3x (two wedge legs + anti join)
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    x, y = edges.alias("x"), edges.alias("y")
    wedges = x.join(
        y,
        (F.col("x.dst") == F.col("y.src")) & (F.col("x.src") < F.col("y.dst")),
    ).select(
        F.col("x.src").alias("a"), F.col("x.dst").alias("z"), F.col("y.dst").alias("b")
    )
    candidates = wedges.join(
        pairs,
        (F.col("a") == F.col("doc_a")) & (F.col("b") == F.col("doc_b")),
        "left_anti",
    )
    lndeg9 = F.log(F.col("deg").cast("double")).cast("decimal(18,9)")
    terms = candidates.join(
        deg.select(F.col("src").alias("z"), lndeg9.alias("_ln9")), "z"
    ).select(
        "a",
        "b",
        (F.lit(1.0) / F.col("_ln9").cast("double")).cast("decimal(18,9)").alias("_aa9"),
    )
    grouped = terms.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum("_aa9").alias("_aa_sum"),
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    return (
        grouped.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            "common_neighbors",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard_nbr"),
            F.col("_aa_sum").cast("double").alias("adamic_adar"),
        )
        .orderBy("doc_a", "doc_b")
    )


LINK_PREDICTION_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
{_SQL_EDGES_CTE},
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    wedges AS (
        SELECT x.src AS a, x.dst AS z, y.dst AS b
        FROM edges x JOIN edges y ON x.dst = y.src AND x.src < y.dst
        WHERE NOT EXISTS (
            SELECT 1 FROM jpairs p WHERE p.doc_a = x.src AND p.doc_b = y.dst
        )
    ),
    terms AS (
        SELECT a, b,
               CAST(1.0 / CAST(CAST(ln(CAST(d.deg AS DOUBLE)) AS DECIMAL(18,9))
                               AS DOUBLE) AS DECIMAL(18,9)) AS aa9
        FROM wedges JOIN deg d ON wedges.z = d.src
    ),
    grouped AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
               sum(aa9) AS aa_sum
        FROM terms GROUP BY a, b
    )
    SELECT g.a AS doc_a, g.b AS doc_b, g.common_neighbors,
           da.deg AS deg_a, db.deg AS deg_b,
           round(CAST(g.common_neighbors AS DOUBLE)
                 / CAST(da.deg + db.deg - g.common_neighbors AS DOUBLE), 6)
               AS jaccard_nbr,
           CAST(aa_sum AS DOUBLE) AS adamic_adar
    FROM grouped g
    JOIN deg da ON g.a = da.src
    JOIN deg db ON g.b = db.src
    ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# k-hop reach profile (bounded neighborhood function) -- how far does
# contamination spread?  For every document in the near-dup graph, the
# number of DISTINCT documents within 1, 2 and 3 hops: the per-node
# neighborhood function N(v, h) whose growth shape separates isolated
# dup pairs (reach stalls) from boilerplate percolation (reach explodes
# geometrically) -- the graph-health counterpart of neardup_degree_
# profile one level deeper.
#
# Plan: KHOP_H bounded expansion rounds over the symmetrized edge list
# -- R_h = distinct(R_{h-1} UNION R_{h-1} JOIN edges), each one
# shuffle join + distinct -- then one combinable count per (src, h).
# Exact distinct reach is kept because the near-dup graph is sparse and
# h is a small constant; the 100 TB path for dense graphs is the
# HyperBall formulation (HLL registers per node, union instead of
# distinct -- mergeable, linear), which this engine would surface as a
# rows-only sketch query like sketch_summary.  Self is excluded.
# ---------------------------------------------------------------------------

KHOP_H = 3


def khop_reach_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    reach = edges.select("src", F.col("dst").alias("node")).distinct()
    counts = reach.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("reach_1")
    )
    for h in range(2, KHOP_H + 1):
        step = reach.join(
            edges.select(F.col("src").alias("node"), F.col("dst").alias("nxt")),
            "node",
        ).select("src", F.col("nxt").alias("node"))
        reach = (
            reach.unionByName(step)
            .filter(F.col("node") != F.col("src"))
            .distinct()
            .localCheckpoint()  # truncate the per-round lineage
        )
        counts = counts.join(
            reach.groupBy("src").agg(
                F.count(F.lit(1)).cast("bigint").alias(f"reach_{h}")
            ),
            "src",
        )
    return counts.select(
        F.col("src").alias("doc_id"),
        *[F.col(f"reach_{h}") for h in range(1, KHOP_H + 1)],
    ).orderBy("doc_id")


def _khop_oracle() -> str:
    rounds = []
    prev = "r1"
    for h in range(2, KHOP_H + 1):
        rounds.append(f"""
    r{h} AS (
        SELECT DISTINCT src, node FROM (
            SELECT src, node FROM {prev}
            UNION ALL
            SELECT p.src, e.dst AS node
            FROM {prev} p JOIN edges e ON p.node = e.src
        ) WHERE node <> src
    )""")
        prev = f"r{h}"
    cnt_ctes = ",".join(
        f"""
    c{h} AS (SELECT src, CAST(count(*) AS BIGINT) AS reach_{h}
             FROM r{h} GROUP BY src)"""
        for h in range(1, KHOP_H + 1)
    )
    joins = " ".join(f"JOIN c{h} USING (src)" for h in range(2, KHOP_H + 1))
    cols = ", ".join(f"reach_{h}" for h in range(1, KHOP_H + 1))
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
{_SQL_EDGES_CTE},
    r1 AS (SELECT DISTINCT src, dst AS node FROM edges),{",".join(rounds)},{cnt_ctes}
    SELECT src AS doc_id, {cols}
    FROM c1 {joins}
    ORDER BY doc_id
"""


KHOP_REACH_ORACLE = _khop_oracle()


# ---------------------------------------------------------------------------
# Bounded k-truss peel -- the EDGE-level density filter above k-core's
# node-level one: each round drops every edge sitting in fewer than
# KTRUSS_K - 2 triangles among the surviving edges.  A 2-core keeps any
# cycle (including long stringy ones); the 4-truss keeps only edges
# embedded in overlapping triangles -- the structure of a genuine
# template FAMILY rather than a chain of pairwise coincidences.  Output
# is the per-round peel funnel (edges in/dropped/out), the monitoring
# view a curation pass reads before trusting cluster survivors.
#
# Same bounded-round discipline as neardup_kcore_peel: KTRUSS_ROUNDS is
# FIXED, the declared semantics is the R-round peel, and the oracle is
# the identical recurrence unrolled (support counting is pure integer,
# so there is nothing floating to disagree on).  Each round's survivor
# set localCheckpoints (the peel is monotone; lineage would otherwise
# nest triangle joins R deep), and the funnel counts are in-plan one-row
# aggregates unioned -- no driver-side counting.
#
# Scale shape: one triangle enumeration per round -- the e1(x,y) ~
# e2(y,z) wedge equi-join closed by the e3(x,z) edge join, the
# neardup_triangles shape (degree-ordered orientation is the standard
# lever when the wedge join grows) -- then a combinable per-edge support
# rollup and a filter.  Never an all-pairs join.
# ---------------------------------------------------------------------------

KTRUSS_K = 4       # surviving edges sit in >= 2 triangles among survivors
KTRUSS_ROUNDS = 3


def ktruss_peel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cur = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    funnel = None
    for r in range(1, KTRUSS_ROUNDS + 1):
        e1, e2, e3 = cur.alias("e1"), cur.alias("e2"), cur.alias("e3")
        tri = (
            e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
            .join(
                e3,
                (F.col("e3.doc_a") == F.col("e1.doc_a"))
                & (F.col("e3.doc_b") == F.col("e2.doc_b")),
            )
            .select(
                F.col("e1.doc_a").alias("x"),
                F.col("e1.doc_b").alias("y"),
                F.col("e2.doc_b").alias("z"),
            )
        )
        support = (
            tri.select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
            .unionAll(
                tri.select(F.col("y").alias("doc_a"), F.col("z").alias("doc_b"))
            )
            .unionAll(
                tri.select(F.col("x").alias("doc_a"), F.col("z").alias("doc_b"))
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        kept = (
            cur.join(support, ["doc_a", "doc_b"], "left")
            .filter(F.coalesce(F.col("sup"), F.lit(0)) >= KTRUSS_K - 2)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        row = (
            cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges_in"))
            .crossJoin(
                F.broadcast(
                    kept.agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_edges_out")
                    )
                )
            )
            .select(
                F.lit(r).cast("int").alias("round"),
                "n_edges_in",
                (F.col("n_edges_in") - F.col("n_edges_out")).alias("n_dropped"),
                "n_edges_out",
            )
        )
        funnel = row if funnel is None else funnel.unionByName(row)
        cur = kept
    return funnel.orderBy("round")


def _ktruss_oracle() -> str:
    ctes = []
    prev = "edges0"
    rows = []
    for r in range(1, KTRUSS_ROUNDS + 1):
        ctes.append(f"""
    tri{r} AS MATERIALIZED (
        SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
        FROM {prev} e1
        JOIN {prev} e2 ON e1.doc_b = e2.doc_a
        JOIN {prev} e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    sup{r} AS (
        SELECT doc_a, doc_b, count(*) AS sup FROM (
            SELECT x AS doc_a, y AS doc_b FROM tri{r}
            UNION ALL SELECT y, z FROM tri{r}
            UNION ALL SELECT x, z FROM tri{r}
        ) GROUP BY 1, 2
    ),
    edges{r} AS MATERIALIZED (
        SELECT e.doc_a, e.doc_b
        FROM {prev} e LEFT JOIN sup{r} s USING (doc_a, doc_b)
        WHERE COALESCE(s.sup, 0) >= {KTRUSS_K - 2}
    )""")
        rows.append(
            f"SELECT {r} AS round,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM {prev}) AS n_edges_in,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM {prev})"
            f" - (SELECT CAST(count(*) AS BIGINT) FROM edges{r}) AS n_dropped,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM edges{r}) AS n_edges_out"
        )
        prev = f"edges{r}"
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
{_SQL_EDGES_CTE},
    edges0 AS MATERIALIZED (SELECT doc_a, doc_b FROM jpairs),{",".join(ctes)}
    SELECT round, n_edges_in, n_dropped, n_edges_out
    FROM ({" UNION ALL ".join(rows)})
    ORDER BY round
"""


KTRUSS_ORACLE = _ktruss_oracle()


# ---------------------------------------------------------------------------
# graph_modularity_lpa: Newman modularity of the LPA partition --
# Q = sum_c [ m_c/m - (D_c/(2m))^2 ] (Newman & Girvan 2004).  The
# LPA communities ship as the survivor-selection granularity; this is
# the number that says whether that partition actually captures dense
# template families (Q >> 0) or the graph is one undifferentiated blob
# (Q ~ 0) -- the acceptance gate on "pick one survivor per community".
#
# Everything is exact integers until the final per-community IEEE
# chain: m (undirected edge count), m_c (intra-community edges via two
# label joins on the pair list), D_c (degree mass via the symmetrized
# edge list).  The corpus scalar m rides a 1-row crossJoin (the
# graph.py:895 posture).  Zero-intra-edge communities are kept via a
# LEFT join + COALESCE 0: their q_contrib is pure degree penalty.
#
# Scale: the label joins are edge-keyed equi-joins against the LPA
# label table (node-bounded); no new join pattern beyond what the LPA
# rounds themselves shuffle.  The pair list is localCheckpoint-ed once
# and feeds edges, degrees, AND the label loop, so the shingle join
# runs exactly once.
# ---------------------------------------------------------------------------


def _symmetrized_edges(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )


def _lpa_labels(edges: DataFrame) -> DataFrame:
    """(node, label) after LPA_ITERS synchronous rounds (the
    neardup_lpa_communities recurrence, shared)."""
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ITERS):
        labels = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("dst")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"),
                        F.col("label").alias("l"),
                    )
                ).alias("b")
            )
            .select(F.col("dst").alias("node"), F.col("b.l").alias("label"))
        )
    return labels


def graph_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    edges = _symmetrized_edges(pairs).localCheckpoint()
    labels = _lpa_labels(edges)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    comm = (
        labels.join(deg, labels.node == deg.src)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("degree_sum"),
        )
    )
    la = labels.select(
        F.col("node").alias("doc_a"), F.col("label").alias("label_a")
    )
    lb = labels.select(
        F.col("node").alias("doc_b"), F.col("label").alias("label_b")
    )
    intra = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("label_a") == F.col("label_b"))
        .groupBy(F.col("label_a").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    m = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("m_edges"))
    md = F.col("m_edges").cast("double")
    dpen = F.col("degree_sum").cast("double") / (F.lit(2.0) * md)
    return (
        comm.join(intra, "label", "left")
        .na.fill({"intra_edges": 0})
        .crossJoin(F.broadcast(m))
        .select(
            F.col("label").alias("community"),
            "n_nodes",
            "degree_sum",
            F.col("intra_edges").cast("bigint").alias("intra_edges"),
            "m_edges",
            (
                F.col("intra_edges").cast("double") / md - dpen * dpen
            ).alias("q_contrib"),
        )
        .orderBy("community")
    )


MODULARITY_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    {_SQL_EDGES_CTE},
    {_lpa_chain_sql()},
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    comm AS (
        SELECT r.label,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d.deg) AS BIGINT) AS degree_sum
        FROM lp{LPA_ITERS} r JOIN deg d ON r.node = d.src
        GROUP BY r.label
    ),
    intra AS (
        SELECT la.label AS label,
               CAST(count(*) AS BIGINT) AS intra_edges
        FROM jpairs p
        JOIN lp{LPA_ITERS} la ON p.doc_a = la.node
        JOIN lp{LPA_ITERS} lb ON p.doc_b = lb.node
        WHERE la.label = lb.label
        GROUP BY la.label
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM jpairs)
    SELECT c.label AS community, c.n_nodes, c.degree_sum,
           CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           m.m_edges,
           CAST(COALESCE(i.intra_edges, 0) AS DOUBLE)
               / CAST(m.m_edges AS DOUBLE)
           - (CAST(c.degree_sum AS DOUBLE)
              / (2.0 * CAST(m.m_edges AS DOUBLE)))
             * (CAST(c.degree_sum AS DOUBLE)
                / (2.0 * CAST(m.m_edges AS DOUBLE))) AS q_contrib
    FROM comm c LEFT JOIN intra i USING (label), m
    ORDER BY community
"""


# ---------------------------------------------------------------------------
# graph_degree_assortativity: Newman degree-mixing coefficient (Newman
# 2002) -- Pearson r over (deg(src), deg(dst)) across the symmetrized
# edge ends.  Negative r on a near-dup graph is the hub-and-spoke
# boilerplate signature (high-degree template nodes attached to
# low-degree copies); positive r means dense like-with-like cliques.
# Together with neardup_degree_profile (the marginal) this is the
# second moment of the graph's shape.
#
# Sufficient statistics are exact DECIMAL(38,0) sums over the
# edge-ends table (the spearman discipline); r is one fixed IEEE chain
# with the degenerate regime (zero variance: a regular graph) an
# explicit NULL.  Scale: two node-keyed joins of the edge list against
# the degree table, one combinable aggregate -- no windows, no
# iteration.
# ---------------------------------------------------------------------------


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    edges = _symmetrized_edges(pairs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dx = deg.select(F.col("src").alias("_sx"), F.col("deg").alias("deg_src"))
    dy = deg.select(F.col("src").alias("_dy"), F.col("deg").alias("deg_dst"))
    ends = (
        edges.join(dx, edges.src == dx._sx)
        .join(dy, edges.dst == dy._dy)
        .select("deg_src", "deg_dst")
    )
    DEC = "decimal(38,0)"
    d = lambda c: F.col(c).cast(DEC)  # noqa: E731
    agg = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edge_ends"),
        F.sum(d("deg_src")).alias("sx"),
        F.sum(d("deg_dst")).alias("sy"),
        F.sum(d("deg_src") * d("deg_dst")).alias("sxy"),
        F.sum(d("deg_src") * d("deg_src")).alias("sxx"),
        F.sum(d("deg_dst") * d("deg_dst")).alias("syy"),
    )
    n = F.col("n_edge_ends").cast(DEC)
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    fx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "n_edge_ends",
        (F.col("sx").cast("double") / F.col("n_edge_ends").cast("double")).alias(
            "mean_degree"
        ),
        F.when((fx > 0) & (fy > 0), num / (F.sqrt(fx) * F.sqrt(fy))).alias(
            "assortativity"
        ),
    )


ASSORTATIVITY_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    {_SQL_EDGES_CTE},
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    ends AS (
        SELECT dx.deg AS deg_src, dy.deg AS deg_dst
        FROM edges e
        JOIN deg dx ON e.src = dx.src
        JOIN deg dy ON e.dst = dy.src
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_edge_ends,
               sum(CAST(deg_src AS DECIMAL(38,0))) AS sx,
               sum(CAST(deg_dst AS DECIMAL(38,0))) AS sy,
               sum(CAST(deg_src AS DECIMAL(38,0))
                   * CAST(deg_dst AS DECIMAL(38,0))) AS sxy,
               sum(CAST(deg_src AS DECIMAL(38,0))
                   * CAST(deg_src AS DECIMAL(38,0))) AS sxx,
               sum(CAST(deg_dst AS DECIMAL(38,0))
                   * CAST(deg_dst AS DECIMAL(38,0))) AS syy
        FROM ends
    )
    SELECT n_edge_ends,
           CAST(sx AS DOUBLE) / CAST(n_edge_ends AS DOUBLE) AS mean_degree,
           CASE WHEN CAST(CAST(n_edge_ends AS DECIMAL(38,0)) * sxx - sx * sx
                          AS DOUBLE) > 0
                 AND CAST(CAST(n_edge_ends AS DECIMAL(38,0)) * syy - sy * sy
                          AS DOUBLE) > 0
                THEN CAST(CAST(n_edge_ends AS DECIMAL(38,0)) * sxy - sx * sy
                          AS DOUBLE)
                     / (sqrt(CAST(CAST(n_edge_ends AS DECIMAL(38,0)) * sxx
                                  - sx * sx AS DOUBLE))
                        * sqrt(CAST(CAST(n_edge_ends AS DECIMAL(38,0)) * syy
                                    - sy * sy AS DOUBLE)))
           END AS assortativity
    FROM agg
"""


# ---------------------------------------------------------------------------
# personalized_pagerank: random-walk-with-restart proximity to a SEED
# set (Jeh & Widom 2003) -- global pagerank says "this is a template
# hub"; PPR answers the follow-up "which docs are in THIS hub's
# orbit?", the expansion query behind contamination-style blast-radius
# checks ("everything near these known-bad documents").  Seeds are the
# top PPR_SEEDS nodes by degree (deterministic: deg desc, doc_id asc
# over the node-bounded degree table); restart mass goes ONLY to
# seeds:
#
#     r'_v = [v in S] * (15 * SCALE div 100)  +  (85 * sum_in(r div deg)) div 100
#
# Same fixed-point BIGINT micro-unit discipline as neardup_pagerank
# (floor div everywhere, PR_ITERS unrolled in the oracle); the
# per-round FULL OUTER join keeps contribution-less seeds alive.
# Scale shape identical to a pagerank round plus one broadcast-sized
# seed table.
# ---------------------------------------------------------------------------

PPR_SEEDS = 4


def personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    edges = _symmetrized_edges(pairs).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    wseed = Window.orderBy(F.desc("deg"), F.asc("src"))
    base = 15 * PR_SCALE // 100
    seeds = (
        deg.withColumn("seed_rank", F.row_number().over(wseed))
        .where(F.col("seed_rank") <= PPR_SEEDS)
        .select(F.col("src").alias("doc_id"), F.lit(base).alias("b"))
        .localCheckpoint()
    )
    ranks = seeds.select("doc_id", F.lit(PR_SCALE).alias("r"))
    for _ in range(PR_ITERS):
        walk = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(F.col("dst").alias("doc_id"), F.expr("(85 * s) div 100").alias("w"))
        )
        ranks = (
            walk.join(seeds, "doc_id", "full_outer")
            .select(
                "doc_id",
                (
                    F.coalesce(F.col("b"), F.lit(0))
                    + F.coalesce(F.col("w"), F.lit(0))
                ).alias("r"),
            )
        )
    return (
        ranks.join(deg, ranks.doc_id == deg.src)
        .join(
            seeds.select("doc_id", F.lit(True).alias("is_seed")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.col("r").alias("ppr_fp"),
            "deg",
            F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed"),
        )
        .where(F.col("ppr_fp") > 0)
        .orderBy(F.desc("ppr_fp"), F.asc("doc_id"))
    )


def _ppr_oracle() -> str:
    base = 15 * PR_SCALE // 100
    its = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        its.append(
            f"""
    it{k} AS (
        SELECT COALESCE(w.doc_id, sb.doc_id) AS doc_id,
               CAST(COALESCE(sb.b, 0) + COALESCE(w.w, 0) AS BIGINT) AS r
        FROM (
            SELECT e.dst AS doc_id,
                   (85 * sum(r.r // d.deg)) // 100 AS w
            FROM edges e
            JOIN {prev} r ON e.src = r.doc_id
            JOIN deg d ON e.src = d.src
            GROUP BY e.dst
        ) w
        FULL JOIN seeds sb ON w.doc_id = sb.doc_id
    )"""
        )
        prev = f"it{k}"
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    {_SQL_EDGES_CTE},
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    seeds AS (
        SELECT src AS doc_id, CAST({base} AS BIGINT) AS b
        FROM (
            SELECT src, row_number() OVER (ORDER BY deg DESC, src) AS rk
            FROM deg
        ) WHERE rk <= {PPR_SEEDS}
    ),
    r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS r FROM seeds),
    {",".join(its)}
    SELECT r.doc_id AS doc_id, r.r AS ppr_fp, d.deg,
           (s.doc_id IS NOT NULL) AS is_seed
    FROM it{PR_ITERS} r
    JOIN deg d ON r.doc_id = d.src
    LEFT JOIN seeds s ON r.doc_id = s.doc_id
    WHERE r.r > 0
    ORDER BY ppr_fp DESC, r.doc_id
"""


PPR_ORACLE = _ppr_oracle()


GRAPH_QUERIES: list[tuple[str, object, str | None]] = [
    ("personalized_pagerank", personalized_pagerank, PPR_ORACLE),
    ("graph_modularity_lpa", graph_modularity_lpa, MODULARITY_ORACLE),
    (
        "graph_degree_assortativity",
        graph_degree_assortativity,
        ASSORTATIVITY_ORACLE,
    ),
    ("ktruss_peel_funnel", ktruss_peel_funnel, KTRUSS_ORACLE),
    ("neardup_kcore_peel", neardup_kcore_peel, KCORE_ORACLE),
    ("link_prediction_scores", link_prediction_scores, LINK_PREDICTION_ORACLE),
    ("khop_reach_profile", khop_reach_profile, KHOP_REACH_ORACLE),
    ("neardup_pagerank", neardup_pagerank, PAGERANK_ORACLE),
    ("neardup_triangles", neardup_triangles, TRIANGLES_ORACLE),
    ("neardup_degree_profile", neardup_degree_profile, DEGREE_PROFILE_ORACLE),
    ("neardup_lpa_communities", neardup_lpa_communities, LPA_ORACLE),
    (
        "neardup_clustering_coefficient",
        neardup_clustering_coefficient,
        CLUSTERING_COEFF_ORACLE,
    ),
]
