"""Similarity search over the ``embeddings`` table (array<float> column).

Two declared operators:

* ``ann_topk_bruteforce`` -- exact top-k cosine neighbors for a
  deterministic query subset.  The *query side* is broadcast, so the scan
  of the big vector table stays map-side: at 100 TB this is a single pass,
  no shuffle of the corpus, and per-partition top-k before the final merge.
* ``ann_ivf_topk`` -- IVF-style pruned search: vectors are assigned to
  their nearest centroid (deterministic centroid set: every 40th vector,
  a stand-in for a k-means codebook -- training one is an offline concern,
  the serving plan is identical), queries probe the ``NPROBE`` nearest
  centroids and search only those cells.  Approximate by design; the
  DuckDB oracle replicates the identical algorithm, so results still
  hash-match exactly.

All cosine math is the sequential-fold form (functions/vectors.py):
bit-identical across engines, verified -- rank ties are broken by vec_id,
so top-k selection is fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, sql_cosine
from ..sources import load_table

K_NEIGHBORS = 10
QUERY_STRIDE = 50   # query set: vec_id % 50 == 0
CENTROID_STRIDE = 40  # centroid set: vec_id % 40 == 0
NPROBE = 2


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", as_double(F.col("embedding")).alias("v"))


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-K_NEIGHBORS for every QUERY_STRIDE-th vector."""
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= K_NEIGHBORS)
    )


ANN_BRUTEFORCE_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {QUERY_STRIDE} = 0),
    scored AS (
        SELECT q_id, e.vec_id AS neighbor_id,
               {sql_cosine('qv', 'e.v')} AS cos_sim
        FROM q, e WHERE e.vec_id <> q_id
    )
    SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {K_NEIGHBORS}
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned approximate top-k: search only the NPROBE cells whose
    centroids are nearest the query.

    Scale shape: the centroid table is tiny and broadcast twice (assignment
    pass + probe pass); the corpus is scanned once to build cell
    assignments (shuffle on cell_id only), and the search join hits
    |queries| x NPROBE cells instead of the whole corpus."""
    emb = _embeddings(spark, sf_dir)
    cents = F.broadcast(
        emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
            F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
        )
    )

    # assignment: every vector -> nearest centroid (tie: smallest cent_id)
    aw = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cent_id"))
    assign = (
        emb.crossJoin(cents)
        .select(
            "vec_id",
            "v",
            "cent_id",
            cosine(F.col("v"), F.col("cv")).alias("c_sim"),
        )
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", F.col("cent_id").alias("cell"))
    )

    # probe: every query -> NPROBE nearest centroids
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pw = Window.partitionBy("q_id").orderBy(F.desc("p_sim"), F.asc("cent_id"))
    probes = (
        queries.crossJoin(cents)
        .select(
            "q_id",
            "qv",
            "cent_id",
            cosine(F.col("qv"), F.col("cv")).alias("p_sim"),
        )
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= NPROBE)
        .select("q_id", "qv", F.col("cent_id").alias("cell"))
    )

    # search only the probed cells
    rw = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        probes.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
        .distinct()
        .withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= K_NEIGHBORS)
    )


ANN_IVF_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
              WHERE vec_id % {CENTROID_STRIDE} = 0),
    assign AS (
        SELECT vec_id, v, cent_id AS cell FROM (
            SELECT e.vec_id, e.v, cent_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {sql_cosine('e.v', 'cv')} DESC,
                                               cent_id) AS arn
            FROM e, cents
        ) WHERE arn = 1
    ),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {QUERY_STRIDE} = 0),
    probes AS (
        SELECT q_id, qv, cent_id AS cell FROM (
            SELECT q_id, qv, cent_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY {sql_cosine('qv', 'cv')} DESC,
                                               cent_id) AS prn
            FROM q, cents
        ) WHERE prn <= {NPROBE}
    ),
    scored AS (
        SELECT DISTINCT q_id, assign.vec_id AS neighbor_id,
               {sql_cosine('qv', 'assign.v')} AS cos_sim
        FROM probes JOIN assign USING (cell)
        WHERE assign.vec_id <> q_id
    )
    SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
    )
    WHERE rank <= {K_NEIGHBORS}
"""


SIMILARITY_QUERIES: list[tuple[str, object, str | None]] = [
    ("ann_topk_bruteforce", ann_topk_bruteforce, ANN_BRUTEFORCE_ORACLE),
    ("ann_ivf_topk", ann_ivf_topk, ANN_IVF_ORACLE),
]
