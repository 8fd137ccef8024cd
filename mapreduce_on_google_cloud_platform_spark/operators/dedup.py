"""Deduplication suite for large-scale training-data pipelines.

Five strategies over the ``documents`` / ``embeddings`` tables, each a
``queries()`` entry with a DuckDB oracle that replicates the *same
deterministic algorithm* (portable md5 hashing, functions/hashing.py), so
approximate methods still hash-match exactly:

* exact           -- md5 of normalized content, hash group-by
* n-gram Jaccard  -- shingle inverted-index join + exact set similarity
* MinHash LSH     -- 16 min-hashes, 8 bands x 2 rows, candidate join,
                     exact-Jaccard verification of candidates
* SimHash         -- 32-bit frequency-weighted signature; near-pairs via
                     4-bit band join with a *provable* recall guarantee
                     (hamming <= 7 across 8 bands leaves >=1 band intact)
* embedding cosine -- exact near-dup pairs over array<float> embeddings

Scale posture (100 TB): every pipeline is shuffle-on-key (shingle / band /
hash bucket) with map-side partial aggregation; nothing is quadratic
except the declared-exact ``dedup_embedding_pairs`` (its scale path is the
banded/IVF variants in operators/similarity.py).  At petabyte scale the
shingle join wants a stop-shingle cap (drop shingles present in > K docs:
they contribute candidates, not similarity); left off here because it
changes declared semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    BITS16,
    HEX_DIGITS,
    MINHASH_AB,
    MINHASH_BANDS,
    MINHASH_P,
    NUM_MINHASHES,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_WIDE_BANDS,
    SIMHASH_WIDE_BITS,
)
from ..functions.text import (
    DUCKDB_SHINGLES_CTE,
    DUCKDB_TOKS_CTE,
    TOKEN_SPLIT_RE,
    clean_token,
    shingles_df,
    tokenize,
    tokens_df,
)
from ..functions.vectors import (
    SQL_NORMALIZED_CTE,
    flat_dot,
    flat_normalized,
    sql_dot,
)
from ..sources import load_table

JACCARD_THRESHOLD = 0.2  # chosen to be non-trivial on the synthetic corpus
HAMMING_MAX = 7          # recall-exact for 8 bands of 4 bits (pigeonhole)
COSINE_NEAR_DUP = 0.4    # non-trivial on the synthetic embeddings

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def _norm_text(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: md5 over whitespace-normalized lowercase text,
    keep the smallest doc_id per group.  One shuffle on the hash; the
    winner-pick is a plain min aggregate (no window needed)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5(_norm_text(F.col("text"))).alias("content_hash"), "doc_id"
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


DEDUP_EXACT_ORACLE = """
    SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
"""

# ---------------------------------------------------------------------------
# N-gram Jaccard (exact set similarity via shingle inverted index)
# ---------------------------------------------------------------------------


def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """distinct (doc_id, sh) -> (doc_a, doc_b, n_common, n_union, jaccard).

    Inverted-index join: only docs sharing >=1 shingle ever meet, so the
    candidate space is data-sparse, not O(n^2)."""
    sh = sh.persist()  # consumed by sizes + both join sides
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("sa.n") + F.col("sb.n") - F.col("n_common")).alias("n_union"),
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe path: one filter over the materialized exact pair table
    return jaccard_pairs_indexed(spark, sf_dir).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


NGRAM_JACCARD_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           sa.n + sb.n - n_common AS n_union,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""

# ---------------------------------------------------------------------------
# Jaccard threshold sensitivity curve: how many near-dup pairs each
# candidate threshold would keep -- the tuning table consulted BEFORE
# fixing JACCARD_THRESHOLD for a corpus pass (a cliff between two
# steps means the corpus has a natural dup/non-dup separation there;
# a smooth slope means the threshold is a real policy choice).  One
# pass over the exact inverted-index pair stream: every ladder step is
# a conditional sum in the same combinable aggregate, then the single
# row explodes to one row per threshold.
# ---------------------------------------------------------------------------

JACCARD_LADDER = (0.1, 0.2, 0.3, 0.5, 0.7, 0.9)


def jaccard_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = jaccard_pairs_indexed(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_candidate_pairs")]
    for t in JACCARD_LADDER:
        aggs.append(
            F.sum(F.when(F.col("jaccard") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"ge_{str(t).replace('.', '_')}")
        )
    one = pairs.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"ge_{str(t).replace('.', '_')}").alias("n_pairs_kept"),
            )
            for t in JACCARD_LADDER
        ]
    )
    return (
        one.select("n_candidate_pairs", F.explode(rows).alias("r"))
        .select(
            F.col("r.threshold").alias("threshold"),
            F.col("r.n_pairs_kept").alias("n_pairs_kept"),
            "n_candidate_pairs",
            F.round(
                F.col("r.n_pairs_kept").cast("double")
                / F.col("n_candidate_pairs"),
                6,
            ).alias("keep_fraction"),
        )
        .orderBy("threshold")
    )


def _jaccard_curve_oracle() -> str:
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({t} AS DOUBLE) AS threshold,
           CAST(sum(CASE WHEN jaccard >= {t} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs_kept,
           count(*) AS n_candidate_pairs,
           round(CAST(sum(CASE WHEN jaccard >= {t} THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS keep_fraction
    FROM pairs"""
        for t in JACCARD_LADDER
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    )
{selects}
    ORDER BY threshold
"""


JACCARD_CURVE_ORACLE = _jaccard_curve_oracle()


# ---------------------------------------------------------------------------
# Prefix-filter exact Jaccard join (SSJoin: Chaudhuri, Ganti & Kaushik
# 2006 "A primitive operator for similarity joins"; prefix length per
# Bayardo, Ma & Srikant 2007 / PPJoin, Xiao et al. 2008) -- the EXACT
# set-similarity join that scales where the plain inverted-index join
# (dedup_ngram_jaccard's shape) does not.  The inverted-index join
# expands EVERY shared shingle into a candidate row, so one boilerplate
# shingle shared by 10^6 docs contributes 10^12 pairs on its own.  The
# prefix filter instead orders each doc's shingles by GLOBAL RARITY
# (ascending df, ties on the shingle text -- a total order, identical
# in both engines) and joins only on each doc's first
#     p = n - ceil(t*n) + 1
# rarest shingles: if two docs share NO prefix shingle, every common
# shingle sits in a suffix shorter than ceil(t*n) <= |A intersect B|,
# contradicting J >= t -- so recall is PROVABLY 1.0 (pytest-pinned
# against the unfiltered exact pair table), while the join keys are by
# construction the SHORTEST posting lists in the corpus.  A size filter
# (J >= t implies min(na,nb)/max(na,nb) >= t, checked in exact integer
# form) prunes candidates before verification; verification intersects
# the two docs' shingle arrays -- per-pair work bounded by doc length,
# order-insensitive (size of a distinct-set intersection), no second
# pass over the inverted index.
#
# Threshold is the exact rational T_NUM/T_DEN; every membership test is
# integer arithmetic (prefix length, size ratio, n_common*DEN >=
# n_union*NUM), so the kept-pair set is engine-exact; the reported
# jaccard is the usual single double division.
#
# Scale: df + sizes are combinable groupBys; the rank window shuffles
# on doc_id (bounded partitions: one doc's shingles); the candidate
# join shuffles on PREFIX shingles only -- the df-ascending order means
# the heaviest posting lists never become join keys unless a doc is
# nearly all-boilerplate, exactly the skew the stop-shingle variant
# drops.  At 100 TB this is the published exact-dedup architecture;
# MinHash LSH remains the recall<1 shortcut when even prefix lists are
# too hot.
# ---------------------------------------------------------------------------

PREFIX_JACCARD_NUM = 1  # threshold t = 1/2, kept rational for integer tests
PREFIX_JACCARD_DEN = 2


def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    num, den = PREFIX_JACCARD_NUM, PREFIX_JACCARD_DEN
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs).persist()  # feeds df, sizes, rank, and arrays
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "sh")
    ordered = (
        sh.join(dfreq, "sh")
        .select("doc_id", "sh", "df")
        .withColumn("pos", F.row_number().over(w))
    )
    pref = (
        ordered.join(sizes, "doc_id")
        # p = n - ceil(t*n) + 1, ceil in exact integer form
        .filter(
            F.col("pos")
            <= F.col("n")
            - F.expr(f"(n * {num} + {den} - 1) div {den}")
            + F.lit(1)
        )
        .select("doc_id", "sh", "n")
    )
    # both sides of the candidate self-join read pref: unpersisted, the
    # df join + per-doc rank window would run twice (the dedup_minhash_lsh
    # bands lesson -- measured 8x there)
    pref = pref.persist()
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        # size filter: J >= t implies min/max >= t, exact integer form
        .filter(
            F.least(F.col("a.n"), F.col("b.n")) * den
            >= F.greatest(F.col("a.n"), F.col("b.n")) * num
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    arrs = sh.groupBy("doc_id").agg(F.collect_list("sh").alias("arr"))
    verified = (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b"))
            .cast("bigint")
            .alias("n_common"),
            (F.col("na") + F.col("nb")).alias("nab"),
        )
        .withColumn("n_union", (F.col("nab") - F.col("n_common")).cast("bigint"))
        .filter(F.col("n_common") * den >= F.col("n_union") * num)
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "n_common",
        "n_union",
        (F.col("n_common").cast("double") / F.col("n_union")).alias("jaccard"),
    )


PREFIX_FILTER_JACCARD_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    dfreq AS (SELECT sh, count(*) AS df FROM shing GROUP BY sh),
    ordered AS (
        SELECT s.doc_id, s.sh,
               row_number() OVER (
                   PARTITION BY s.doc_id ORDER BY d.df, s.sh
               ) AS pos
        FROM shing s JOIN dfreq d USING (sh)
    ),
    pref AS (
        SELECT o.doc_id, o.sh, z.n
        FROM ordered o JOIN sizes z USING (doc_id)
        WHERE o.pos <= z.n
            - ((z.n * {PREFIX_JACCARD_NUM} + {PREFIX_JACCARD_DEN} - 1)
               // {PREFIX_JACCARD_DEN}) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        a.n AS na, b.n AS nb
        FROM pref a JOIN pref b
            ON a.sh = b.sh AND a.doc_id < b.doc_id
        WHERE least(a.n, b.n) * {PREFIX_JACCARD_DEN}
              >= greatest(a.n, b.n) * {PREFIX_JACCARD_NUM}
    ),
    arrs AS (SELECT doc_id, list(sh) AS arr FROM shing GROUP BY doc_id),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(aa.arr, ab.arr)) AS BIGINT) AS n_common,
               CAST(c.na + c.nb - len(list_intersect(aa.arr, ab.arr))
                    AS BIGINT) AS n_union
        FROM cand c
        JOIN arrs aa ON c.doc_a = aa.doc_id
        JOIN arrs ab ON c.doc_b = ab.doc_id
    )
    SELECT doc_a, doc_b, n_common, n_union,
           CAST(n_common AS DOUBLE) / n_union AS jaccard
    FROM verified
    WHERE n_common * {PREFIX_JACCARD_DEN} >= n_union * {PREFIX_JACCARD_NUM}
"""


# ---------------------------------------------------------------------------
# Asymmetric containment: |A n B| / min(|A|,|B|) over shingle sets --
# catches a short document EMBEDDED in a long one (quoted mail, header
# boilerplate, excerpted article), which Jaccard structurally misses:
# a 50-shingle doc inside a 5000-shingle doc has containment 1.0 but
# Jaccard <= 0.01, far under any near-dup threshold.  Candidates come
# from the same data-sparse shingle inverted-index join as
# dedup_ngram_jaccard (only docs sharing a shingle ever meet); the
# containment orientation (which doc is contained) is decided
# deterministically by set size with doc_id as tie-break.  Scale note:
# MinHash bands UNDERestimate containment (they sample the union), so
# the banded scale path for this operator hashes the SMALLER side's
# shingles only (one-permutation containment sketch); here the exact
# inverted-index form is declared, matching the ngram-jaccard family.
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.5


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles_indexed(spark, sf_dir)  # parquet-backed: no persist needed
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    joined = inter.join(sa, F.col("doc_a") == F.col("sa.doc_id")).join(
        sb, F.col("doc_b") == F.col("sb.doc_id")
    )
    a_contained = F.col("sa.n") <= F.col("sb.n")  # tie -> lower doc_id
    n_contained = F.least(F.col("sa.n"), F.col("sb.n"))
    containment = F.col("n_common").cast("double") / n_contained
    return (
        joined.select(
            F.when(a_contained, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "doc_contained"
            ),
            F.when(a_contained, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "doc_container"
            ),
            "n_common",
            n_contained.alias("n_contained"),
            F.round(containment, 6).alias("containment"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .orderBy("doc_contained", "doc_container")
    )


CONTAINMENT_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    oriented AS (
        SELECT CASE WHEN sa.n <= sb.n THEN doc_a ELSE doc_b END AS doc_contained,
               CASE WHEN sa.n <= sb.n THEN doc_b ELSE doc_a END AS doc_container,
               n_common,
               least(sa.n, sb.n) AS n_contained,
               round(CAST(n_common AS DOUBLE) / least(sa.n, sb.n), 6)
                   AS containment,
               round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
                   AS jaccard
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    )
    SELECT * FROM oriented
    WHERE containment >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc_contained, doc_container
"""

# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def _sig_from_shingles(sh: DataFrame) -> DataFrame:
    """distinct (doc_id, sh) -> (doc_id, mh0..mh15): the k=16
    universal-hash MinHash signature (functions/hashing.py: one md5 per
    DICTIONARY entry reduced mod P, then 16 affine lanes of pure int64
    arithmetic).

    Two scale properties: (a) hash the dictionary, not the occurrences --
    md5 runs once per distinct shingle string and joins back to the
    (doc, shingle) rows, so hashing cost tracks the vocabulary, not the
    corpus; (b) the lanes are flat int columns, so the signature
    aggregation is one groupBy with 16 partial mins (map-side combined),
    no seed explode, no pivot, and the shuffle carries 16 ints per row
    instead of 16 (seed, hex-string) rows."""
    uniq = sh.select("sh").distinct()
    h = (
        F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10).cast("bigint")
        % MINHASH_P
    )
    dict_df = uniq.select(
        "sh",
        *[
            ((F.lit(a) * h + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ],
    )
    return (
        sh.join(dict_df, "sh")
        .groupBy("doc_id")
        .agg(*[F.min(f"mh{i}").alias(f"mh{i}") for i in range(NUM_MINHASHES)])
    )


def _bands_from_sig(
    sig: DataFrame,
    bands: int = MINHASH_BANDS,
    rows_per_band: int | None = None,
) -> DataFrame:
    """(doc_id, mh0..mh15) -> (doc_id, band, band_key): band key = md5 of
    the band's concatenated signature lanes.  Pure map-side projection --
    a layout change never reshuffles the signature table."""
    if rows_per_band is None:
        rows_per_band = NUM_MINHASHES // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """distinct (doc_id, sh) -> (doc_id, band, band_key), 8 bands x 2 rows."""
    return _bands_from_sig(_sig_from_shingles(sh))


def _band_candidates(bands: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) -> distinct candidate (doc_a, doc_b):
    the LSH bucket self-join (shuffle-on-band-key, never all pairs)."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Materialized intermediates (round 10, VERDICT r9 item #3): the shared
# index tables every heavy dedup query was rebuilding from raw, persisted
# once per dataset via sources/index_store (index-build / probe split).
# dedup_minhash_lsh stays end-to-end-from-raw as the family's full
# oracle-checked pipeline; tests/test_dedup.py pins that the store-built
# near-dup pair table is row-identical to it.
# ---------------------------------------------------------------------------


def shingles_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized distinct (doc_id, sh) shingle posting table."""
    from ..sources.index_store import materialized

    return materialized(
        spark,
        sf_dir,
        "shingles",
        "v1",
        lambda s, d: shingles_df(load_table(s, d, "documents")),
    )


def minhash_sig_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-doc 16-lane MinHash signature table."""
    from ..sources.index_store import materialized

    return materialized(
        spark,
        sf_dir,
        "minhash_sig",
        f"v1-k{NUM_MINHASHES}",
        lambda s, d: _sig_from_shingles(shingles_indexed(s, d)),
    )


def jaccard_pairs_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized exact pair table: every doc pair sharing >= 1 shingle,
    with (n_common, n_union, jaccard).  The single most re-derived
    intermediate in the family -- the inverted-index join output."""
    from ..sources.index_store import materialized

    return materialized(
        spark,
        sf_dir,
        "jaccard_pairs",
        "v1",
        lambda s, d: _pair_jaccard(shingles_indexed(s, d)),
    )


def neardup_pairs_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized verified MinHash-LSH near-dup pairs (doc_a, doc_b,
    jaccard) -- bit-identical to ``dedup_minhash_lsh`` (test-pinned):
    restricting the exact-Jaccard table to candidate pairs is the same
    set whether the shingle table was pre-filtered to candidate docs
    (the from-raw plan) or not (here), because pair statistics depend
    only on the two docs' own shingle sets."""
    from ..sources.index_store import materialized

    def _build(s: SparkSession, d: str) -> DataFrame:
        cand = _band_candidates(_bands_from_sig(minhash_sig_indexed(s, d)))
        jac = jaccard_pairs_indexed(s, d)
        return (
            cand.join(jac, ["doc_a", "doc_b"])
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "jaccard")
        )

    return materialized(
        spark, sf_dir, "neardup_pairs", f"v1-j{JACCARD_THRESHOLD}", _build
    )


def simhash_pairs_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized SimHash near-dup pair table (the CC family's edges)."""
    from ..sources.index_store import materialized

    return materialized(
        spark,
        sf_dir,
        "simhash_pairs",
        f"v1-h{HAMMING_MAX}",
        lambda s, d: simhash_near_pairs(s, d),
    )


def simhash_clusters_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized connected-components cluster report over the SimHash
    graph -- ``dedup_clusters``'s exact output (that query stays
    from-raw as the iterative pipeline's oracle-checked variant)."""
    from ..sources.index_store import materialized

    return materialized(
        spark,
        sf_dir,
        "simhash_clusters",
        f"v1-h{HAMMING_MAX}",
        lambda s, d: dedup_clusters(s, d),
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection: band-bucket join proposes candidate
    pairs, exact Jaccard (computed only for candidates) verifies them.

    At 100 TB this is THE dedup plan: the only wide exchanges are
    shuffle-on-shingle (signatures) and shuffle-on-band-key (candidates);
    verification touches candidate docs only, never all pairs."""
    docs = load_table(spark, sf_dir, "documents")
    # persist every subplan referenced from more than one branch: Spark has
    # no cross-branch common-subexpression reuse, so an unpersisted `bands`
    # would be recomputed for BOTH sides of its self-join (and `cand` for
    # each of its three consumers) -- measured 8x slower without these.
    sh = shingles_df(docs).persist()
    bands = _minhash_bands(sh).persist()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .persist()
    )
    # exact-Jaccard verification for CANDIDATES ONLY: semi-join the shingle
    # table down to candidate docs before intersecting, so verification
    # cost scales with candidates, not with every shingle-sharing pair.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(cand_docs, "doc_id", "left_semi")
    jac = _pair_jaccard(sh_cand)
    return (
        cand.join(jac, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_oracle() -> str:
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ") AS band_key FROM sig"
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT cand.doc_a, cand.doc_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM cand
    JOIN pairs ON cand.doc_a = pairs.doc_a AND cand.doc_b = pairs.doc_b
    JOIN sizes sa ON cand.doc_a = sa.doc_id
    JOIN sizes sb ON cand.doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


MINHASH_LSH_ORACLE = _minhash_oracle()


# ---------------------------------------------------------------------------
# MinHash banding sensitivity: the bands x rows tradeoff table over the
# SAME 16-lane signature -- more bands of fewer rows raise recall (any
# one band match proposes the pair) at the cost of more candidates;
# fewer, deeper bands are precise but miss borderline pairs.  One row
# per layout: candidate count, verified count (candidates that pass the
# exact-Jaccard threshold -- i.e. candidates intersected with the exact
# pair set), recall against the exact pairs, and candidate efficiency.
# This is THE parameter sheet for dedup_minhash_lsh's 8x2 choice.
# Signatures are computed ONCE (persisted); each layout adds only a
# map-side band-key projection + one self-join on (band, key).
# ---------------------------------------------------------------------------

BAND_LAYOUTS = ((16, 1), (8, 2), (4, 4), (2, 8))


def minhash_band_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe path: the 16-lane signature table and the exact pair truth are
    # materialized indexes; each layout adds only a map-side band-key
    # projection + one self-join on (band, key)
    sig = minhash_sig_indexed(spark, sf_dir)
    exact = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .persist()
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    out = None
    for bands, rows_per_band in BAND_LAYOUTS:
        cand = _band_candidates(_bands_from_sig(sig, bands, rows_per_band))
        # candidate + verified counts in ONE pass over cand (left join on
        # the truth pairs, flag-sum) so no layout needs a persist -- the
        # old two-consumer shape cached every layout's candidates for the
        # session lifetime (ADVICE r5 item #2)
        flagged = cand.join(
            exact.select("doc_a", "doc_b", F.lit(1).alias("v")),
            ["doc_a", "doc_b"],
            "left",
        )
        row = (
            flagged.agg(
                F.count(F.lit(1)).alias("n_candidates"),
                # outer coalesce: sum over an empty candidate set is NULL
                F.coalesce(F.sum(F.coalesce("v", F.lit(0))), F.lit(0))
                .cast("bigint")
                .alias("n_verified"),
            )
            .crossJoin(F.broadcast(n_exact))
            .select(
                F.lit(bands).alias("bands"),
                F.lit(rows_per_band).alias("rows_per_band"),
                "n_candidates",
                "n_verified",
                "n_exact",
                F.round(
                    F.col("n_verified").cast("double") / F.col("n_exact"), 6
                ).alias("recall"),
                F.round(
                    F.col("n_verified").cast("double")
                    / F.greatest(F.col("n_candidates"), F.lit(1)),
                    6,
                ).alias("candidate_efficiency"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bands")


def _band_sensitivity_oracle() -> str:
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    selects = []
    for bands, rows_per_band in BAND_LAYOUTS:
        band_selects = "\n            UNION ALL\n".join(
            f"            SELECT doc_id, {b} AS band, md5("
            + " || '|' || ".join(
                f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            )
            + ") AS band_key FROM sig"
            for b in range(bands)
        )
        selects.append(f"""    SELECT {bands} AS bands, {rows_per_band} AS rows_per_band,
           CAST((SELECT count(*) FROM (
               SELECT DISTINCT a.doc_id, b.doc_id FROM (
{band_selects}
               ) a JOIN (
{band_selects}
               ) b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id)) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM (
               SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM (
{band_selects}
               ) a JOIN (
{band_selects}
               ) b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id) c
               SEMI JOIN exact USING (doc_a, doc_b)) AS BIGINT) AS n_verified,
           (SELECT count(*) FROM exact) AS n_exact,
           round(CAST((SELECT count(*) FROM (
               SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM (
{band_selects}
               ) a JOIN (
{band_selects}
               ) b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id) c
               SEMI JOIN exact USING (doc_a, doc_b)) AS DOUBLE)
               / (SELECT count(*) FROM exact), 6) AS recall,
           round(CAST((SELECT count(*) FROM (
               SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM (
{band_selects}
               ) a JOIN (
{band_selects}
               ) b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id) c
               SEMI JOIN exact USING (doc_a, doc_b)) AS DOUBLE)
               / greatest((SELECT count(*) FROM (
               SELECT DISTINCT a.doc_id, b.doc_id FROM (
{band_selects}
               ) a JOIN (
{band_selects}
               ) b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id)), 1), 6) AS candidate_efficiency""")
    body = "\n    UNION ALL\n".join(selects)
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT doc_a, doc_b FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
              >= {JACCARD_THRESHOLD}
    )
{body}
    ORDER BY bands
"""


BAND_SENSITIVITY_ORACLE = _band_sensitivity_oracle()


# ---------------------------------------------------------------------------
# Stop-shingle-capped MinHash-LSH: the petabyte-scale variant the module
# header describes -- shingles present in MORE than STOP_SHINGLE_MAX_DF
# documents ("the quick brown"-class boilerplate) contribute candidate
# pairs quadratically but similarity hardly at all, so production
# pipelines drop them BEFORE signatures.  Declared as its own query
# because the cap changes semantics: similarity here is Jaccard over
# the RARE-shingle sets (both sides filtered consistently), which is
# what near-dup detection actually wants at scale.  The hot-shingle
# list is tiny by construction (shingles with df > K), so the exclusion
# is a broadcast anti-join on the shingle stream -- scan-local, no extra
# wide shuffle; everything downstream is the standard banded plan.
# ---------------------------------------------------------------------------

# chosen below the synthetic corpus's max shingle df (7-9) so the cap
# demonstrably excludes boilerplate at test scale; production corpora
# would set this orders of magnitude higher (shingles in >10^4 docs)
STOP_SHINGLE_MAX_DF = 5


def dedup_minhash_stopshingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe path over the materialized shingle table; the DF-capped
    # signature is layout-specific (shingle set changes), so bands are
    # still computed here -- from the store's scan, not from raw text
    sh = shingles_indexed(spark, sf_dir)
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > STOP_SHINGLE_MAX_DF)
        .select("sh")
    )
    kept = sh.join(F.broadcast(hot), "sh", "left_anti").persist()
    bands = _minhash_bands(kept).persist()  # self-joined: avoid recompute
    cand = _band_candidates(bands).persist()
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    jac = _pair_jaccard(kept.join(cand_docs, "doc_id", "left_semi"))
    return (
        cand.join(jac, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_stopshingle_oracle() -> str:
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ") AS band_key FROM sig"
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    hot AS (
        SELECT sh FROM shing GROUP BY sh
        HAVING count(*) > {STOP_SHINGLE_MAX_DF}
    ),
    kept AS (SELECT * FROM shing ANTI JOIN hot USING (sh)),
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM kept)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM kept JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT cand.doc_a, cand.doc_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM cand
    JOIN pairs ON cand.doc_a = pairs.doc_a AND cand.doc_b = pairs.doc_b
    JOIN sizes sa ON cand.doc_a = sa.doc_id
    JOIN sizes sb ON cand.doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
"""


MINHASH_STOPSHINGLE_ORACLE = _minhash_stopshingle_oracle()

# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_signatures(
    spark: SparkSession, sf_dir: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(doc_id, simhash): ``bits``-wide frequency-weighted SimHash.

    Bit j of a token is extracted from its md5 hex prefix via pure string
    ops (hex digit -> position in '0123456789abcdef' -> bit from a 64-char
    0/1 lookup string) so DuckDB computes the identical signature without
    any integer-hex builtin.  ``bits`` must stay <= 60: the signature is
    a sum of 2^j terms and bit 63 would overflow signed BIGINT."""
    assert bits <= 60, "signature must fit signed BIGINT in both engines"
    docs = load_table(spark, sf_dir, "documents")
    tok_counts = (
        tokens_df(docs).groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    # hash the dictionary, not the occurrences: the per-bit +-1 value of a
    # word is computed once for each DISTINCT word and joined back
    word_bits = (
        tok_counts.select("word")
        .distinct()
        .select(
            "word",
            F.substring(F.md5("word"), 1, bits // 4).alias("hex8"),
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        )
        .select(
            "word",
            "j",
            (
                2
                * F.expr(
                    f"CAST(substring('{BITS16}',"
                    f" (instr('{HEX_DIGITS}', substring(hex8, CAST(floor(j/4) AS INT) + 1, 1)) - 1) * 4"
                    f" + (j % 4) + 1, 1) AS INT)"
                )
                - 1
            ).alias("sgn"),
        )
    )
    per_bit = (
        tok_counts.join(F.broadcast(word_bits), "word")
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("cnt") * F.col("sgn")).alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("CAST(power(2, j) AS BIGINT)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_signatures(spark, sf_dir)


SIMHASH_SIG_CTE = f"""
    {DUCKDB_TOKS_CTE},
    tok_counts AS (
        SELECT doc_id, w AS word, count(*) AS cnt
        FROM toks, unnest(ts) t(w)
        GROUP BY 1, 2
    ),
    per_bit AS (
        SELECT doc_id, j,
               sum(cnt * (2 * CAST(substring('{BITS16}',
                   (instr('{HEX_DIGITS}', substring(substring(md5(word), 1, {SIMHASH_BITS // 4}),
                                                    CAST(floor(j/4) AS INT) + 1, 1)) - 1) * 4
                   + (j % 4) + 1, 1) AS INT) - 1)) AS s
        FROM tok_counts, unnest(range(0, {SIMHASH_BITS})) t(j)
        GROUP BY 1, 2
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM per_bit GROUP BY doc_id
    )
"""

SIMHASH_ORACLE = f"""
    WITH {SIMHASH_SIG_CTE}
    SELECT doc_id, simhash FROM sig
"""


def band_join_salt_k(cand_per_doc: float | None) -> int:
    """THE SALTING SWITCH RULE, in code (optimization round 13, VERDICT
    r12 item #8): how many ways to doc-salt a simhash band self-join,
    decided by the band-width audit's candidates-per-doc statistic --
    the SCALING.md number that "DECIDES the salting/AQE-skew levers".

    Below the pinned SIMHASH_CAND_PER_DOC_SWITCH the join stays
    UNSALTED: at sf0.1 the measured candidate mass is ~160/doc and the
    x16 build-side explode + extra shuffle cost MORE than the skew they
    fix (round-12 clean A/B: 2.2 s unsalted vs 4.7 s salted -- pinned
    below).  Above the pin the hot (band, chunk) buckets own the stage
    (one or two tasks run the whole quadratic expansion) and the 16-way
    doc-salt split is the manual skew lever of guide §2.5.  ``None``
    (no audit statistic supplied) keeps the local default unsalted."""
    from ..functions.hashing import SIMHASH_CAND_PER_DOC_SWITCH

    if cand_per_doc is not None and cand_per_doc > SIMHASH_CAND_PER_DOC_SWITCH:
        return 16
    return 1


def _salted_band_pairs(chunks: DataFrame, salt_n: int) -> DataFrame:
    """Self-join ``chunks(doc_id, simhash, band, chunk)`` on (band,
    chunk) with a ``salt_n``-way doc-salt split: the probe side keys
    each row by doc_id % salt_n, the build side explodes all salts, so
    every bucket's expansion splits salt_n ways and the emitted
    (doc_a < doc_b) candidate multiset is IDENTICAL (each pair meets at
    exactly one salt per matching band) -- property-tested on a
    synthetic hot-bucket corpus."""
    a = chunks.alias("a").withColumn(
        "salt", (F.col("doc_id") % salt_n).cast("int")
    )
    b = chunks.alias("b").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (a["salt"] == b["salt"]),
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


def simhash_near_pairs(
    spark: SparkSession,
    sf_dir: str,
    hamming_max: int = HAMMING_MAX,
    cand_per_doc: float | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= {HAMMING_MAX}.

    Scale path: band join on 8x 4-bit chunks -- by pigeonhole, <= 7
    differing bits leave at least one chunk equal, so the banded join has
    PERFECT recall at this threshold and the oracle can be the brute-force
    definition. Shuffles on (band, chunk-value); never all-pairs.

    ``cand_per_doc`` is the band-width audit's measured candidate mass
    for the production geometry; ``band_join_salt_k`` turns it into the
    salting decision (unsalted below the pin -- the sf0.1 default)."""
    sig = _simhash_signatures(spark, sf_dir).persist()  # both self-join sides
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # the 4-bit instance of the shared chunk extractor
                        # (simhash_band_width_audit audits the alternatives)
                        F.expr(_simhash_chunk_expr("", 4, b)).alias("chunk"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    # NOT salted by default (optimization round 12): a 16-way doc-salt
    # split of this join (the multimodal byte-simhash treatment) was
    # tried and REVERTED -- the text band space at sf0.1 is small enough
    # that the x16 build rows + extra shuffle cost more than the skew
    # they fix (clean-context bench: 2.2 s unsalted vs 4.7 s salted; the
    # first A/B that said otherwise was load-contaminated).  The 100 TB
    # trigger is no longer a comment: band_join_salt_k flips the plan
    # when the audited candidate mass crosses the pin (round 13).
    salt_k = band_join_salt_k(cand_per_doc)
    if salt_k > 1:
        pairs = _salted_band_pairs(chunks, salt_k)
    else:
        a, b = chunks.alias("a"), chunks.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.chunk") == F.col("b.chunk")),
            )
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).cast("int").alias("hamming"),
            )
        )
    return (
        # filter BEFORE distinct: the hamming predicate is per-row cheap,
        # the distinct is a shuffle -- shrink what gets shuffled
        pairs.filter(F.col("hamming") <= hamming_max)
        .distinct()
    )


SIMHASH_PAIRS_ORACLE = f"""
    WITH {SIMHASH_SIG_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
"""


# ---------------------------------------------------------------------------
# SimHash band-geometry audit -- the tuning table for the ONE free
# parameter the banded simhash join has: how to cut the signature into
# bands.  r bands of b bits guarantee recall 1.0 only out to hamming
# r-1 (pigeonhole), while the candidate volume scales like n^2 / 2^b
# per band -- measured on this corpus, the production 8x4 geometry
# already emits 2.4M candidate pairs at sf0.1 (19% of all pairs),
# because frequency-weighted signatures of same-vocabulary documents
# crowd the narrow 4-bit chunks.  This query reports, per geometry,
# exactly the two numbers that trade off: the candidate count the
# shuffle must carry and the recall against the declared hamming<=
# {HAMMING_MAX} truth.  (Manku, Jain & Das Sarma 2007 table 1 is this
# computation for 64-bit signatures.)
#
# Determinism: candidate membership and hamming are integer/bit ops on
# the engine-identical signatures; recall/precision are single double
# divisions of exact counts, NULL (in both engines, via explicit CASE)
# when the denominator is zero.
#
# Scale: per geometry one band self-join (shuffle on (band, chunk)) and
# one distinct -- the same shape as the production pair join; the truth
# count rides the materialized simhash pair store.  The oracle uses the
# brute-force pair definition instead (sample-scale n^2, its usual
# division of labor).
# ---------------------------------------------------------------------------

SIMHASH_BAND_CONFIGS = ((8, 4), (4, 8), (2, 16))  # (n_bands, bits) over 32


def _simhash_chunk_expr(prefix: str, bits: int, i: int) -> str:
    """Engine-shared chunk extraction: bits-wide chunk i of the signature."""
    return (
        f"CAST(floor({prefix}simhash / CAST(power(2, {bits * i}) AS BIGINT))"
        f" AS BIGINT) % {2 ** bits}"
    )


def simhash_band_width_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _simhash_signatures(spark, sf_dir).persist()  # all geometry joins
    truth_n = simhash_pairs_indexed(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs")
    )
    geo_rows = []
    for r, bits in SIMHASH_BAND_CONFIGS:
        chunks = sig.select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.expr(_simhash_chunk_expr("", bits, i)).alias(
                                "chunk"
                            ),
                        )
                        for i in range(r)
                    ]
                )
            ).alias("bc"),
        ).select(
            "doc_id",
            "simhash",
            F.col("bc.band").alias("band"),
            F.col("bc.chunk").alias("chunk"),
        )
        # unsalted for the same measured reason as simhash_near_pairs
        ga, gb = chunks.alias("a"), chunks.alias("b")
        pairs = (
            ga.join(
                gb,
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
            .distinct()
        )
        geo_rows.append(
            pairs.agg(
                F.lit(SIMHASH_BITS).cast("int").alias("sig_bits"),
                F.lit(r).cast("int").alias("n_bands"),
                F.lit(bits).cast("int").alias("band_bits"),
                F.lit(r - 1).cast("int").alias("guaranteed_radius"),
                F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("hamming") <= HAMMING_MAX, 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_recovered"),
            )
        )
    # The Manku wide geometry the switch rule targets (hashing.py:
    # SIMHASH_CAND_PER_DOC_SWITCH): 60-bit signatures, 4 bands x 15
    # bits.  Candidates come from the WIDE bands; "recovered" is still
    # measured against the production truth (32-bit hamming <=
    # HAMMING_MAX via the 32-bit signatures) so the row answers the
    # operational question -- how many of the pairs the shipped family
    # treats as near-dups would the wide geometry still surface, and at
    # what candidate cost.
    wide_bits = SIMHASH_WIDE_BITS // SIMHASH_WIDE_BANDS
    sig60 = _simhash_signatures(spark, sf_dir, SIMHASH_WIDE_BITS)
    chunks60 = sig60.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(_simhash_chunk_expr("", wide_bits, i)).alias(
                            "chunk"
                        ),
                    )
                    for i in range(SIMHASH_WIDE_BANDS)
                ]
            )
        ).alias("bc"),
    ).select(
        "doc_id",
        F.col("bc.band").alias("band"),
        F.col("bc.chunk").alias("chunk"),
    )
    a60, b60 = chunks60.alias("a"), chunks60.alias("b")
    pairs60 = (
        a60.join(
            b60,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .join(sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")), "doc_a")
        .join(sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")), "doc_b")
        .select(
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int")
            .alias("hamming")
        )
    )
    geo_rows.append(
        pairs60.agg(
            F.lit(SIMHASH_WIDE_BITS).cast("int").alias("sig_bits"),
            F.lit(SIMHASH_WIDE_BANDS).cast("int").alias("n_bands"),
            F.lit(wide_bits).cast("int").alias("band_bits"),
            F.lit(SIMHASH_WIDE_BANDS - 1).cast("int").alias("guaranteed_radius"),
            F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
            F.coalesce(
                F.sum(
                    F.when(F.col("hamming") <= HAMMING_MAX, 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_recovered"),
        )
    )
    out = geo_rows[0]
    for extra in geo_rows[1:]:
        out = out.unionByName(extra)
    return (
        out.crossJoin(F.broadcast(truth_n))
        .select(
            "sig_bits",
            "n_bands",
            "band_bits",
            "guaranteed_radius",
            "n_candidate_pairs",
            "n_true_pairs",
            "n_recovered",
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_recovered").cast("double") / F.col("n_true_pairs"),
            ).alias("recall"),
            F.when(
                F.col("n_candidate_pairs") > 0,
                F.col("n_recovered").cast("double")
                / F.col("n_candidate_pairs"),
            ).alias("precision"),
        )
        .orderBy("sig_bits", "band_bits")
    )


def _simhash_band_audit_oracle() -> str:
    agg_cols = f"""           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           (SELECT n FROM truth) AS n_true_pairs,
           CAST(coalesce(sum(CASE WHEN hamming <= {HAMMING_MAX}
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_recovered,
           CASE WHEN (SELECT n FROM truth) > 0
                THEN CAST(coalesce(sum(CASE WHEN hamming <= {HAMMING_MAX}
                                            THEN 1 ELSE 0 END), 0) AS DOUBLE)
                     / (SELECT n FROM truth) END AS recall,
           CASE WHEN count(*) > 0
                THEN CAST(coalesce(sum(CASE WHEN hamming <= {HAMMING_MAX}
                                            THEN 1 ELSE 0 END), 0) AS DOUBLE)
                     / count(*) END AS precision"""
    per_geo = []
    for r, bits in SIMHASH_BAND_CONFIGS:
        band_match = " OR ".join(
            f"{_simhash_chunk_expr('a.', bits, i)}"
            f" = {_simhash_chunk_expr('b.', bits, i)}"
            for i in range(r)
        )
        per_geo.append(
            f"""    SELECT CAST({SIMHASH_BITS} AS INTEGER) AS sig_bits,
           CAST({r} AS INTEGER) AS n_bands,
           CAST({bits} AS INTEGER) AS band_bits,
           CAST({r - 1} AS INTEGER) AS guaranteed_radius,
{agg_cols}
    FROM (
        SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE {band_match}
    )"""
        )
    # the Manku wide-geometry row: candidates from the 60-bit bands,
    # recovery measured against the production 32-bit truth
    wide_bits = SIMHASH_WIDE_BITS // SIMHASH_WIDE_BANDS
    band_match60 = " OR ".join(
        f"{_simhash_chunk_expr('a.', wide_bits, i)}"
        f" = {_simhash_chunk_expr('b.', wide_bits, i)}"
        for i in range(SIMHASH_WIDE_BANDS)
    )
    per_geo.append(
        f"""    SELECT CAST({SIMHASH_WIDE_BITS} AS INTEGER) AS sig_bits,
           CAST({SIMHASH_WIDE_BANDS} AS INTEGER) AS n_bands,
           CAST({wide_bits} AS INTEGER) AS band_bits,
           CAST({SIMHASH_WIDE_BANDS - 1} AS INTEGER) AS guaranteed_radius,
{agg_cols}
    FROM (
        SELECT bit_count(xor(sa.simhash, sb.simhash)) AS hamming
        FROM sig60 a JOIN sig60 b ON a.doc_id < b.doc_id
        JOIN sig sa ON sa.doc_id = a.doc_id
        JOIN sig sb ON sb.doc_id = b.doc_id
        WHERE {band_match60}
    )"""
    )
    selects = "\n    UNION ALL\n".join(per_geo)
    return f"""
    WITH {SIMHASH_SIG_CTE},
    per_bit60 AS (
        SELECT doc_id, j,
               sum(cnt * (2 * CAST(substring('{BITS16}',
                   (instr('{HEX_DIGITS}', substring(substring(md5(word), 1, {SIMHASH_WIDE_BITS // 4}),
                                                    CAST(floor(j/4) AS INT) + 1, 1)) - 1) * 4
                   + (j % 4) + 1, 1) AS INT) - 1)) AS s
        FROM tok_counts, unnest(range(0, {SIMHASH_WIDE_BITS})) t(j)
        GROUP BY 1, 2
    ),
    sig60 AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM per_bit60 GROUP BY doc_id
    ),
    truth AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    )
{selects}
    ORDER BY sig_bits, band_bits
"""


SIMHASH_BAND_AUDIT_ORACLE = _simhash_band_audit_oracle()

# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def dedup_embedding_pairs(
    spark: SparkSession, sf_dir: str, *, max_rows: int | None = None
) -> DataFrame:
    """Exact embedding near-dup pairs (cosine >= {COSINE_NEAR_DUP}).

    Declared-exact, hence all-pairs: O(n^2) by definition. The 100 TB
    path is operators/similarity.py (IVF-pruned search); this query is the
    ground-truth oracle for it, and ``guards.ensure_sample_scale`` refuses
    to build the quadratic plan past the sample cap.  Vectors are
    unit-normalized ONCE (O(n), flat-column representation:
    vectors.flat_normalized) so each pair is a single fully-codegen'd
    scalar dot product; arithmetic order is identical to the oracle's
    list_reduce, results bit-equal."""
    from .guards import EXACT_PAIRS_MAX_ROWS, ensure_sample_scale

    emb = ensure_sample_scale(
        load_table(spark, sf_dir, "embeddings"),
        cap=max_rows if max_rows is not None else EXACT_PAIRS_MAX_ROWS,
        operator="dedup_embedding_pairs",
    )
    en = flat_normalized(emb).persist()
    a = en.alias("a")
    b = en.alias("b")
    # broadcast one side: CartesianProductExec is RDD-based (no codegen);
    # BroadcastNestedLoopJoin keeps the dot-product stage in codegen.
    # (Declared-exact all-pairs; at corpus scale this query's job is to be
    # the ground truth for the IVF/banded paths, run on samples.)
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            flat_dot("a.x", "b.x").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_NEAR_DUP)
    )


EMBEDDING_PAIRS_ORACLE = f"""
    WITH {SQL_NORMALIZED_CTE}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_dot('a.vn', 'b.vn')} AS cos_sim
    FROM en a, en b
    WHERE a.vec_id < b.vec_id
      AND {sql_dot('a.vn', 'b.vn')} >= {COSINE_NEAR_DUP}
"""


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed: the UNguarded 100 TB path
    that ``dedup_embedding_pairs`` is the capped ground truth for.

    Candidates are restricted to vectors sharing a random-hyperplane LSH
    bucket (the same deterministic +-1 planes ``ann_lsh_topk`` serves
    with, similarity.py): one signature pass over the corpus, then a
    self-equi-join shuffling on bucket -- per-bucket all-pairs is bounded
    by bucket size ~ n/2^planes, never global n^2.  Approximate by
    design (a near-dup pair split across buckets is missed; sign-LSH
    collision probability is 1 - angle/pi per plane); the oracle
    replicates the identical bucketing, so results still hash-match
    exactly, and recall vs the exact oracle is measurable on any capped
    sample."""
    from .similarity import lsh_sig_indexed  # shared materialized index

    sig = lsh_sig_indexed(spark, sf_dir)
    a = sig.alias("a")
    b = sig.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("bucket").alias("b_bucket"),
        *[F.col(f"x{i}").alias(f"bx{i}") for i in range(64)],
    )
    return (
        a.join(b, F.col("a.bucket") == F.col("b_bucket"))
        .filter(F.col("a.vec_id") < F.col("b_vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b_vec_id").alias("vec_b"),
            flat_dot("a.x", "bx").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_NEAR_DUP)
    )


def _embedding_lsh_oracle() -> str:
    from .similarity import _lsh_bucket_sql

    return f"""
    WITH {SQL_NORMALIZED_CTE},
    sig AS (
        SELECT vec_id, vn, ({_lsh_bucket_sql('vn')}) AS bucket FROM en
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {sql_dot('a.vn', 'b.vn')} AS cos_sim
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {sql_dot('a.vn', 'b.vn')} >= {COSINE_NEAR_DUP}
"""


# ---------------------------------------------------------------------------
# Cosine-threshold sensitivity curve -- the embedding-side twin of
# jaccard_threshold_curve: how many LSH-bucketed candidate pairs survive
# each cosine cutoff, the tuning table for COSINE_NEAR_DUP.  Candidates
# come from the SAME deterministic hyperplane buckets as
# dedup_embedding_lsh (never all-pairs), scored once; the ladder is one
# conditional-sum aggregate over that single pair stream.
#
# Scale: one signature pass + one bucket-equi self-join (per-bucket
# bounded), then a single-row global aggregate exploded to the static
# ladder -- the threshold table costs one extra reduction over the
# dedup plan it tunes.
# ---------------------------------------------------------------------------

COSINE_LADDER = (0.3, 0.4, 0.5, 0.7, 0.9)


def cosine_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import lsh_sig_indexed  # shared materialized index

    sig = lsh_sig_indexed(spark, sf_dir)
    a = sig.alias("a")
    b = sig.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("bucket").alias("b_bucket"),
        *[F.col(f"x{i}").alias(f"bx{i}") for i in range(64)],
    )
    pairs = (
        a.join(b, F.col("a.bucket") == F.col("b_bucket"))
        .filter(F.col("a.vec_id") < F.col("b_vec_id"))
        .select(flat_dot("a.x", "bx").alias("cos_sim"))
    )
    aggs = [F.count(F.lit(1)).alias("n_candidate_pairs")]
    for t in COSINE_LADDER:
        aggs.append(
            F.sum(F.when(F.col("cos_sim") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"ge_{str(t).replace('.', '_')}")
        )
    one = pairs.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"ge_{str(t).replace('.', '_')}").alias("n_pairs_kept"),
            )
            for t in COSINE_LADDER
        ]
    )
    return (
        one.select("n_candidate_pairs", F.explode(rows).alias("r"))
        .select(
            F.col("r.threshold").alias("threshold"),
            F.col("r.n_pairs_kept").alias("n_pairs_kept"),
            "n_candidate_pairs",
            F.round(
                F.col("r.n_pairs_kept").cast("double")
                / F.greatest(F.col("n_candidate_pairs"), F.lit(1)),
                6,
            ).alias("keep_fraction"),
        )
        .orderBy("threshold")
    )


def _cosine_curve_oracle() -> str:
    from .similarity import _lsh_bucket_sql

    selects = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({t} AS DOUBLE) AS threshold,
           CAST(sum(CASE WHEN cos_sim >= {t} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs_kept,
           count(*) AS n_candidate_pairs,
           round(CAST(sum(CASE WHEN cos_sim >= {t} THEN 1 ELSE 0 END)
                      AS DOUBLE) / greatest(count(*), 1), 6) AS keep_fraction
    FROM pairs"""
        for t in COSINE_LADDER
    )
    return f"""
    WITH {SQL_NORMALIZED_CTE},
    sig AS (
        SELECT vec_id, vn, ({_lsh_bucket_sql('vn')}) AS bucket FROM en
    ),
    pairs AS (
        SELECT {sql_dot('a.vn', 'b.vn')} AS cos_sim
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
{selects}
    ORDER BY threshold
"""


def semantic_dedup_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-modality dedup: embedding-LSH candidates verified by exact
    text Jaccard.

    The realistic production shape -- embeddings give cheap semantic
    RECALL (bucketed candidates, no quadratic stage), the text gives
    PRECISION (exact shingle Jaccard computed only for candidate docs,
    the same verify-candidates-only trick dedup_minhash_lsh plays).
    Emits every embedding candidate pair with both scores and the
    confirmation verdict; pairs whose documents share no shingle verify
    at jaccard 0.0 rather than vanishing, so the output is an audit of
    the semantic candidates, not a pre-filtered list.  testdata
    alignment: embeddings.vec_id IS documents.doc_id (1:1)."""
    cand = dedup_embedding_lsh(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"), "cos_sim"
    )
    # probe path: the exact Jaccard verification reads the materialized
    # pair table (left join restricts it to the semantic candidates --
    # identical values to the old candidate-restricted recompute, since
    # pair statistics depend only on the two docs' own shingle sets)
    jac = jaccard_pairs_indexed(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard"
    )
    return (
        cand.join(jac, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "cos_sim",
            F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
            (F.coalesce("jaccard", F.lit(0.0)) >= JACCARD_THRESHOLD).alias(
                "text_confirmed"
            ),
        )
    )


def _semantic_hybrid_oracle() -> str:
    from .similarity import _lsh_bucket_sql

    return f"""
    WITH {SQL_NORMALIZED_CTE},
    sig AS (
        SELECT vec_id, vn, ({_lsh_bucket_sql('vn')}) AS bucket FROM en
    ),
    cand AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               {sql_dot('a.vn', 'b.vn')} AS cos_sim
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {sql_dot('a.vn', 'b.vn')} >= {COSINE_NEAR_DUP}
    ),
    {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    jac AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS DOUBLE)
                 / (min(sa.n) + min(sb.n) - count(*)) AS jaccard
        FROM shing a
        JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        JOIN sizes sa ON a.doc_id = sa.doc_id
        JOIN sizes sb ON b.doc_id = sb.doc_id
        GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, c.cos_sim,
           coalesce(j.jaccard, 0.0) AS jaccard,
           coalesce(j.jaccard, 0.0) >= {JACCARD_THRESHOLD} AS text_confirmed
    FROM cand c
    LEFT JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
"""


# ---------------------------------------------------------------------------
# Cluster resolution: near-dup pairs -> canonical document per cluster
# ---------------------------------------------------------------------------

CC_MAX_ITERS = 25  # >= graph diameter; near-dup clusters are shallow


def dedup_clusters(
    spark: SparkSession, sf_dir: str, hamming_max: int = HAMMING_MAX
) -> DataFrame:
    """Connected components over the SimHash near-dup graph: every document
    labeled with its cluster's minimum doc_id, plus cluster size and a
    canonical-winner flag.  This is the step that turns pairwise near-dup
    evidence into keep/drop decisions — without it a pipeline would drop
    B in (A,B) and C in (B,C) but keep A and C, which may never have
    compared equal.

    Algorithm: iterative min-label propagation.  Each round every node
    takes the min of its own label and its neighbors' labels — one
    shuffle-on-key join + one partial-aggregated groupBy per round, the
    same data movement as one round of the MapReduce large-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14).  Labels decrease monotonically, so convergence is detected
    by the label SUM going flat: one cheap scalar aggregate per round
    instead of a change-count join.  Rounds needed = graph diameter;
    near-dup clusters are star-/clique-shaped (diameter 2-4).  Each round
    is localCheckpoint()ed to truncate lineage — without that, round k
    replays rounds 1..k-1 and the job is quadratic; on a cluster with
    TB-scale label tables use reliable checkpoints (or parquet
    round-trips) instead of executor-local blocks.

    The reference has no multi-pass dataflow at all (its DAG is the fixed
    map->partition->reduce of ``/root/reference/master.py:42-213``); this
    operator exists because one MapReduce pass cannot close a transitive
    relation."""
    pairs = simhash_near_pairs(spark, sf_dir, hamming_max).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return _cc_cluster_report(pairs, docs, "doc_id")


def _cc_cluster_report(
    pairs: DataFrame, nodes: DataFrame, id_col: str
) -> DataFrame:
    """(pairs(doc_a, doc_b), nodes(id_col)) -> every node labeled with its
    component's minimum id, component size, and canonical-winner flag.

    Min-label propagation over the symmetrized edge set; shared by the
    SimHash doc clusters and the embedding-space SemDeDup clusters.
    Iterates ONLY over nodes that have an edge: singleton nodes (the
    overwhelming majority of a real corpus) never change label, so they
    are attached after convergence with label = self instead of riding
    every round's shuffle.  Initialization fuses the would-be first
    propagation round: label_0 = min(self, min neighbor) falls out of
    the same groupBy that enumerates the edge-bearing nodes, so the
    loop starts one round ahead and the separate DISTINCT pass is gone."""
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).persist()
    labels = (
        edges.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("nmin"))
        .select(
            "doc_id",
            F.least(F.col("doc_id"), F.col("nmin")).alias("cluster_id"),
        )
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    # Hook-only propagation KEPT over hook+jump pointer doubling
    # (optimization round 13, VERDICT r12 item #7, tried and REVERTED):
    # adding the jump step (lbl(v) <- min(lbl(v), lbl(lbl(v))), one
    # label-table self-join per round) can only save rounds when the
    # hook loop needs many -- but the near-dup graphs here converge in
    # THREE hook rounds total (2 productive + 1 flat-confirm, measured
    # at sf0.1), so the jump's per-round self-join + persist cost more
    # than the single round it could save (part_entity_clusters 3.4 ->
    # 5.4/7.3 s across two A/B sessions; dedup_clusters flat-to-worse).
    # Pointer doubling pays off at diameter >> rounds -- near-dup
    # clusters are star/clique-shaped (diameter 2-4) by construction,
    # so the hook loop IS the log-round algorithm for this graph class.
    for _ in range(CC_MAX_ITERS):
        neigh = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .groupBy(edges["doc_a"].alias("nid"))
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        labels = (
            labels.join(neigh, labels["doc_id"] == neigh["nid"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("neigh_min", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    # Attach singletons (no near-dup edge): cluster = self, size 1.
    full = nodes.join(
        labels, nodes[id_col] == labels["doc_id"], "left"
    ).select(
        nodes[id_col].alias(id_col),
        F.coalesce("cluster_id", nodes[id_col]).alias("cluster_id"),
    )
    sizes = full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return full.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


# Bounded-iteration unrolled connected-components closure (round 11,
# VERDICT r10 item #3).  The previous oracle closed the relation with a
# WITH RECURSIVE ``reach`` CTE enumerating every (node, reachable-id)
# pair -- quadratic in component size, measured >10 min per query at
# sf0.1 (the five CC oracles were the only sf0.1 oracle-sweep skips).
# This form unrolls CC_ORACLE_ROUNDS rounds of the classic
# hook-then-jump min-label iteration instead:
#   hook: lbl(v) <- min(lbl(v), min over edges(v,u) of lbl(u))
#   jump: lbl(v) <- min(lbl(v), lbl(lbl(v)))   (pointer doubling)
# Each round is two linear joins over the n-row label table, and the
# min-label reach at least doubles per round (hook extends by the
# previous reach, jump composes label pointers), so ROUNDS=14 converges
# for any component diameter <= 2^14 -- far beyond any test corpus
# (5000 docs at sf0.1).  Labels are always member-node ids and only
# decrease toward the component minimum, so the converged output is
# IDENTICAL to the recursive min(reachable) form -- proven by the
# committed sf0.01 digest bank (no drift vs the recursive-oracle bank)
# and by the sf0.1 oracle sweep this rewrite makes tractable.  A
# non-converged round count cannot pass silently: the Spark side runs
# to convergence, so the driver/sweep hash comparison fails loudly.
CC_ORACLE_ROUNDS = 14


def cc_closure_cte(
    universe_sql: str, id_alias: str, rounds: int = CC_ORACLE_ROUNDS
) -> str:
    """CTE chain ``l0..l{rounds}, comp`` computing min-label connected
    components over a preceding symmetric ``edges(a, b)`` CTE;
    ``comp`` has columns (``id_alias``, cluster_id)."""
    # every l/h CTE is referenced TWICE by the next round -- without the
    # MATERIALIZED hint DuckDB inlines each reference and the expansion
    # is 2^rounds subtrees (measured: "Too many open files" at rounds=14);
    # materialization makes each round one linear pass, the whole point
    parts = [
        "l0 AS MATERIALIZED "
        f"(SELECT u AS node, u AS lbl FROM ({universe_sql}) t(u))"
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f"""h{t} AS MATERIALIZED (
        SELECT l.node, least(l.lbl, coalesce(min(nb.lbl), l.lbl)) AS lbl
        FROM l{p} l
        LEFT JOIN edges e ON l.node = e.a
        LEFT JOIN l{p} nb ON e.b = nb.node
        GROUP BY l.node, l.lbl
    )"""
        )
        parts.append(
            f"""l{t} AS MATERIALIZED (
        SELECT h.node, least(h.lbl, j.lbl) AS lbl
        FROM h{t} h JOIN h{t} j ON h.lbl = j.node
    )"""
        )
    parts.append(
        f"comp AS (SELECT node AS {id_alias}, lbl AS cluster_id"
        f" FROM l{rounds})"
    )
    return ",\n    ".join(parts)


_CC_DOCS = cc_closure_cte("SELECT doc_id FROM documents", "doc_id")

# The oracle closes the same relation declaratively: the unrolled
# hook+jump min-label closure above; lbl converges to the component's
# minimum id, exactly what the Spark loop's convergence probe certifies.
DEDUP_CLUSTERS_ORACLE = f"""
    WITH {SIMHASH_SIG_CTE},
    near AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM near
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM near
    ),
    {_CC_DOCS}
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM comp
"""


# ---------------------------------------------------------------------------
# Cluster-size histogram -- the shape report on the near-dup clustering
# itself: a healthy corpus is overwhelmingly singletons with a thin tail
# of small cliques; a giant component (one cluster holding a large doc
# share) means the similarity threshold is too loose or boilerplate is
# chaining unrelated docs, and it is THE failure mode to check before
# trusting survivor selection.  One row per cluster size with cluster
# count, doc mass, and doc share.
#
# Scale: rides the already-audited CC output; one combinable groupBy per
# level (cluster, then size -- output bounded by max cluster size) and a
# broadcast scalar total.
# ---------------------------------------------------------------------------


def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe path: reads the materialized CC report (index/probe split);
    # dedup_clusters itself remains the from-raw oracle-checked pipeline
    clusters = simhash_clusters_indexed(spark, sf_dir).select(
        "cluster_id", "cluster_size"
    )
    per = clusters.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("cluster_size")
    )
    hist = per.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    tot = hist.agg(
        F.sum(F.col("cluster_size") * F.col("n_clusters"))
        .cast("bigint")
        .alias("total_docs")
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            F.round(
                (F.col("cluster_size") * F.col("n_clusters")).cast("double")
                / F.col("total_docs"),
                6,
            ).alias("share_of_docs"),
        )
        .orderBy("cluster_size")
    )


CLUSTER_SIZE_HIST_ORACLE = f"""
    WITH per AS (
        SELECT cluster_id, max(cluster_size) AS cluster_size
        FROM ({DEDUP_CLUSTERS_ORACLE})
        GROUP BY cluster_id
    ),
    hist AS (
        SELECT cluster_size, count(*) AS n_clusters
        FROM per GROUP BY cluster_size
    ),
    tot AS (
        SELECT CAST(sum(cluster_size * n_clusters) AS BIGINT) AS total_docs
        FROM hist
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           n_clusters,
           CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
           round(CAST(cluster_size * n_clusters AS DOUBLE) / total_docs, 6)
               AS share_of_docs
    FROM hist, tot
    ORDER BY cluster_size
"""


# ---------------------------------------------------------------------------
# Cluster-survivor selection: the step AFTER clustering that actually
# deduplicates the corpus -- per near-dup cluster, keep exactly one
# document (the "keep longest" policy real pipelines default to: most
# content survives) and account for what was dropped.  Tie-break is
# fully deterministic: longest n_chars wins, lowest doc_id among equals
# -- expressed as one combinable min(struct(-n_chars, doc_id)) aggregate
# per cluster, so the argmax rides the same map-side-partial shuffle as
# the counts (no window, no second pass over documents).  At 100x the
# group count is the cluster count (<= corpus size) and every aggregate
# is partial-aggregable; nothing here adds to the clustering cost.
# ---------------------------------------------------------------------------


def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = simhash_clusters_indexed(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    chars = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    joined = clusters.join(chars, "doc_id")
    best = F.min(
        F.struct(
            (-F.col("n_chars")).alias("neg_chars"),
            F.col("doc_id").alias("d"),
        )
    ).alias("best")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum("n_chars").alias("total_chars"),
            best,
        )
        .select(
            "cluster_id",
            "cluster_size",
            F.col("best.d").alias("kept_doc"),
            (-F.col("best.neg_chars")).alias("kept_chars"),
            (F.col("cluster_size") - 1).alias("dropped_docs"),
            (F.col("total_chars") + F.col("best.neg_chars")).alias(
                "dropped_chars"
            ),
            F.round(
                (-F.col("best.neg_chars")).cast("double")
                / F.col("total_chars"),
                6,
            ).alias("retained_char_ratio"),
        )
        .orderBy("cluster_id")
    )


# Same unrolled component closure as DEDUP_CLUSTERS_ORACLE; the
# survivor is picked by an explicitly-ordered row_number (n_chars DESC,
# doc_id ASC), the declarative twin of min(struct(-n_chars, doc_id)).
DEDUP_SURVIVORS_ORACLE = f"""
    WITH {SIMHASH_SIG_CTE},
    near AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM near
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM near
    ),
    {_CC_DOCS},
    ranked AS (
        SELECT comp.cluster_id, comp.doc_id, d.n_chars,
               row_number() OVER (PARTITION BY comp.cluster_id
                                  ORDER BY d.n_chars DESC, comp.doc_id ASC)
                   AS rk
        FROM comp JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           count(*) AS cluster_size,
           CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS kept_doc,
           CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
           count(*) - 1 AS dropped_docs,
           CAST(sum(n_chars) - max(CASE WHEN rk = 1 THEN n_chars END)
                AS BIGINT) AS dropped_chars,
           round(CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS DOUBLE)
                 / sum(n_chars), 6) AS retained_char_ratio
    FROM ranked
    GROUP BY cluster_id
    ORDER BY cluster_id
"""


# ---------------------------------------------------------------------------
# Fuzzy matching via blocking + edit distance: the classic entity-
# resolution shape.  All-pairs levenshtein is O(n^2); a BLOCKING KEY
# (here brand+type) turns it into an equi-join whose quadratic cost is
# per block, not per table -- the same candidate-sparsification idea as
# the shingle inverted index, for typo-distance instead of set overlap.
# Both engines implement the identical integer DP, so the distances are
# exactly comparable.
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 3


def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Optimization round 12 (identical output, oracle unchanged): the
    # blocked candidate set is ~70x the kept set, and every candidate
    # paid an UNBOUNDED levenshtein -- twice for survivors (filter +
    # projection).  Now: (1) a length-band prefilter (|len_a - len_b| <=
    # d is implied by edit distance <= d) drops far pairs before any DP;
    # (2) the THRESHOLD-bounded levenshtein (banded DP, early exit,
    # returns -1 above the bound -- exact below it, so edit_dist is
    # unchanged for every kept pair) is computed ONCE; (3) the probe
    # side is re-spread by the blocking key first, because the single
    # small parquet file otherwise runs every DP on one task (guide
    # SS2.5: repartition immediately after an unsplittable-input read).
    from ..session import default_parallelism

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_name"
    )
    a = part.repartition(
        default_parallelism(), F.col("p_brand"), F.col("p_type")
    ).alias("fa")
    b = part.alias("fb")
    bdist = F.levenshtein(
        F.col("fa.p_name"), F.col("fb.p_name"), FUZZY_MAX_DIST
    )
    return (
        a.join(
            b,
            (F.col("fa.p_brand") == F.col("fb.p_brand"))
            & (F.col("fa.p_type") == F.col("fb.p_type"))
            & (F.col("fa.p_partkey") < F.col("fb.p_partkey")),
        )
        .filter(
            F.abs(F.length("fa.p_name") - F.length("fb.p_name"))
            <= FUZZY_MAX_DIST
        )
        .withColumn("_d", bdist)
        .filter(F.col("_d") >= 0)
        .select(
            F.col("fa.p_partkey").alias("key_a"),
            F.col("fb.p_partkey").alias("key_b"),
            F.col("fa.p_name").alias("name_a"),
            F.col("fb.p_name").alias("name_b"),
            F.col("_d").cast("int").alias("edit_dist"),
        )
    )


FUZZY_PAIRS_ORACLE = f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 -- the MOSS
# algorithm): the position-robust LOCAL fingerprinting layer between
# whole-doc hashing (doc_fingerprint) and window-granular passage dedup
# (repeated_passage_windows).  Hash every token k-gram, slide a window
# of WINNOW_W consecutive k-gram hashes, keep each window's minimum
# (ties -> rightmost, the paper's robust-winnowing rule, encoded as
# min(struct(hash, -pos)) so one lexicographic min does both keys); the
# distinct kept (pos, hash) set is the document's fingerprint sketch,
# with guaranteed detection of any shared run of WINNOW_W + K - 1
# tokens and expected density 2/(w+1).
#
# Determinism: hashes are md5-prefix BIGINTs (the shared engine idiom),
# selection is integer lexicographic min -- no floats anywhere except
# the final density division of exact counts.
#
# Scale: the k-gram stream explodes ~1 row per token; the winnowing min
# is a doc-PARTITIONED window (never partitionless), the sketch is a
# distinct on (doc, pos, hash) bounded by ~2n/(w+1), and the cross-doc
# share join rides the fingerprint hash equi-join.
# ---------------------------------------------------------------------------

WINNOW_K = 3  # token k-gram width (the corpus shingle width)
WINNOW_W = 4  # winnowing window: guarantee t = W + K - 1 = 6 tokens


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # k-gram stream built SCALAR-side (optimization round 12): the
    # original explode(transform(sequence(...), i -> concat_ws(...)))
    # ran the per-element lambda interpreted outside whole-stage codegen
    # (the SCALING.md pitfall-1 shape) and cost 60 s of the bench at
    # sf0.1.  Equivalent form: explode the cleaned token stream with its
    # dense order index (row_number over the raw split position), then
    # assemble each 3-gram from lead() neighbors -- every expression
    # stays inside codegen and the doc-partitioned window shuffle is the
    # same partitioning every later winnowing window reuses.  Verified
    # bit-identical to the lambda form ((doc_id, pos, h) multisets equal
    # at sf0.01 and sf0.1).
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), TOKEN_SPLIT_RE)).alias(
                "sp", "_tok"
            ),
        )
        .select("doc_id", "sp", clean_token(F.col("_tok")).alias("w"))
        .filter(F.col("w") != "")
    )
    w_ord = Window.partitionBy("doc_id").orderBy("sp")
    kg = (
        toks.select(
            "doc_id",
            F.row_number().over(w_ord).cast("bigint").alias("pos"),
            "w",
            F.lead("w", 1).over(w_ord).alias("w1"),
            F.lead("w", WINNOW_K - 1).over(w_ord).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", "w", "w1", "w2")), 1, 15
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .persist()
    )
    w_doc = Window.partitionBy("doc_id")
    w_win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    windows = kg.select(
        "doc_id",
        "pos",
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(w_win).alias(
            "sel"
        ),
        F.count(F.lit(1)).over(w_doc).alias("n_kgrams"),
    )
    selected = (
        windows.filter(F.col("pos") <= F.col("n_kgrams") - WINNOW_W + 1)
        .select(
            "doc_id",
            F.col("sel.h").alias("fh"),
            (-F.col("sel.np")).alias("fpos"),
        )
        .distinct()
        # consumed by three branches (multi / per_doc / shared): persist
        # so the winnowing window evaluates once per run, not three times
        .persist()
    )
    multi = (
        selected.select("doc_id", "fh")
        .distinct()
        .groupBy("fh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("fh")
    )
    per_doc = selected.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.count_distinct(F.col("fh")).cast("bigint").alias("n_distinct_fp"),
    )
    shared = (
        selected.select("doc_id", "fh")
        .distinct()
        .join(multi, "fh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
    )
    sizes = kg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kgrams")
    )
    return (
        sizes.join(per_doc, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_kgrams",
            F.greatest(
                F.col("n_kgrams") - (WINNOW_W - 1), F.lit(0).cast("bigint")
            ).alias("n_windows"),
            F.coalesce(F.col("n_fingerprints"), F.lit(0).cast("bigint")).alias(
                "n_fingerprints"
            ),
            F.coalesce(F.col("n_distinct_fp"), F.lit(0).cast("bigint")).alias(
                "n_distinct_fp"
            ),
            F.when(
                F.col("n_kgrams") - (WINNOW_W - 1) > 0,
                F.coalesce(F.col("n_fingerprints"), F.lit(0).cast("bigint")).cast(
                    "double"
                )
                / (F.col("n_kgrams") - (WINNOW_W - 1)).cast("double"),
            ).alias("fp_density"),
            F.coalesce(F.col("n_shared_fp"), F.lit(0).cast("bigint")).alias(
                "n_shared_fp"
            ),
        )
        .orderBy("doc_id")
    )


WINNOWING_ORACLE = f"""
    WITH {DUCKDB_TOKS_CTE},
    kg AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]),
                               1, 15))::BIGINT AS h
        FROM toks, unnest(range(1, len(ts) - 1)) t(i)
    ),
    win AS (
        SELECT doc_id, pos,
               min({{'h': h, 'np': -pos}}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
               ) AS sel,
               count(*) OVER (PARTITION BY doc_id) AS n_kgrams
        FROM kg
    ),
    selected AS (
        SELECT DISTINCT doc_id, sel.h AS fh, -sel.np AS fpos
        FROM win WHERE pos <= n_kgrams - {WINNOW_W} + 1
    ),
    multi AS (
        SELECT fh FROM (SELECT DISTINCT doc_id, fh FROM selected)
        GROUP BY fh HAVING count(*) >= 2
    ),
    per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
               CAST(count(DISTINCT fh) AS BIGINT) AS n_distinct_fp
        FROM selected GROUP BY doc_id
    ),
    shared AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_fp
        FROM (SELECT DISTINCT doc_id, fh FROM selected) s
        JOIN multi USING (fh)
        GROUP BY doc_id
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kgrams
        FROM kg GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_kgrams,
           greatest(s.n_kgrams - {WINNOW_W - 1}, CAST(0 AS BIGINT))
               AS n_windows,
           coalesce(p.n_fingerprints, CAST(0 AS BIGINT)) AS n_fingerprints,
           coalesce(p.n_distinct_fp, CAST(0 AS BIGINT)) AS n_distinct_fp,
           CASE WHEN s.n_kgrams - {WINNOW_W - 1} > 0
                THEN CAST(coalesce(p.n_fingerprints, CAST(0 AS BIGINT))
                          AS DOUBLE)
                     / CAST(s.n_kgrams - {WINNOW_W - 1} AS DOUBLE)
           END AS fp_density,
           coalesce(sh.n_shared_fp, CAST(0 AS BIGINT)) AS n_shared_fp
    FROM sizes s
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN shared sh USING (doc_id)
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage weights (Fellegi & Sunter 1969, JASA) --
# the probabilistic-matching layer above the fuzzy blocker: for each
# comparison field, the log-likelihood evidence an AGREEMENT (or
# disagreement) contributes to a match decision,
#     w_agree = ln(m/u),   w_disagree = ln((1-m)/(1-u))
# where m = P(field agrees | matched pair) and u = P(field agrees |
# random pair).  m comes from the blocked fuzzy-name matches (the
# labeled-match proxy this corpus has); u needs NO pair sampling -- for
# an equality comparator it is exactly sum_v f_v(f_v-1) / (N(N-1)) over
# the field's value frequencies, a closed form of two combinable
# aggregates.  Everything is exact BIGINT counting until the final
# per-field divisions and logs (single-row chains, degenerate regimes
# -> NULL: m or u at 0 or 1 has no finite weight).
#
# Scale: the match side is the same bounded brand x type block join the
# fuzzy blocker ships; the u side is one groupBy per field; N(N-1) and
# sum f(f-1) stay inside int64 to ~3e9 rows.  Output is one row per
# field.
# ---------------------------------------------------------------------------

FS_PRICE_GRID = 10  # price agreement = equal floor(price * 10) dime band


def fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    t = part.select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_name",
        "p_size",
        F.floor(F.col("p_retailprice") * FS_PRICE_GRID)
        .cast("bigint")
        .alias("pgrid"),
    )
    # same three levenshtein optimizations as fuzzy_part_name_pairs
    # (length-band prefilter, threshold-bounded DP, block-key re-spread);
    # the match-pair set and all aggregates are unchanged
    from ..session import default_parallelism

    a = t.repartition(
        default_parallelism(), F.col("p_brand"), F.col("p_type")
    ).alias("ra")
    b = t.alias("rb")
    m = (
        a.join(
            b,
            (F.col("ra.p_brand") == F.col("rb.p_brand"))
            & (F.col("ra.p_type") == F.col("rb.p_type"))
            & (F.col("ra.p_partkey") < F.col("rb.p_partkey")),
        )
        .filter(
            (
                F.abs(F.length("ra.p_name") - F.length("rb.p_name"))
                <= FUZZY_MAX_DIST
            )
            & (
                F.levenshtein(
                    F.col("ra.p_name"), F.col("rb.p_name"), FUZZY_MAX_DIST
                )
                >= 0
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_match_pairs"),
            F.sum(
                F.when(F.col("ra.p_size") == F.col("rb.p_size"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("size_agree_m"),
            F.sum(
                F.when(F.col("ra.pgrid") == F.col("rb.pgrid"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("price_agree_m"),
        )
    )
    tot = t.agg(F.count(F.lit(1)).cast("bigint").alias("n_recs"))

    def _u_pairs(col: str, alias: str) -> DataFrame:
        return (
            t.groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
            .agg(
                F.sum(F.col("f") * (F.col("f") - 1))
                .cast("bigint")
                .alias(alias)
            )
        )

    row = (
        m.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(_u_pairs("p_size", "size_u_pairs")))
        .crossJoin(F.broadcast(_u_pairs("pgrid", "price_u_pairs")))
    )
    fields = row.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p_size").alias("field"),
                    F.col("size_agree_m").alias("n_agree_match"),
                    F.col("size_u_pairs").alias("u_agree_pairs"),
                ),
                F.struct(
                    F.lit("price_grid").alias("field"),
                    F.col("price_agree_m").alias("n_agree_match"),
                    F.col("price_u_pairs").alias("u_agree_pairs"),
                ),
            )
        ).alias("fx"),
    )
    mp = F.col("fx.n_agree_match").cast("double") / F.col(
        "n_match_pairs"
    ).cast("double")
    up = F.col("fx.u_agree_pairs").cast("double") / (
        F.col("n_recs") * (F.col("n_recs") - 1)
    ).cast("double")
    return (
        fields.select(
            F.col("fx.field").alias("field"),
            "n_match_pairs",
            F.col("fx.n_agree_match").alias("n_agree_match"),
            "n_recs",
            F.col("fx.u_agree_pairs").alias("u_agree_pairs"),
            F.when(F.col("n_match_pairs") > 0, mp).alias("m_prob"),
            up.alias("u_prob"),
            F.when(
                (F.col("n_match_pairs") > 0)
                & (F.col("fx.n_agree_match") > 0)
                & (F.col("fx.u_agree_pairs") > 0),
                F.log(mp / up),
            ).alias("w_agree"),
            F.when(
                (F.col("n_match_pairs") > 0)
                & (F.col("fx.n_agree_match") < F.col("n_match_pairs"))
                & (
                    F.col("fx.u_agree_pairs")
                    < F.col("n_recs") * (F.col("n_recs") - 1)
                ),
                F.log(
                    (F.lit(1).cast("double") - mp)
                    / (F.lit(1).cast("double") - up)
                ),
            ).alias("w_disagree"),
        )
        .orderBy("field")
    )


FELLEGI_SUNTER_ORACLE = f"""
    WITH t AS (
        SELECT p_partkey, p_brand, p_type, p_name, p_size,
               CAST(floor(p_retailprice * {FS_PRICE_GRID}) AS BIGINT) AS pgrid
        FROM part
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_match_pairs,
               CAST(sum(CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END)
                   AS BIGINT) AS size_agree_m,
               CAST(sum(CASE WHEN a.pgrid = b.pgrid THEN 1 ELSE 0 END)
                   AS BIGINT) AS price_agree_m
        FROM t a
        JOIN t b ON a.p_brand = b.p_brand AND a.p_type = b.p_type
                AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_recs FROM t),
    us AS (
        SELECT CAST(sum(f * (f - 1)) AS BIGINT) AS size_u_pairs
        FROM (SELECT CAST(count(*) AS BIGINT) AS f FROM t GROUP BY p_size)
    ),
    up AS (
        SELECT CAST(sum(f * (f - 1)) AS BIGINT) AS price_u_pairs
        FROM (SELECT CAST(count(*) AS BIGINT) AS f FROM t GROUP BY pgrid)
    ),
    fields AS (
        SELECT 'p_size' AS field, n_match_pairs, size_agree_m AS n_agree_match,
               n_recs, size_u_pairs AS u_agree_pairs
        FROM m, tot, us
        UNION ALL
        SELECT 'price_grid', n_match_pairs, price_agree_m, n_recs,
               price_u_pairs
        FROM m, tot, up
    )
    SELECT field, n_match_pairs, n_agree_match, n_recs, u_agree_pairs,
           CASE WHEN n_match_pairs > 0
                THEN CAST(n_agree_match AS DOUBLE)
                     / CAST(n_match_pairs AS DOUBLE) END AS m_prob,
           CAST(u_agree_pairs AS DOUBLE)
               / CAST(n_recs * (n_recs - 1) AS DOUBLE) AS u_prob,
           CASE WHEN n_match_pairs > 0 AND n_agree_match > 0
                     AND u_agree_pairs > 0
                THEN ln((CAST(n_agree_match AS DOUBLE)
                         / CAST(n_match_pairs AS DOUBLE))
                        / (CAST(u_agree_pairs AS DOUBLE)
                           / CAST(n_recs * (n_recs - 1) AS DOUBLE)))
           END AS w_agree,
           CASE WHEN n_match_pairs > 0 AND n_agree_match < n_match_pairs
                     AND u_agree_pairs < n_recs * (n_recs - 1)
                THEN ln((CAST(1 AS DOUBLE)
                         - CAST(n_agree_match AS DOUBLE)
                           / CAST(n_match_pairs AS DOUBLE))
                        / (CAST(1 AS DOUBLE)
                           - CAST(u_agree_pairs AS DOUBLE)
                             / CAST(n_recs * (n_recs - 1) AS DOUBLE)))
           END AS w_disagree
    FROM fields
    ORDER BY field
"""


# ---------------------------------------------------------------------------
# Dedup policy funnel: the capstone report -- apply the three dedup
# policies TOGETHER (exact content hash, VERIFIED near-dup cluster
# survivorship, ExactSubstr span contamination) and account for what
# each removes and what survives all of them.  Survivorship clusters
# come from the MinHash-LSH VERIFIED pairs (exact Jaccard over the
# threshold), not the raw SimHash band pairs -- dedup_method_eval shows
# why: at this band setting SimHash floods ~20k false-positive pairs
# that would collapse the corpus into a handful of clusters and "keep"
# 3 documents of 500.  Exactly the class of policy mistake this funnel
# exists to surface before a 100 TB pass; the verified-pair policy is
# the production default.  Per document: the three flags joined once on
# doc_id; the rollup is one combinable aggregate.
# ---------------------------------------------------------------------------

SPAN_CONTAMINATION_MAX = 0.2  # drop docs with > 20% duplicated-span tokens


def dedup_policy_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import exact_substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    norm = F.md5(F.concat_ws(" ", tokenize(F.col("text"))))
    hashed = docs.select("doc_id", norm.alias("h"))
    w_keep = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_flag = hashed.join(w_keep, "h").select(
        "doc_id", (F.col("doc_id") != F.col("keep_id")).alias("is_exact_dup")
    )
    # keep-longest survivor per VERIFIED near-dup cluster (probe path:
    # the verified pair table is a materialized index, test-pinned equal
    # to dedup_minhash_lsh's from-raw output)
    pairs = neardup_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
    clusters = _cc_cluster_report(
        pairs, docs.select("doc_id"), "doc_id"
    ).select("doc_id", "cluster_id")
    chars = docs.select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    best = (
        clusters.join(chars, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("neg_chars"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("b")
        )
        .select(F.col("b.d").alias("doc_id"), F.lit(True).alias("is_survivor"))
    )
    survivors = best
    spans = exact_substring_dedup(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        (
            F.col("n_dup_positions").cast("double") / F.col("n_tokens")
            > SPAN_CONTAMINATION_MAX
        ).alias("is_span_contaminated"),
    )
    # spans come from the exploded token stream, so zero-token documents
    # have no row there: LEFT join + coalesce keeps them in the funnel
    # accounting (0 tokens, not contaminated) instead of silently
    # dropping them from n_docs/tokens_in (ADVICE r5 item #1)
    flags = (
        docs.select("doc_id")
        .join(exact_flag, "doc_id")
        .join(survivors, "doc_id", "left")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            "is_exact_dup",
            F.coalesce("is_survivor", F.lit(False)).alias("is_survivor"),
            F.coalesce("is_span_contaminated", F.lit(False)).alias(
                "is_span_contaminated"
            ),
        )
        .withColumn(
            "keeps",
            ~F.col("is_exact_dup")
            & F.col("is_survivor")
            & ~F.col("is_span_contaminated"),
        )
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        cnt(F.col("is_exact_dup")).alias("n_exact_dups"),
        cnt(~F.col("is_survivor")).alias("n_cluster_losers"),
        cnt(F.col("is_span_contaminated")).alias("n_span_contaminated"),
        cnt(F.col("keeps")).alias("n_kept"),
        F.sum(F.when(F.col("keeps"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_in"),
    ).select(
        "*",
        F.round(
            F.col("n_kept").cast("double") / F.col("n_docs"), 6
        ).alias("doc_keep_rate"),
        F.round(
            F.col("tokens_kept").cast("double") / F.col("tokens_in"), 6
        ).alias("token_keep_rate"),
    )


def _policy_funnel_oracle() -> str:
    from .text_analysis import EXACT_SUBSTRING_ORACLE

    return f"""
    WITH {DUCKDB_TOKS_CTE},
    hashed AS (
        SELECT doc_id, md5(array_to_string(ts, ' ')) AS h FROM toks
    ),
    exact_flag AS (
        SELECT doc_id,
               doc_id <> min(doc_id) OVER (PARTITION BY h) AS is_exact_dup
        FROM hashed
    ),
    near AS MATERIALIZED (SELECT doc_a, doc_b FROM ({MINHASH_LSH_ORACLE})),
    edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM near
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM near
    ),
    {_CC_DOCS},
    ranked AS (
        SELECT comp.cluster_id, comp.doc_id,
               row_number() OVER (PARTITION BY comp.cluster_id
                                  ORDER BY d.n_chars DESC, comp.doc_id ASC)
                   AS rk
        FROM comp JOIN documents d USING (doc_id)
    ),
    survivors AS (
        SELECT doc_id, TRUE AS is_survivor FROM ranked WHERE rk = 1
    ),
    spans AS MATERIALIZED (
        SELECT doc_id, n_tokens,
               CAST(n_dup_positions AS DOUBLE) / n_tokens
                   > {SPAN_CONTAMINATION_MAX} AS is_span_contaminated
        FROM ({EXACT_SUBSTRING_ORACLE})
    ),
    flags AS (
        -- LEFT join: zero-token docs have no span row; they stay in the
        -- funnel as (0 tokens, not contaminated) on both engines
        SELECT e.doc_id,
               coalesce(s.n_tokens, 0) AS n_tokens,
               e.is_exact_dup,
               coalesce(v.is_survivor, FALSE) AS is_survivor,
               coalesce(s.is_span_contaminated, FALSE) AS is_span_contaminated,
               NOT e.is_exact_dup AND coalesce(v.is_survivor, FALSE)
                   AND NOT coalesce(s.is_span_contaminated, FALSE) AS keeps
        FROM exact_flag e
        LEFT JOIN spans s USING (doc_id)
        LEFT JOIN survivors v USING (doc_id)
    )
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN is_exact_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_dups,
           CAST(sum(CASE WHEN NOT is_survivor THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cluster_losers,
           CAST(sum(CASE WHEN is_span_contaminated THEN 1 ELSE 0 END)
                AS BIGINT) AS n_span_contaminated,
           CAST(sum(CASE WHEN keeps THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keeps THEN n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_in,
           round(CAST(sum(CASE WHEN keeps THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS doc_keep_rate,
           round(CAST(sum(CASE WHEN keeps THEN n_tokens ELSE 0 END) AS DOUBLE)
                 / sum(n_tokens), 6) AS token_keep_rate
    FROM flags
"""


POLICY_FUNNEL_ORACLE = _policy_funnel_oracle()


# ---------------------------------------------------------------------------
# Incremental MinHash admission: continuous-ingest NEAR-dup control.
# incremental_dedup_new_docs rejects exact/normalized copies; this is
# its approximate sibling -- each incoming document (odd doc_ids, the
# same batch split) probes the EXISTING corpus's banded LSH index (even
# doc_ids) and is admitted only if no base document verifies as a
# near-dup.  The production property: a doc's MinHash signature depends
# only on its own shingles, so the base index is append-only state --
# admitting a batch never re-signatures the corpus, and the candidate
# join touches only band-key collisions between the batch and the
# index, never batch x corpus.  Verification computes exact Jaccard for
# CROSS-SET candidate pairs only; best match is a combinable
# max(struct(jaccard, -base_id)) (the exact-division double is
# bit-identical on both engines, so the tie-break is stable).
# ---------------------------------------------------------------------------


def incremental_minhash_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # probe path: a doc's signature depends only on its OWN shingles (the
    # lane mins never see other docs; the md5 dictionary hash is
    # per-shingle), so the per-split band tables are FILTERS of the one
    # materialized signature index -- the append-only property the
    # docstring describes, made literal
    bands = _bands_from_sig(minhash_sig_indexed(spark, sf_dir))
    base_bands = bands.filter(F.col("doc_id") % 2 == 0)
    inc_bands = bands.filter(F.col("doc_id") % 2 == 1)
    cand = (
        inc_bands.alias("i")
        .join(
            base_bands.alias("bb"),
            (F.col("i.band") == F.col("bb.band"))
            & (F.col("i.band_key") == F.col("bb.band_key")),
        )
        .select(
            F.col("i.doc_id").alias("inc_id"),
            F.col("bb.doc_id").alias("base_id"),
        )
        .distinct()
    )
    # exact cross-set Jaccard for candidates only: the materialized pair
    # table keyed (doc_a < doc_b); candidates sharing no shingle have no
    # row there and verify at jaccard 0.0 via the left join
    jp = jaccard_pairs_indexed(spark, sf_dir)
    jac = (
        cand.join(
            jp,
            (F.least("inc_id", "base_id") == jp["doc_a"])
            & (F.greatest("inc_id", "base_id") == jp["doc_b"]),
            "left",
        )
        .select(
            "inc_id",
            "base_id",
            F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
        )
    )
    best = jac.groupBy("inc_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max(
            F.struct(F.col("jaccard").alias("j"), (-F.col("base_id")).alias("nb"))
        ).alias("b"),
    )
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id")
    near = F.col("b.j") >= JACCARD_THRESHOLD
    return (
        incoming.join(
            best, incoming["doc_id"] == best["inc_id"], "left"
        )
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.when(near, -F.col("b.nb")).alias("near_dup_of"),
            F.when(near, F.round(F.col("b.j"), 6)).alias("best_jaccard"),
            F.coalesce(~near, F.lit(True)).alias("admitted"),
        )
        .orderBy("doc_id")
    )


def _incremental_minhash_oracle() -> str:
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ") AS band_key FROM sig"
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
        SELECT DISTINCT i.doc_id AS inc_id, b.doc_id AS base_id
        FROM bands i JOIN bands b
          ON i.band = b.band AND i.band_key = b.band_key
        WHERE i.doc_id % 2 = 1 AND b.doc_id % 2 = 0
    ),
    inter AS (
        SELECT i.doc_id AS inc_id, b.doc_id AS base_id, count(*) AS n_common
        FROM shing i JOIN shing b ON i.sh = b.sh
        WHERE i.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    jac AS (
        SELECT cand.inc_id, cand.base_id,
               CAST(coalesce(n_common, 0) AS DOUBLE)
                   / (si.n + sb.n - coalesce(n_common, 0)) AS jaccard
        FROM cand
        LEFT JOIN inter ON cand.inc_id = inter.inc_id
                       AND cand.base_id = inter.base_id
        JOIN sizes si ON cand.inc_id = si.doc_id
        JOIN sizes sb ON cand.base_id = sb.doc_id
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY inc_id
                                  ORDER BY jaccard DESC, base_id ASC) AS rk,
               count(*) OVER (PARTITION BY inc_id) AS nc
        FROM jac
    ),
    best AS (
        SELECT inc_id, nc AS n_candidates, jaccard AS best_j,
               base_id AS best_base
        FROM ranked WHERE rk = 1
    )
    SELECT d.doc_id,
           CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
           CASE WHEN best_j >= {JACCARD_THRESHOLD} THEN best_base END
               AS near_dup_of,
           CASE WHEN best_j >= {JACCARD_THRESHOLD} THEN round(best_j, 6) END
               AS best_jaccard,
           coalesce(NOT (best_j >= {JACCARD_THRESHOLD}), TRUE) AS admitted
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN best ON d.doc_id = best.inc_id
    ORDER BY d.doc_id
"""


INCREMENTAL_MINHASH_ORACLE = _incremental_minhash_oracle()


# ---------------------------------------------------------------------------
# Dedup-method evaluation harness: precision/recall/F1 of each
# approximate detector against its exact ground truth, AS A QUERY --
# the tuning loop a production dedup pipeline runs on a sample before
# committing band/threshold parameters to a 100 TB pass.  Three rows:
#
#   minhash_lsh   vs exact n-gram Jaccard pairs   (banding loses pairs)
#   simhash       vs exact n-gram Jaccard pairs   (a DIFFERENT signal:
#                 bit-sign profile vs set overlap -- both fp and fn)
#   embedding_lsh vs exact embedding cosine pairs (bucketing loses pairs)
#
# Counts are set joins on the pair keys (inner = tp, anti = fp/fn);
# precision/recall/F1 each ONE exact-integer division (F1 via
# 2tp/(2tp+fp+fn), no chained rounded doubles).  Every input is an
# already-declared query, so this adds no new wide stage shapes.
# ---------------------------------------------------------------------------


def _pair_eval(method: str, pred: DataFrame, truth: DataFrame) -> DataFrame:
    # each input feeds three set-join branches (tp/fp/fn); persist so the
    # underlying dedup pipeline runs once, not three times (the session
    # cache contract reclaims these)
    pred = pred.persist()
    truth = truth.persist()
    # shuffle-hash, never broadcast: a detector's pair table is NOT
    # driver-sized (simhash emits 2.4M pairs at sf0.1 already, and the
    # candidate count grows superlinearly with the corpus) -- an
    # auto-broadcast build of that side is exactly the misplan that
    # OOMs a long-lived driver at scale.  SHJ on the pair key is the
    # 100 TB plan: both sides hash-partition on (doc_a, doc_b), the
    # build map is per-partition, no sort, no driver collect.
    tp = pred.join(truth.hint("shuffle_hash"), ["doc_a", "doc_b"], "left_semi")
    fp = pred.join(truth.hint("shuffle_hash"), ["doc_a", "doc_b"], "left_anti")
    fn = truth.join(pred.hint("shuffle_hash"), ["doc_a", "doc_b"], "left_anti")
    counts = (
        tp.agg(F.count(F.lit(1)).alias("tp"))
        .crossJoin(fp.agg(F.count(F.lit(1)).alias("fp")))
        .crossJoin(fn.agg(F.count(F.lit(1)).alias("fn")))
    )
    return counts.select(
        F.lit(method).alias("method"),
        (F.col("tp") + F.col("fn")).alias("n_truth"),
        (F.col("tp") + F.col("fp")).alias("n_predicted"),
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6
        ).alias("recall"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ).alias("f1"),
    )


def dedup_method_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth_txt = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    mh = neardup_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
    sh = simhash_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
    truth_emb = dedup_embedding_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    el = dedup_embedding_lsh(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return (
        _pair_eval("minhash_lsh", mh, truth_txt)
        .unionByName(_pair_eval("simhash", sh, truth_txt))
        .unionByName(_pair_eval("embedding_lsh", el, truth_emb))
        .orderBy("method")
    )


def _method_eval_oracle() -> str:
    def eval_sql(method: str, pred: str, truth: str) -> str:
        return f"""
    SELECT '{method}' AS method,
           CAST(tp + fn AS BIGINT) AS n_truth,
           CAST(tp + fp AS BIGINT) AS n_predicted,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1
    FROM (
        SELECT
          (SELECT count(*) FROM {pred} p SEMI JOIN {truth} t
             USING (doc_a, doc_b)) AS tp,
          (SELECT count(*) FROM {pred} p ANTI JOIN {truth} t
             USING (doc_a, doc_b)) AS fp,
          (SELECT count(*) FROM {truth} t ANTI JOIN {pred} p
             USING (doc_a, doc_b)) AS fn
    )"""

    truth_txt = f"(SELECT doc_a, doc_b FROM ({NGRAM_JACCARD_ORACLE}))"
    mh = f"(SELECT doc_a, doc_b FROM ({MINHASH_LSH_ORACLE}))"
    sh = f"(SELECT doc_a, doc_b FROM ({SIMHASH_PAIRS_ORACLE}))"
    truth_emb = (
        f"(SELECT vec_a AS doc_a, vec_b AS doc_b FROM ({EMBEDDING_PAIRS_ORACLE}))"
    )
    el = (
        f"(SELECT vec_a AS doc_a, vec_b AS doc_b"
        f" FROM ({_embedding_lsh_oracle()}))"
    )
    return (
        eval_sql("embedding_lsh", el, truth_emb)
        + "\n    UNION ALL\n"
        + eval_sql("minhash_lsh", mh, truth_txt)
        + "\n    UNION ALL\n"
        + eval_sql("simhash", sh, truth_txt)
        + "\n    ORDER BY method"
    )


METHOD_EVAL_ORACLE = _method_eval_oracle()


# ---------------------------------------------------------------------------
# Entity resolution end-to-end: fuzzy match evidence closed into entity
# clusters.  fuzzy_part_name_pairs supplies the pairwise typo-distance
# evidence (blocked equi-join, per-block quadratic only); this operator
# runs the SAME min-label connected-components used for document
# near-dups (_cc_cluster_report) over those pairs, because pairwise
# match evidence is not an entity: A~B and B~C must merge A,B,C even
# though A,C never compared under the edit-distance cap.  One cluster =
# one resolved entity; the canonical member (minimum key) is the
# survivorship pick.  Scale inherits both parents: blocking bounds the
# quadratic stage, the CC loop is shuffle-on-key per round with
# lineage-truncated labels.
# ---------------------------------------------------------------------------


def part_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = fuzzy_part_name_pairs(spark, sf_dir).select(
        F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    report = _cc_cluster_report(pairs, part.select("p_partkey"), "p_partkey")
    return (
        report.join(part, "p_partkey")
        .select(
            "p_partkey",
            "p_name",
            "cluster_id",
            "cluster_size",
            "is_canonical",
        )
        .orderBy("p_partkey")
    )


PART_ENTITY_ORACLE = f"""
    WITH near AS MATERIALIZED (
        SELECT a.p_partkey AS ka, b.p_partkey AS kb
        FROM part a
        JOIN part b
          ON a.p_brand = b.p_brand AND a.p_type = b.p_type
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    ),
    edges AS MATERIALIZED (
        SELECT ka AS a, kb AS b FROM near
        UNION ALL
        SELECT kb AS a, ka AS b FROM near
    ),
    {cc_closure_cte("SELECT p_partkey FROM part", "p_partkey")}
    SELECT comp.p_partkey, p.p_name, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           comp.p_partkey = cluster_id AS is_canonical
    FROM comp JOIN part p USING (p_partkey)
    ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Passage-overlap doc pairs: the weighted companion of ngram-Jaccard --
# for every document pair sharing at least MIN_SHARED_PASSAGES distinct
# PASSAGE_WINDOW-token passages, how many distinct passages they share
# and how many window POSITIONS overlap (sum over shared fingerprints
# of least(cnt_a, cnt_b)) -- the plagiarism/quotation evidence doc-level
# MinHash smooths away.  Reuses text_analysis.passage_window_counts:
# the corpus-cardinality window stream collapses once to (doc, fp, cnt)
# and pairs come from a self-equi-join ON fp restricted to fingerprints
# seen in >= 2 docs -- data-sparse like every banding join here, never
# all-pairs.  A viral boilerplate passage is the skew case: AQE
# skew-split handles it, and a stop-passage cap (drop fps in > K docs,
# the dedup stop-shingle note) is the manual fallback.
# ---------------------------------------------------------------------------

MIN_SHARED_PASSAGES = 2


def doc_pair_passage_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import passage_window_counts

    docs = load_table(spark, sf_dir, "documents")
    grouped = passage_window_counts(docs)
    dup_fp = (
        grouped.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    cand = grouped.join(dup_fp, "fp", "left_semi")
    a = cand.select("fp", F.col("doc_id").alias("doc_a"), F.col("cnt").alias("cnt_a"))
    b = cand.select("fp", F.col("doc_id").alias("doc_b"), F.col("cnt").alias("cnt_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_passages"),
            F.sum(F.least("cnt_a", "cnt_b")).alias("shared_windows"),
        )
        .filter(F.col("n_shared_passages") >= MIN_SHARED_PASSAGES)
        .orderBy("doc_a", "doc_b")
    )


def _passage_overlap_oracle() -> str:
    from .text_analysis import DUCKDB_PASSAGE_COUNTS_CTE

    return f"""
    WITH {DUCKDB_PASSAGE_COUNTS_CTE},
    dup_fp AS (
        SELECT fp FROM grouped GROUP BY fp HAVING count(*) >= 2
    ),
    cand AS (SELECT * FROM grouped SEMI JOIN dup_fp USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*) AS n_shared_passages,
           CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS shared_windows
    FROM cand a JOIN cand b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_SHARED_PASSAGES}
    ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Incremental ingestion dedup: classify an INCOMING batch of documents
# against an existing BASE corpus -- the admission-control step of a
# continuously-fed training pipeline (the doc-side analogue of the CDC
# snapshot diff over orders).  The corpus split is deterministic
# (doc_id parity stands in for yesterday's snapshot vs today's crawl).
# Two admission tests, cheapest first: an exact raw-text hash, then a
# hash of the NORMALIZED token stream (catches whitespace/punctuation
# revisions of known text).  Both are broadcast-able semi-join probes
# keyed by hash against base-corpus-sized tables; at 100 TB the base
# hash set is a bucketed table the incoming batch probes without
# shuffling the base (join_strategies.colocated_bucket_join's layout).
# ---------------------------------------------------------------------------


def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm_text = F.concat_ws(" ", tokenize(F.col("text")))
    hashed = docs.select(
        "doc_id",
        F.md5("text").alias("h_raw"),
        F.md5(norm_text).alias("h_norm"),
    )
    base = hashed.filter(F.col("doc_id") % 2 == 0)
    incoming = hashed.filter(F.col("doc_id") % 2 == 1)
    base_raw = base.select("h_raw").distinct()
    base_norm = base.select("h_norm").distinct()
    exact = incoming.join(base_raw, "h_raw", "left_semi").select(
        "doc_id", F.lit(True).alias("m")
    )
    norm = incoming.join(base_norm, "h_norm", "left_semi").select(
        "doc_id", F.lit(True).alias("m")
    )
    return (
        incoming.join(exact.withColumnRenamed("m", "_e"), "doc_id", "left")
        .join(norm.withColumnRenamed("m", "_n"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_e", F.lit(False)).alias("exact_dup_of_base"),
            F.coalesce("_n", F.lit(False)).alias("normalized_dup_of_base"),
            (
                F.coalesce("_e", F.lit(False)) | F.coalesce("_n", F.lit(False))
            ).alias("rejected"),
        )
        .orderBy("doc_id")
    )


INCREMENTAL_DEDUP_ORACLE = """
    WITH hashed AS (
        SELECT doc_id,
               md5(text) AS h_raw,
               md5(array_to_string(
                   list_filter(
                       list_transform(regexp_split_to_array(text, '\\s+'),
                                      t -> regexp_replace(lower(t),
                                                          '[^0-9a-z]', '', 'g')),
                       x -> x <> ''), ' ')) AS h_norm
        FROM documents
    ),
    base AS (SELECT * FROM hashed WHERE doc_id % 2 = 0),
    inc AS (SELECT * FROM hashed WHERE doc_id % 2 = 1)
    SELECT doc_id,
           h_raw IN (SELECT h_raw FROM base) AS exact_dup_of_base,
           h_norm IN (SELECT h_norm FROM base) AS normalized_dup_of_base,
           (h_raw IN (SELECT h_raw FROM base)
            OR h_norm IN (SELECT h_norm FROM base)) AS rejected
    FROM inc
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SemDeDup-style embedding-space clusters (Abbas et al. 2023, "SemDeDup:
# Data-efficient learning at web-scale through semantic deduplication"):
# connected components over the LSH-bucketed cosine near-dup graph, so
# every vector gets a semantic-cluster assignment and a keep/drop
# canonical flag -- the decision layer on top of pairwise embedding
# evidence, exactly as dedup_clusters is for SimHash text evidence.
# Same two scale shapes composed: bucketed candidate generation (never
# all-pairs) + min-label propagation (one join + one combinable groupBy
# per round, diameter-bounded).
# ---------------------------------------------------------------------------


def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_embedding_lsh(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return _cc_cluster_report(pairs, vecs, "vec_id")


def _semdedup_clusters_oracle() -> str:
    from .similarity import _lsh_bucket_sql

    return f"""
    WITH {SQL_NORMALIZED_CTE},
    sig AS (
        SELECT vec_id, vn, ({_lsh_bucket_sql('vn')}) AS bucket FROM en
    ),
    near AS MATERIALIZED (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {sql_dot('a.vn', 'b.vn')} >= {COSINE_NEAR_DUP}
    ),
    edges AS MATERIALIZED (
        SELECT vec_a AS a, vec_b AS b FROM near
        UNION ALL
        SELECT vec_b AS a, vec_a AS b FROM near
    ),
    {cc_closure_cte("SELECT vec_id FROM embeddings", "vec_id")}
    SELECT vec_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           vec_id = cluster_id AS is_canonical
    FROM comp
"""


# ---------------------------------------------------------------------------
# DBSCAN over the LSH epsilon-graph (Ester, Kriegel, Sander & Xu 1996)
# -- density-based clustering as a GRAPH computation: with an arbitrary
# metric, DBSCAN is exactly (a) an epsilon-neighbor graph, (b) CORE
# points = vertices with >= MIN_PTS neighbors (self included), (c)
# clusters = connected components of the core-core subgraph, (d) BORDER
# points attach to an adjacent core's cluster, (e) the rest is NOISE.
# The epsilon-graph here is the audited LSH-bucketed cosine near-pair
# stream (dedup_embedding_lsh: never all-pairs), so this is DBSCAN*
# over the observable graph -- a cross-bucket neighbor the LSH misses
# is missed here too, declared exactly like every other banded path,
# and the oracle replicates the identical bucketing.
#
# What it adds over semdedup_clusters (plain CC on the same graph):
# density discrimination.  CC merges two dense regions connected by ONE
# chance pair -- the transitive-chaining failure mode -- while DBSCAN
# only propagates cluster identity through CORE points, so a low-degree
# bridge vector becomes border/noise instead of welding two clusters
# together.  The role column is the actionable output: cores = dup
# nests to collapse aggressively, borders = review, noise = keep.
#
# Determinism: degree thresholds are integer; cluster ids are min core
# ids from the shared min-label machinery; border attachment takes the
# MINIMUM adjacent core cluster id.  Scale: degree is one combinable
# groupBy over the symmetrized pair stream; the CC loop runs on the
# CORE subgraph (smaller than the full graph semdedup iterates); border
# attachment is one join + min-groupBy.
# ---------------------------------------------------------------------------

DBSCAN_MIN_PTS = 3  # a point plus >= 2 epsilon-neighbors makes a core


def dbscan_lsh_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    # persist the LSH pair join itself: it feeds both union branches of
    # sym AND the core-pair extraction -- unpersisted it would re-run
    # the bucket self-join + 64-dim dot filter once per consumer
    pairs = dedup_embedding_lsh(spark, sf_dir).select("vec_a", "vec_b").persist()
    sym = pairs.unionByName(
        pairs.select(
            F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b")
        )
    ).persist()  # feeds degree, the core subgraph, and border attachment
    deg = sym.groupBy(F.col("vec_a").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n")
    )
    degs = vecs.join(deg, "vec_id", "left").select(
        "vec_id",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_neighbors"),
    )
    cores = degs.filter(
        F.col("n_neighbors") + 1 >= DBSCAN_MIN_PTS
    ).select("vec_id")
    core_pairs = (
        pairs.join(
            cores.select(F.col("vec_id").alias("vec_a")), "vec_a", "left_semi"
        )
        .join(
            cores.select(F.col("vec_id").alias("vec_b")), "vec_b", "left_semi"
        )
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    core_labels = _cc_cluster_report(core_pairs, cores, "vec_id").select(
        "vec_id", F.col("cluster_id").alias("core_cl")
    )
    border = (
        sym.join(
            core_labels.select(
                F.col("vec_id").alias("vec_b"), F.col("core_cl")
            ),
            "vec_b",
        )
        .join(
            cores.select(F.col("vec_id").alias("vec_a")), "vec_a", "left_anti"
        )
        .groupBy(F.col("vec_a").alias("vec_id"))
        .agg(F.min("core_cl").alias("border_cl"))
    )
    return (
        degs.join(core_labels, "vec_id", "left")
        .join(border, "vec_id", "left")
        .select(
            "vec_id",
            "n_neighbors",
            F.when(F.col("core_cl").isNotNull(), F.lit("core"))
            .when(F.col("border_cl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("core_cl", "border_cl")
            .cast("bigint")
            .alias("cluster_id"),
        )
    )


def _dbscan_oracle() -> str:
    from .similarity import _lsh_bucket_sql

    return f"""
    WITH {SQL_NORMALIZED_CTE},
    sig AS (
        SELECT vec_id, vn, ({_lsh_bucket_sql('vn')}) AS bucket FROM en
    ),
    near AS MATERIALIZED (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {sql_dot('a.vn', 'b.vn')} >= {COSINE_NEAR_DUP}
    ),
    sym AS MATERIALIZED (
        SELECT vec_a AS a, vec_b AS b FROM near
        UNION ALL
        SELECT vec_b AS a, vec_a AS b FROM near
    ),
    degs AS (
        SELECT e.vec_id, CAST(coalesce(d.n, 0) AS BIGINT) AS n_neighbors
        FROM embeddings e
        LEFT JOIN (SELECT a AS vec_id, count(*) AS n FROM sym GROUP BY 1) d
            USING (vec_id)
    ),
    cores AS (
        SELECT vec_id FROM degs WHERE n_neighbors + 1 >= {DBSCAN_MIN_PTS}
    ),
    edges AS MATERIALIZED (
        SELECT s.a, s.b
        FROM sym s
        SEMI JOIN cores ca ON s.a = ca.vec_id
        SEMI JOIN cores cb ON s.b = cb.vec_id
    ),
    {cc_closure_cte("SELECT vec_id FROM cores", "vec_id")},
    border AS (
        SELECT s.a AS vec_id, min(c.cluster_id) AS border_cl
        FROM sym s
        JOIN comp c ON s.b = c.vec_id
        ANTI JOIN cores x ON s.a = x.vec_id
        GROUP BY s.a
    )
    SELECT d.vec_id, d.n_neighbors,
           CASE WHEN cp.cluster_id IS NOT NULL THEN 'core'
                WHEN b.border_cl IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(coalesce(cp.cluster_id, b.border_cl) AS BIGINT) AS cluster_id
    FROM degs d
    LEFT JOIN comp cp USING (vec_id)
    LEFT JOIN border b USING (vec_id)
"""


DBSCAN_ORACLE = _dbscan_oracle()


# ---------------------------------------------------------------------------
# Cross-source near-dup matrix -- the syndication/mirroring report: for
# every (source, source) pair, how many verified near-dup pairs connect
# them.  A hot off-diagonal cell means two crawl sources mirror each
# other (keep one); a hot diagonal cell means a source repeats itself
# (template spam).  This is the report a curation lead reads before
# deciding which SOURCES to drop, one level above per-document dedup.
#
# Scale: rides the audited dedup_minhash_lsh pipeline unchanged (banded
# candidates + exact verification -- never all-pairs); the matrix adds
# two dimension-sized joins on doc_id and a rollup bounded by
# |sources|^2 cells.  The pair ordering is normalized with
# least/greatest so each unordered source pair lands in one cell.
# ---------------------------------------------------------------------------


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = neardup_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
    sa = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa")
    )
    sb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb")
    )
    cells = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    total = cells.agg(F.sum("n_pairs").cast("bigint").alias("total_pairs"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            F.round(
                F.col("n_pairs").cast("double") / F.col("total_pairs"), 6
            ).alias("pair_share"),
        )
        .orderBy("source_a", "source_b")
    )


CROSS_SOURCE_MATRIX_ORACLE = f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({MINHASH_LSH_ORACLE})
    ),
    cells AS (
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               count(*) AS n_pairs
        FROM pairs
        JOIN documents da ON pairs.doc_a = da.doc_id
        JOIN documents db ON pairs.doc_b = db.doc_id
        GROUP BY 1, 2
    ),
    total AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total_pairs FROM cells)
    SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs,
           round(CAST(n_pairs AS DOUBLE) / any_value(total_pairs), 6)
               AS pair_share
    FROM cells, total
    GROUP BY source_a, source_b, n_pairs
    ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# Shingle document-frequency profile -- the tuning table consulted
# BEFORE setting dedup_minhash_stopshingle's document-frequency cap:
# power-of-two histogram of how many documents each distinct shingle
# appears in, with each bucket's share of the posting mass.  A heavy
# high-df tail is boilerplate (shingles that propose candidates without
# carrying similarity); the cap goes where the tail starts.
#
# Scale: one combinable groupBy on the shingle (df counts), then a
# <=64-cell histogram (bit-length bucket idiom, no log2) with one
# broadcast scalar total -- the profile costs one reduction over the
# same shingle stream every MinHash pass already builds.
# ---------------------------------------------------------------------------


def shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df_counts = (
        shingles_indexed(spark, sf_dir)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            (F.length(F.bin(F.col("df"))) - 1).cast("int").alias("bucket"),
            "df",
        )
    )
    total = df_counts.agg(
        F.count(F.lit(1)).alias("n_shingles_total"),
        F.sum("df").cast("bigint").alias("postings_total"),
    )
    return (
        df_counts.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum("df").cast("bigint").alias("n_postings"),
            F.min("df").cast("bigint").alias("min_df"),
            F.max("df").cast("bigint").alias("max_df"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_shingles",
            "n_postings",
            "min_df",
            "max_df",
            F.round(
                F.col("n_shingles").cast("double")
                / F.col("n_shingles_total"),
                6,
            ).alias("shingle_share"),
            F.round(
                F.col("n_postings").cast("double") / F.col("postings_total"),
                6,
            ).alias("posting_share"),
        )
        .orderBy("bucket")
    )


SHINGLE_DF_PROFILE_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dfc AS (
        SELECT CAST(length(printf('%b', count(*))) - 1 AS INTEGER) AS bucket,
               count(*) AS df
        FROM shing
        GROUP BY sh
    ),
    total AS (
        SELECT count(*) AS n_shingles_total,
               CAST(sum(df) AS BIGINT) AS postings_total
        FROM dfc
    )
    SELECT bucket,
           count(*) AS n_shingles,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(min(df) AS BIGINT) AS min_df,
           CAST(max(df) AS BIGINT) AS max_df,
           round(CAST(count(*) AS DOUBLE) / any_value(n_shingles_total), 6)
               AS shingle_share,
           round(CAST(sum(df) AS DOUBLE) / any_value(postings_total), 6)
               AS posting_share
    FROM dfc, total
    GROUP BY bucket
    ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# MinHash estimate-error audit -- per exact near-dup pair (the
# dedup_ngram_jaccard set), the sketch's own Jaccard ESTIMATE (matching
# lanes / 16) beside the exact Jaccard, plus the signed error.
# This is the sketch-calibration table: if the estimate systematically
# overshoots at low Jaccard the band layout is proposing junk (tighten
# rows-per-band); it also demonstrates the estimator the "skip exact
# verification at extreme scale" variant would rely on.
#
# Scale: the exact near-dup pair set is computed FIRST and the
# signature pipeline is restricted (left-semi on doc id, the
# dedup_minhash_lsh verify-step pattern) to the docs that actually
# appear in a surviving pair -- signatures cost O(near-dup docs), not
# O(corpus), and the audit table itself is pair-bounded.  The lane
# comparison is 16 integer equalities folded map-side.  All-integer
# until the two final divisions; deterministic because the signature
# lanes are.  (Round-9 re-plan: the r8 shape built full-corpus
# signatures only to join them onto a ~25-row pair set -- the corpus
# -sized distinct+join+16-min groupBy was pure waste at any scale.)
#
# Round-8 de-float (VERDICT r7 #3): the signed error is emitted as the
# EXACT integer pair ``err_num = match_lanes*n_union - 16*n_common`` /
# ``err_den = 16*n_union`` (est - jaccard = err_num/err_den) instead of
# the former ``round(est - jaccard, 6)`` -- a rounded subtraction of
# near-equal quotients, the class behind round-7's pca_gram_stats
# driver-red (exact .5 rounding boundaries of integer-derived rationals
# resolve differently across engine builds).  No rounding step remains.
# ---------------------------------------------------------------------------


def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe path: both sides are materialized indexes -- the surviving
    # pairs filter the exact pair table, and the signature joins restrict
    # the signature table to pair docs (lane mins are per-doc functions,
    # so any restriction is value-preserving)
    pairs = (
        jaccard_pairs_indexed(spark, sf_dir)
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    sig = minhash_sig_indexed(spark, sf_dir)
    siga = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(NUM_MINHASHES)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(NUM_MINHASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_MINHASHES)
    )
    est = matches.cast("double") / F.lit(float(NUM_MINHASHES))
    return (
        pairs.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # unrounded: a single IEEE division of exact ints (round(6)
            # of an exact rational is the pca_gram_stats red-class)
            F.col("jaccard").alias("jaccard"),
            est.alias("est_jaccard"),
            (
                matches * F.col("n_union")
                - F.lit(NUM_MINHASHES) * F.col("n_common")
            )
            .cast("bigint")
            .alias("err_num"),
            (F.lit(NUM_MINHASHES) * F.col("n_union"))
            .cast("bigint")
            .alias("err_den"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _minhash_estimate_error_oracle() -> str:
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    lane_matches = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(NUM_MINHASHES)
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT doc_a, doc_b, n_common,
               sa.n + sb.n - n_common AS n_union,
               CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
              >= {JACCARD_THRESHOLD}
    )
    SELECT exact.doc_a, exact.doc_b,
           jaccard,
           CAST(({lane_matches}) AS DOUBLE) / {NUM_MINHASHES}.0
               AS est_jaccard,
           CAST(({lane_matches}) * n_union
                - {NUM_MINHASHES} * n_common AS BIGINT) AS err_num,
           CAST({NUM_MINHASHES} * n_union AS BIGINT) AS err_den
    FROM exact
    JOIN sig sa ON exact.doc_a = sa.doc_id
    JOIN sig sb ON exact.doc_b = sb.doc_id
    ORDER BY exact.doc_a, exact.doc_b
"""


MINHASH_ESTIMATE_ERROR_ORACLE = _minhash_estimate_error_oracle()


# ---------------------------------------------------------------------------
# LSH bucket-balance profile -- the skew diagnostic to run BEFORE the
# band-bucket self-join.  The join's cost is sum over buckets of
# s*(s-1)/2; one hot bucket (a boilerplate band signature) dominates it
# the same way a hot join key dominates a shuffle join
# (join_key_skew_profile's sibling, one level deeper in the dedup
# stack).  Per band: a power-of-two histogram of bucket sizes with each
# size class's share of the band's candidate-pair mass.  Scale: bucket
# sizes are ONE combinable count over the banded signature stream; the
# histogram acts on bucket COUNTS (at most one row per occupied bucket),
# and pair mass stays on the integer lattice (s*(s-1) div 2).
# ---------------------------------------------------------------------------


def lsh_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe path: one map-side banding projection over the signature index
    bands = _bands_from_sig(minhash_sig_indexed(spark, sf_dir))
    sizes = bands.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    mass = F.expr("s * (s - 1) div 2")
    sized = sizes.select(
        "band",
        (F.length(F.bin(F.col("s"))) - 1).cast("int").alias("bucket"),
        "s",
        mass.alias("m"),
    )
    band_tot = sized.groupBy("band").agg(
        F.sum("m").cast("bigint").alias("band_pair_mass")
    )
    return (
        sized.groupBy("band", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("s").cast("bigint").alias("n_docs"),
            F.max("s").cast("bigint").alias("max_bucket"),
            F.sum("m").cast("bigint").alias("pair_mass"),
        )
        .join(F.broadcast(band_tot), "band")
        .select(
            "band",
            "bucket",
            "n_buckets",
            "n_docs",
            "max_bucket",
            "pair_mass",
            # round-8 de-float: a single IEEE division of exact bigints
            # is bit-deterministic cross-engine; round(6) of an exact
            # rational is the pca_gram_stats red-class (tie-boundary
            # hits resolve differently across engine builds)
            F.when(
                F.col("band_pair_mass") > 0,
                F.col("pair_mass").cast("double")
                / F.col("band_pair_mass").cast("double"),
            ).otherwise(F.lit(0.0)).alias("pair_mass_share"),
        )
        .orderBy("band", "bucket")
    )


def _lsh_bucket_balance_oracle() -> str:
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ") AS band_key FROM sig"
        for b in range(MINHASH_BANDS)
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    sizes AS (
        SELECT band, band_key, CAST(count(*) AS BIGINT) AS s
        FROM bands GROUP BY band, band_key
    ),
    sized AS (
        SELECT band,
               CAST(length(printf('%b', s)) - 1 AS INTEGER) AS bucket,
               s,
               s * (s - 1) // 2 AS m
        FROM sizes
    ),
    band_tot AS (
        SELECT band, CAST(sum(m) AS BIGINT) AS band_pair_mass
        FROM sized GROUP BY band
    )
    SELECT band, bucket,
           count(*) AS n_buckets,
           CAST(sum(s) AS BIGINT) AS n_docs,
           CAST(max(s) AS BIGINT) AS max_bucket,
           CAST(sum(m) AS BIGINT) AS pair_mass,
           CASE WHEN any_value(band_pair_mass) > 0
                THEN CAST(sum(m) AS DOUBLE)
                     / CAST(any_value(band_pair_mass) AS DOUBLE)
                ELSE 0.0e0 END AS pair_mass_share
    FROM sized JOIN band_tot USING (band)
    GROUP BY band, bucket
    ORDER BY band, bucket
"""


LSH_BUCKET_BALANCE_ORACLE = _lsh_bucket_balance_oracle()


# ---------------------------------------------------------------------------
# Survivor-bias audit -- dedup is not composition-neutral: keep-longest
# survivor selection preferentially drops sources whose documents
# syndicate widely (or write short), so the post-dedup corpus mix can
# drift from the declared mix the sampling weights were tuned on.  Per
# source: docs before, docs surviving keep-one-per-cluster, both shares,
# and the bias ratio share_after/share_before.  Rides the audited
# SimHash connected components + the exact keep-longest argmax the
# survivor query uses; products are lifted to decimal before the single
# double division (1e12 docs x 1e12 total overflows int64).  Scale: one
# k-bounded argmax per cluster, one LeftSemi onto survivors, two
# combinable source rollups, two broadcast scalars.
# ---------------------------------------------------------------------------


def dedup_survivor_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    DEC38 = "decimal(38,0)"
    clusters = simhash_clusters_indexed(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    joined = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    kept = (
        joined.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("neg"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("b")
        )
        .select(F.col("b.d").alias("doc_id"))
    )
    before = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before")
    )
    after = (
        docs.join(kept, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_after"))
    )
    tot = before.agg(
        F.sum("n_before").cast("bigint").alias("tb")
    ).crossJoin(
        F.broadcast(after.agg(F.sum("n_after").cast("bigint").alias("ta")))
    )
    merged = (
        before.join(after, "source", "left")
        .withColumn("n_after", F.coalesce(F.col("n_after"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    bias = (
        (F.col("n_after").cast(DEC38) * F.col("tb").cast(DEC38)).cast("double")
        / (F.col("n_before").cast(DEC38) * F.col("ta").cast(DEC38)).cast(
            "double"
        )
    )
    # round-8 de-float: shares and the bias ratio are single IEEE
    # divisions of exact integers / exact decimal products -- emitted
    # unrounded (bit-deterministic cross-engine); round(6) of an exact
    # rational is the pca_gram_stats red-class.
    return merged.select(
        "source",
        "n_before",
        "n_after",
        (F.col("n_before").cast("double") / F.col("tb")).alias(
            "share_before"
        ),
        (F.col("n_after").cast("double") / F.col("ta")).alias(
            "share_after"
        ),
        bias.alias("bias_ratio"),
    ).orderBy("source")


SURVIVOR_BIAS_ORACLE = f"""
    WITH {SIMHASH_SIG_CTE},
    near AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM near
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM near
    ),
    {_CC_DOCS},
    ranked AS (
        SELECT comp.cluster_id, comp.doc_id,
               row_number() OVER (PARTITION BY comp.cluster_id
                                  ORDER BY d.n_chars DESC, comp.doc_id ASC)
                   AS rk
        FROM comp JOIN documents d USING (doc_id)
    ),
    kept AS (SELECT doc_id FROM ranked WHERE rk = 1),
    before_ AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_before
        FROM documents GROUP BY source
    ),
    after_ AS (
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_after
        FROM documents d JOIN kept USING (doc_id)
        GROUP BY d.source
    ),
    tot AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS tb,
               (SELECT CAST(count(*) AS BIGINT) FROM kept) AS ta
    )
    SELECT b.source,
           n_before,
           CAST(coalesce(n_after, 0) AS BIGINT) AS n_after,
           CAST(n_before AS DOUBLE) / tb AS share_before,
           CAST(coalesce(n_after, 0) AS DOUBLE) / ta AS share_after,
           CAST(CAST(coalesce(n_after, 0) AS DECIMAL(38,0))
                * CAST(tb AS DECIMAL(38,0)) AS DOUBLE)
               / CAST(CAST(n_before AS DECIMAL(38,0))
                      * CAST(ta AS DECIMAL(38,0)) AS DOUBLE)
               AS bias_ratio
    FROM before_ b LEFT JOIN after_ a USING (source), tot
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# Per-source near-dup incidence (round 10) -- the one-level-up summary of
# cross_source_dup_matrix: for each source, how many of its documents
# appear in at least one VERIFIED near-dup pair.  A source with a high
# dup rate is a syndication mirror or template farm; this is the single
# column a curation dashboard sorts by before opening the full matrix.
# Scale: one distinct over the pair endpoints (bounded by verified
# pairs), one dimension join, one combinable source rollup.
# ---------------------------------------------------------------------------


def source_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = neardup_pairs_indexed(spark, sf_dir)
    in_pair = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .select("doc_id", F.lit(1).alias("dup"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        docs.join(in_pair, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce("dup", F.lit(0))).cast("bigint").alias(
                "n_dup_docs"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            F.round(
                F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


SOURCE_DEDUP_RATE_ORACLE = f"""
    WITH near AS ({MINHASH_LSH_ORACLE}),
    in_pair AS (
        SELECT DISTINCT doc_id, 1 AS dup FROM (
            SELECT doc_a AS doc_id FROM near
            UNION ALL
            SELECT doc_b AS doc_id FROM near
        )
    )
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(coalesce(dup, 0)) AS BIGINT) AS n_dup_docs,
           round(CAST(sum(coalesce(dup, 0)) AS DOUBLE) / count(*), 6)
               AS dup_rate
    FROM documents d
    LEFT JOIN in_pair USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# MinHash lane-uniformity audit (round 10) -- the hash-family health
# check over the materialized signature index.  Every lane is an affine
# map (a_i*h + b_i) mod P of the same md5 base hash, so across the corpus
# the 16 per-doc lane minima must look like iid draws from one
# distribution: near-identical distinct-value counts, means on the same
# order, comparable ranges.  A lane whose distinct count or mean diverges
# means a degenerate (a, b) pair -- its bands then systematically over-
# or under-propose candidates, a bias the downstream exact-Jaccard
# verification cannot repair (missed pairs stay missed).  This is the
# signature-table sibling of lsh_bucket_balance: that audits the BUCKET
# layout, this audits the HASH FAMILY underneath it.
# Scale: one map-side explode of the 16 flat lanes (no shuffle until the
# 16-group rollup); the value sum accumulates in DECIMAL(38,0) (lane
# minima < P ~ 2^31, so int64 would wrap past ~4e9 docs) and only the
# round(6) mean is emitted.
# ---------------------------------------------------------------------------


def minhash_lane_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_sig_indexed(spark, sf_dir)
    long = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("lane"), F.col(f"mh{i}").alias("v")
                    )
                    for i in range(NUM_MINHASHES)
                ]
            )
        ).alias("lv")
    ).select(F.col("lv.lane").alias("lane"), F.col("lv.v").alias("v"))
    return (
        long.groupBy("lane")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("_sv"),
            F.min("v").cast("bigint").alias("min_value"),
            F.max("v").cast("bigint").alias("max_value"),
        )
        .select(
            "lane",
            "n_docs",
            "n_distinct",
            F.round(
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_docs"),
                6,
            ).alias("collision_share"),
            F.round(F.col("_sv").cast("double") / F.col("n_docs"), 6).alias(
                "mean_value"
            ),
            "min_value",
            "max_value",
        )
        .orderBy("lane")
    )


def _lane_uniformity_oracle() -> str:
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    lane_selects = "\n        UNION ALL\n".join(
        f"        SELECT {i} AS lane, mh{i} AS v FROM sig"
        for i in range(NUM_MINHASHES)
    )
    return f"""
    WITH {DUCKDB_SHINGLES_CTE},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    lanes AS (
{lane_selects}
    )
    SELECT CAST(lane AS INTEGER) AS lane,
           count(*) AS n_docs,
           count(DISTINCT v) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT v) AS DOUBLE) / count(*), 6)
               AS collision_share,
           round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value,
           CAST(min(v) AS BIGINT) AS min_value,
           CAST(max(v) AS BIGINT) AS max_value
    FROM lanes
    GROUP BY lane
    ORDER BY lane
"""


LANE_UNIFORMITY_ORACLE = _lane_uniformity_oracle()


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (SNM, Hernandez-Stolfo) -- the THIRD blocking
# family next to LSH (hash-bucket) and prefix-filter (token-frequency):
# sort the corpus by a normalized key and compare each record only to
# its SNM_WINDOW rank-neighbors.  SNM catches what hash blocking can't
# promise: near-dups whose keys agree on a long PREFIX but whose shingle
# sets are perturbed enough to dodge a band collision; production
# entity-resolution stacks run SNM passes beside LSH for exactly that
# complementary recall, and this query is the audit that measures it
# (its pairs minus dedup_minhash_lsh's = the SNM-only recall).
#
# Key: the first SNM_KEY_LEN chars of the tokenizer-normalized text
# (lower, non-alphanumerics stripped) -- pure ASCII, so Spark and DuckDB
# binary collation sort identically.
#
# Global rank WITHOUT a global window (the decomposition
# global_exact_quantiles established): records bucket by the key's
# 2-char prefix (domain-bounded <= 37^2 buckets); in-bucket ranks are a
# bucket-partitioned row_number; bucket OFFSETS are a running sum over
# the broadcast-size per-bucket count table; global_rank = offset +
# in_bucket_rank reproduces the single-sort rank exactly because the
# bucket prefix is a prefix of the sort key (bucket-major order == key
# order).  On a real cluster the same two-pass shape is
# repartitionByRange + per-partition offsets; the bucket form is kept
# because it is engine-portable and plan-pinnable.
#
# Neighbor pairs are SNM_WINDOW exact equi-joins on global_rank + d
# (d = 1..W) -- never a rank-range theta-join -- then ONE join against
# the materialized exact-jaccard pair table verifies; pairs below
# JACCARD_THRESHOLD (or sharing no shingle at all) drop.  Per-pair
# rank_distance is emitted so the recall-vs-window tradeoff is readable
# straight off the result.
# ---------------------------------------------------------------------------

SNM_KEY_LEN = 12
SNM_WINDOW = 4
_SNM_BUCKET_LEN = 2


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^0-9a-z]", ""),
            1,
            SNM_KEY_LEN,
        ).alias("key"),
    ).select(
        "doc_id", "key", F.substring("key", 1, _SNM_BUCKET_LEN).alias("bucket")
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # window input is the per-bucket count table (domain-bounded), not docs
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("offset")
    )
    win = Window.partitionBy("bucket").orderBy("key", "doc_id")
    # eager localCheckpoint (the neardup_pagerank precedent): the ranked
    # table feeds both legs of all SNM_WINDOW rank-joins -- without the
    # cut, Catalyst inlines the rank subplan 2*W times
    ranked = (
        keyed.withColumn("r", F.row_number().over(win))
        .join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("offset") + F.col("r")).alias("grank"))
        .localCheckpoint()
    )
    # one equi-join on (grank + d): exploding d = 1..W on the left leg
    # yields the identical pair set as W separate joins but scans the
    # rank table twice instead of 2*W times
    r1 = ranked.withColumn(
        "d", F.explode(F.array(*[F.lit(i) for i in range(1, SNM_WINDOW + 1)]))
    ).alias("r1")
    r2 = ranked.alias("r2")
    cand = r1.join(
        r2, F.col("r2.grank") == F.col("r1.grank") + F.col("r1.d")
    ).select(
        F.least(F.col("r1.doc_id"), F.col("r2.doc_id")).alias("doc_a"),
        F.greatest(F.col("r1.doc_id"), F.col("r2.doc_id")).alias("doc_b"),
        F.col("r1.d").cast("int").alias("rank_distance"),
    )
    jac = jaccard_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    return (
        cand.join(jac, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "rank_distance", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


SORTED_NEIGHBORHOOD_ORACLE = f"""
    WITH {DUCKDB_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    jpairs AS (
        SELECT doc_a, doc_b,
               CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    ),
    ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY
                   substr(regexp_replace(lower(text), '[^0-9a-z]', '', 'g'),
                          1, {SNM_KEY_LEN}),
                   doc_id) AS grank
        FROM documents
    ),
    cand AS (
        SELECT least(a.doc_id, b.doc_id) AS doc_a,
               greatest(a.doc_id, b.doc_id) AS doc_b,
               CAST(b.grank - a.grank AS INTEGER) AS rank_distance
        FROM ranked a JOIN ranked b
          ON b.grank > a.grank AND b.grank <= a.grank + {SNM_WINDOW}
    )
    SELECT c.doc_a, c.doc_b, c.rank_distance, j.jaccard
    FROM cand c JOIN jpairs j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
    WHERE j.jaccard >= {JACCARD_THRESHOLD}
    ORDER BY c.doc_a, c.doc_b
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup -- the storage-layer complement
# of the document/passage dedupers above: split every token stream at
# CONTENT-DEFINED boundaries (a token whose md5 lane value is 0 mod
# CDC_MOD ends a chunk), fingerprint each chunk, and account duplicate
# chunk mass per source.  Because boundaries depend only on local
# content, an insertion or deletion re-aligns within one chunk instead
# of shifting every subsequent window -- the property fixed-size
# chunking lacks and the reason rsync/LBFS/FastCDC all cut on content.
# This is the degenerate gear width (one token of context); a FastCDC
# rolling gear adds min/max chunk clamps, which need sequential state --
# deliberately not reproduced, the boundary-rate expectation (1/CDC_MOD)
# is documented instead.  exact_substring_dedup answers "which SPANS are
# duplicated"; this answers "how much chunk-level storage/training mass
# is duplicated, per source" in one linear pass.
#
# Determinism: boundaries and fingerprints are md5-derived (portable
# hashing contract), the chunk fingerprint is md5 of the pos-ordered
# token join, and the canonical first occurrence is min (doc_id,
# chunk_id) -- every engine agrees bit-for-bit.
#
# Scale shape: tokenize (one scan) -> per-doc prefix-sum window
# (partitioned by doc_id, bounded by document length) -> one combinable
# groupBy (doc_id, chunk_id) -> first-occurrence window partitioned by
# fingerprint (bounded by duplicate multiplicity) -> per-source rollup.
# No self-joins, no cartesians; the collect_list is per-chunk
# (~CDC_MOD tokens), never per-doc or global.
# ---------------------------------------------------------------------------

CDC_MOD = 16  # expected chunk length in tokens (boundary rate 1/16)


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import TOKEN_SPLIT_RE, clean_token

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(F.split(F.col("text"), TOKEN_SPLIT_RE)).alias(
                "pos", "_t"
            ),
        )
        .select(
            "doc_id", "source", "pos", clean_token(F.col("_t")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    # boundary AFTER a token whose 60-bit md5 prefix is 0 mod CDC_MOD;
    # chunk_id of a token = boundaries among strictly earlier tokens
    b = (
        F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("bigint")
        % CDC_MOD
        == 0
    ).cast("bigint")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = tok.withColumn("b", b).withColumn(
        "chunk_id", F.coalesce(F.sum("b").over(w_prev), F.lit(0)).cast("bigint")
    )
    chunks = chunked.groupBy("doc_id", "source", "chunk_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            )
        ).alias("fp"),
    )
    w_first = Window.partitionBy("fp").orderBy("doc_id", "chunk_id")
    flagged = chunks.withColumn("is_dup", F.row_number().over(w_first) > 1)
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("dup_chunks"),
        F.sum(F.when(F.col("is_dup"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("dup_tokens"),
    )
    return agg.select(
        "source",
        "n_chunks",
        "n_tokens",
        "dup_chunks",
        "dup_tokens",
        (
            F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double")
        ).alias("dup_token_share"),
        (
            F.col("n_tokens").cast("double") / F.col("n_chunks").cast("double")
        ).alias("mean_chunk_tokens"),
    ).orderBy("source")


CDC_CHUNK_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, source, pos,
               regexp_replace(lower(t.tok), '[^0-9a-z]', '', 'g') AS word
        FROM (
            SELECT doc_id, source,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok,
                   generate_subscripts(regexp_split_to_array(text, '\\s+'), 1)
                       - 1 AS pos
            FROM documents
        ) t
        WHERE regexp_replace(lower(t.tok), '[^0-9a-z]', '', 'g') <> ''
    ),
    bnd AS (
        SELECT doc_id, source, pos, word,
               CASE WHEN ('0x' || substr(md5(word), 1, 15))::BIGINT
                        % {CDC_MOD} = 0
                    THEN 1 ELSE 0 END AS b
        FROM tok
    ),
    chunked AS (
        SELECT doc_id, source, pos, word,
               CAST(COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS chunk_id
        FROM bnd
    ),
    chunks AS (
        SELECT doc_id, source, chunk_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               md5(string_agg(word, ' ' ORDER BY pos)) AS fp
        FROM chunked
        GROUP BY doc_id, source, chunk_id
    ),
    flagged AS (
        SELECT source, n_tokens,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_id)
                   > 1 AS is_dup
        FROM chunks
    ),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_chunks,
               CAST(sum(CASE WHEN is_dup THEN n_tokens ELSE 0 END) AS BIGINT)
                   AS dup_tokens
        FROM flagged
        GROUP BY source
    )
    SELECT source, n_chunks, n_tokens, dup_chunks, dup_tokens,
           CAST(dup_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS dup_token_share,
           CAST(n_tokens AS DOUBLE) / CAST(n_chunks AS DOUBLE)
               AS mean_chunk_tokens
    FROM agg
    ORDER BY source
"""


# ---------------------------------------------------------------------------
# Leakage-safe split audit -- the reason a dedup pipeline exists at all:
# if near-duplicates straddle a train/eval split, the eval set is
# contaminated no matter how good the decontamination regexes are.
# train_test_split_events splits EVENTS group-safely by user; this
# audits the DOCUMENT split both ways:
#
#   by_doc      -- the naive md5(doc_id) % MOD split (what most
#                  pipelines ship), and how many verified near-dup
#                  pairs it tears across the boundary (= leaked eval
#                  docs with a training near-twin);
#   by_cluster  -- the same hash applied to the near-dup CLUSTER id,
#                  so a whole component lands on one side.  Its leaked
#                  count is zero BY CONSTRUCTION (every near-dup pair
#                  is intra-cluster by definition of the closure) --
#                  the audit proves the invariant instead of assuming
#                  it, and reports the size/char skew the coarser
#                  granularity costs.
#
# Probe path: rides the materialized CC report and near-dup pair index
# (index/probe split); the from-raw iterative pipeline stays
# oracle-checked as dedup_clusters.  Exactness: md5-derived split flags
# (the kfold contract), integer counts, shares as single double
# divisions; an empty pair table yields NULL leak share, not 0/0.
#
# Scale shape: one persisted (doc, flags) projection, two combinable
# global aggregates, and two equi-joins attaching endpoint flags to the
# pair index -- no windows, no cartesians, output exactly 2 rows.
# ---------------------------------------------------------------------------

SPLIT_TEST_MOD = 5  # md5-hash 1/5 of docs (or clusters) into the eval side


def leakage_safe_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cl = simhash_clusters_indexed(spark, sf_dir).select("doc_id", "cluster_id")

    def _test(col: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            % SPLIT_TEST_MOD
            == 0
        )

    # the flag table is DOCS-sized: hint both attach joins SHUFFLE_HASH
    # so Catalyst never auto-broadcasts a corpus-growing build side (the
    # dedup_method_eval lesson -- the auto-broadcast OOMs a long-lived
    # driver at sf0.1 and is wrong at any real scale)
    a = (
        docs.join(cl.hint("shuffle_hash"), "doc_id")
        .select(
            "doc_id",
            "n_chars",
            _test(F.col("doc_id")).alias("by_doc"),
            _test(F.col("cluster_id")).alias("by_cluster"),
        )
        .persist()
    )
    pairs = simhash_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
    out = None
    for strat in ("by_cluster", "by_doc"):
        tots = a.agg(
            F.count(F.lit(1)).cast("bigint").alias("total_docs"),
            F.sum(F.when(F.col(strat), 1).otherwise(0))
            .cast("bigint")
            .alias("test_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.when(F.col(strat), F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("test_chars"),
        )
        leaks = (
            pairs.join(
                a.select(
                    F.col("doc_id").alias("doc_a"), F.col(strat).alias("ta")
                ).hint("shuffle_hash"),
                "doc_a",
            )
            .join(
                a.select(
                    F.col("doc_id").alias("doc_b"), F.col(strat).alias("tb")
                ).hint("shuffle_hash"),
                "doc_b",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total_pairs"),
                F.sum(F.when(F.col("ta") != F.col("tb"), 1).otherwise(0))
                .cast("bigint")
                .alias("leaked_pairs"),
            )
        )
        row = (
            tots.crossJoin(F.broadcast(leaks))
            .select(
                F.lit(strat).alias("strategy"),
                "test_docs",
                "total_docs",
                (
                    F.col("test_docs").cast("double")
                    / F.col("total_docs").cast("double")
                ).alias("test_doc_share"),
                "test_chars",
                "total_chars",
                (
                    F.col("test_chars").cast("double")
                    / F.col("total_chars").cast("double")
                ).alias("test_char_share"),
                # an empty pair table aggregates to NULL sums: pin 0
                F.coalesce(F.col("leaked_pairs"), F.lit(0).cast("bigint")).alias(
                    "leaked_pairs"
                ),
                "total_pairs",
                F.when(
                    F.col("total_pairs") > 0,
                    F.col("leaked_pairs").cast("double")
                    / F.col("total_pairs").cast("double"),
                ).alias("leaked_pair_share"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("strategy")


LEAKAGE_SPLIT_ORACLE = f"""
    WITH {SIMHASH_SIG_CTE},
    near AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM near
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM near
    ),
    {_CC_DOCS},
    a AS MATERIALIZED (
        SELECT d.doc_id, d.n_chars,
               ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % {SPLIT_TEST_MOD} = 0 AS by_doc,
               ('0x' || substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 15))::BIGINT
                   % {SPLIT_TEST_MOD} = 0 AS by_cluster
        FROM documents d JOIN comp c USING (doc_id)
    ),
    strat AS (
        SELECT 'by_cluster' AS strategy, by_cluster AS t, doc_id, n_chars FROM a
        UNION ALL
        SELECT 'by_doc' AS strategy, by_doc AS t, doc_id, n_chars FROM a
    ),
    tots AS (
        SELECT strategy,
               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS test_docs,
               CAST(count(*) AS BIGINT) AS total_docs,
               CAST(sum(CASE WHEN t THEN n_chars ELSE 0 END) AS BIGINT)
                   AS test_chars,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM strat GROUP BY strategy
    ),
    leaks AS (
        SELECT s1.strategy,
               CAST(count(*) AS BIGINT) AS total_pairs,
               CAST(sum(CASE WHEN s1.t <> s2.t THEN 1 ELSE 0 END) AS BIGINT)
                   AS leaked_pairs
        FROM near n
        JOIN strat s1 ON s1.doc_id = n.doc_a
        JOIN strat s2 ON s2.doc_id = n.doc_b AND s2.strategy = s1.strategy
        GROUP BY s1.strategy
    )
    SELECT t.strategy, test_docs, total_docs,
           CAST(test_docs AS DOUBLE) / CAST(total_docs AS DOUBLE)
               AS test_doc_share,
           test_chars, total_chars,
           CAST(test_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
               AS test_char_share,
           COALESCE(leaked_pairs, CAST(0 AS BIGINT)) AS leaked_pairs,
           COALESCE(total_pairs, CAST(0 AS BIGINT)) AS total_pairs,
           CASE WHEN COALESCE(total_pairs, 0) > 0
                THEN CAST(leaked_pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE)
                ELSE NULL END AS leaked_pair_share
    FROM tots t LEFT JOIN leaks l USING (strategy)
    ORDER BY t.strategy
"""


# ---------------------------------------------------------------------------
# dedup_capture_recapture: Lincoln-Petersen / Chapman estimate of the
# TRUE near-dup pair population from two INDEPENDENT-BY-CONSTRUCTION
# detectors -- the two disjoint halves of the 16-lane MinHash banding
# (bands 0-3 vs bands 4-7).  Each half captures a verified near-dup
# pair with its own band-collision probability over DISJOINT hash
# lanes, the textbook two-occasion capture design, so
#
#     N_hat = (n1+1)(n2+1)/(m+1) - 1        (Chapman 1951)
#
# estimates how many near-dup pairs the banding family would find with
# infinitely many lanes -- i.e. HOW MANY PAIRS THE SKETCH MISSES,
# answered without trusting the sketch.  The exact pair count rides
# along as the audit anchor (this is an audit query, the
# dedup_method_eval posture: the ground-truth join is the declared
# oracle path behind the eager-refusal guard).  Everything is exact
# integers to the two final divisions.
#
# Scale shape: band-key self-joins per half (the LSH posture, never
# all pairs), semi-joins against the materialized pair index, four
# scalar aggregates broadcast into one row.
# ---------------------------------------------------------------------------


def dedup_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_sig_indexed(spark, sf_dir)
    bands = _bands_from_sig(sig).persist()
    half = MINHASH_BANDS // 2
    cand_a = _band_candidates(bands.where(F.col("band") < half))
    cand_b = _band_candidates(bands.where(F.col("band") >= half))
    truth = (
        jaccard_pairs_indexed(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .persist()
    )
    det_a = cand_a.join(truth, ["doc_a", "doc_b"], "left_semi").persist()
    det_b = cand_b.join(truth, ["doc_a", "doc_b"], "left_semi").persist()
    n1 = det_a.agg(F.count(F.lit(1)).cast("bigint").alias("n_det_a"))
    n2 = det_b.agg(F.count(F.lit(1)).cast("bigint").alias("n_det_b"))
    m = (
        det_a.join(det_b, ["doc_a", "doc_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"))
    chapman = (
        (F.col("n_det_a") + 1).cast("double")
        * (F.col("n_det_b") + 1).cast("double")
        / (F.col("n_both") + 1).cast("double")
        - F.lit(1.0)
    )
    union = F.col("n_det_a") + F.col("n_det_b") - F.col("n_both")
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(nt))
        .select(
            "n_det_a",
            "n_det_b",
            "n_both",
            union.cast("bigint").alias("n_union"),
            chapman.alias("chapman_estimate"),
            "n_true_pairs",
            (
                union.cast("double") / F.col("n_true_pairs").cast("double")
            ).alias("union_coverage"),
        )
    )


def _capture_recapture_oracle() -> str:
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    mh_cols = ",\n               ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ") AS band_key FROM sig"
        for b in range(MINHASH_BANDS)
    )
    half = MINHASH_BANDS // 2
    return f"""
    WITH {{toks}},
    dict AS (
        SELECT sh, ('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P} AS h
        FROM (SELECT DISTINCT sh FROM shing)
    ),
    sig AS (
        SELECT doc_id,
               {mh_cols}
        FROM shing JOIN dict USING (sh)
        GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY doc_id),
    truth AS (
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
    det_a AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        WHERE a.band < {half}
          AND EXISTS (SELECT 1 FROM truth t
                      WHERE t.doc_a = a.doc_id AND t.doc_b = b.doc_id)
    ),
    det_b AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        WHERE a.band >= {half}
          AND EXISTS (SELECT 1 FROM truth t
                      WHERE t.doc_a = a.doc_id AND t.doc_b = b.doc_id)
    ),
    counts AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM det_a) AS n_det_a,
               (SELECT CAST(count(*) AS BIGINT) FROM det_b) AS n_det_b,
               (SELECT CAST(count(*) AS BIGINT) FROM det_a a
                WHERE EXISTS (SELECT 1 FROM det_b b
                              WHERE b.doc_a = a.doc_a
                                AND b.doc_b = a.doc_b)) AS n_both,
               (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs
    )
    SELECT n_det_a, n_det_b, n_both,
           CAST(n_det_a + n_det_b - n_both AS BIGINT) AS n_union,
           CAST(n_det_a + 1 AS DOUBLE) * CAST(n_det_b + 1 AS DOUBLE)
               / CAST(n_both + 1 AS DOUBLE) - 1.0 AS chapman_estimate,
           n_true_pairs,
           CAST(n_det_a + n_det_b - n_both AS DOUBLE)
               / CAST(n_true_pairs AS DOUBLE) AS union_coverage
    FROM counts
"""


from ..functions.text import DUCKDB_SHINGLES_CTE as _SHINGLES_CTE_CR  # noqa: E402

CAPTURE_RECAPTURE_ORACLE = _capture_recapture_oracle().format(
    toks=_SHINGLES_CTE_CR
)


DEDUP_QUERIES: list[tuple[str, object, str | None]] = [
    (
        "dedup_capture_recapture",
        dedup_capture_recapture,
        CAPTURE_RECAPTURE_ORACLE,
    ),
    ("cdc_chunk_dedup", cdc_chunk_dedup, CDC_CHUNK_ORACLE),
    (
        "leakage_safe_split_audit",
        leakage_safe_split_audit,
        LEAKAGE_SPLIT_ORACLE,
    ),
    (
        "dedup_sorted_neighborhood",
        dedup_sorted_neighborhood,
        SORTED_NEIGHBORHOOD_ORACLE,
    ),
    ("minhash_lane_uniformity", minhash_lane_uniformity, LANE_UNIFORMITY_ORACLE),
    ("source_dedup_rate", source_dedup_rate, SOURCE_DEDUP_RATE_ORACLE),
    (
        "dedup_survivor_bias_audit",
        dedup_survivor_bias_audit,
        SURVIVOR_BIAS_ORACLE,
    ),
    ("dedup_exact", dedup_exact, DEDUP_EXACT_ORACLE),
    ("fuzzy_part_name_pairs", fuzzy_part_name_pairs, FUZZY_PAIRS_ORACLE),
    ("fellegi_sunter_weights", fellegi_sunter_weights, FELLEGI_SUNTER_ORACLE),
    ("winnowing_fingerprints", winnowing_fingerprints, WINNOWING_ORACLE),
    ("part_entity_clusters", part_entity_clusters, PART_ENTITY_ORACLE),
    ("dedup_method_eval", dedup_method_eval, METHOD_EVAL_ORACLE),
    ("dedup_ngram_jaccard", dedup_ngram_jaccard, NGRAM_JACCARD_ORACLE),
    ("jaccard_threshold_curve", jaccard_threshold_curve, JACCARD_CURVE_ORACLE),
    (
        "prefix_filter_jaccard_join",
        prefix_filter_jaccard_join,
        PREFIX_FILTER_JACCARD_ORACLE,
    ),
    ("dedup_containment", dedup_containment, CONTAINMENT_ORACLE),
    ("dedup_minhash_lsh", dedup_minhash_lsh, MINHASH_LSH_ORACLE),
    (
        "dedup_minhash_stopshingle",
        dedup_minhash_stopshingle,
        MINHASH_STOPSHINGLE_ORACLE,
    ),
    (
        "minhash_band_sensitivity",
        minhash_band_sensitivity,
        BAND_SENSITIVITY_ORACLE,
    ),
    ("lsh_bucket_balance", lsh_bucket_balance, LSH_BUCKET_BALANCE_ORACLE),
    ("dedup_simhash", dedup_simhash, SIMHASH_ORACLE),
    (
        "simhash_band_width_audit",
        simhash_band_width_audit,
        SIMHASH_BAND_AUDIT_ORACLE,
    ),
    ("simhash_near_pairs", simhash_near_pairs, SIMHASH_PAIRS_ORACLE),
    ("dedup_embedding_pairs", dedup_embedding_pairs, EMBEDDING_PAIRS_ORACLE),
    ("dedup_embedding_lsh", dedup_embedding_lsh, _embedding_lsh_oracle()),
    ("cosine_threshold_curve", cosine_threshold_curve, _cosine_curve_oracle()),
    ("semantic_dedup_hybrid", semantic_dedup_hybrid, _semantic_hybrid_oracle()),
    ("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_ORACLE),
    ("cluster_size_histogram", cluster_size_histogram, CLUSTER_SIZE_HIST_ORACLE),
    ("dedup_cluster_survivors", dedup_cluster_survivors, DEDUP_SURVIVORS_ORACLE),
    ("doc_pair_passage_overlap", doc_pair_passage_overlap, _passage_overlap_oracle()),
    ("incremental_dedup_new_docs", incremental_dedup_new_docs, INCREMENTAL_DEDUP_ORACLE),
    (
        "incremental_minhash_admission",
        incremental_minhash_admission,
        INCREMENTAL_MINHASH_ORACLE,
    ),
    ("dedup_policy_funnel", dedup_policy_funnel, POLICY_FUNNEL_ORACLE),
    ("semdedup_clusters", semdedup_clusters, _semdedup_clusters_oracle()),
    ("dbscan_lsh_clusters", dbscan_lsh_clusters, DBSCAN_ORACLE),
    (
        "cross_source_dup_matrix",
        cross_source_dup_matrix,
        CROSS_SOURCE_MATRIX_ORACLE,
    ),
    ("shingle_df_profile", shingle_df_profile, SHINGLE_DF_PROFILE_ORACLE),
    (
        "minhash_estimate_error",
        minhash_estimate_error,
        MINHASH_ESTIMATE_ERROR_ORACLE,
    ),
]
