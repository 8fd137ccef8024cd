"""The declared query surface.

This registry is the Spark-native successor of the reference's UDF
registries ``MAPPER_FUNCTIONS`` / ``REDUCER_FUNCTIONS``
(``/root/reference/MapReduce.py:51-52``) -- queries addressed by name,
pluggable by adding an entry.  Each entry pairs a DataFrame builder
``(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) a DuckDB
oracle string over the same parquet tables.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL -- the driver's comparator sorts columns by
name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    dedup,
    graph,
    join_strategies,
    multimodal,
    pipeline,
    relational,
    similarity,
    statistics,
    temporal,
    text_analysis,
    wordcount,
)
from ..streaming import STREAMING_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --- reference parity (SURVEY.md §2, M0/M1) ---------------------------------
_register("wordcount", wordcount.word_count, wordcount.word_count_oracle())
# same semantics/oracle as wordcount; declared for its skew-safe plan shape
_register("wordcount_salted", wordcount.word_count_salted, wordcount.word_count_oracle())
_register("inverted_index", wordcount.inverted_index, wordcount.inverted_index_oracle())
_register(
    "inverted_index_postings",
    wordcount.inverted_index_postings,
    wordcount.inverted_index_postings_oracle(),
)
_register(
    "inverted_index_positional",
    wordcount.inverted_index_positional,
    wordcount.inverted_index_positional_oracle(),
)
# Reference-native map shape, rendered as canonical JSON so rows hash
# (the MapType library form is wordcount.inverted_index_maptype).
_register(
    "inverted_index_map",
    wordcount.inverted_index_map,
    wordcount.inverted_index_map_oracle(),
)
# round-7: delta-gap compression estimate over the reference's own index
_register(
    "inverted_index_size_estimate",
    wordcount.inverted_index_size_estimate,
    wordcount.inverted_index_size_estimate_oracle(),
)

# --- relational core (SURVEY.md §7 M2) --------------------------------------
for _name, _fn, _oracle in relational.RELATIONAL_QUERIES:
    _register(_name, _fn, _oracle)

# --- join strategies: salted skew join, bucket-colocated join -----------------
for _name, _fn, _oracle in join_strategies.JOIN_STRATEGY_QUERIES:
    _register(_name, _fn, _oracle)

# --- dedup suite (north star: training-data pipeline ops) -------------------
for _name, _fn, _oracle in dedup.DEDUP_QUERIES:
    _register(_name, _fn, _oracle)

# --- graph analytics over the near-dup evidence graph ------------------------
for _name, _fn, _oracle in graph.GRAPH_QUERIES:
    _register(_name, _fn, _oracle)

# --- similarity search -------------------------------------------------------
for _name, _fn, _oracle in similarity.SIMILARITY_QUERIES:
    _register(_name, _fn, _oracle)

# --- text analysis -----------------------------------------------------------
for _name, _fn, _oracle in text_analysis.TEXT_ANALYSIS_QUERIES:
    _register(_name, _fn, _oracle)

# --- composed curation pipeline ----------------------------------------------
for _name, _fn, _oracle in pipeline.PIPELINE_QUERIES:
    _register(_name, _fn, _oracle)

# --- distribution statistics + deterministic sampling ------------------------
for _name, _fn, _oracle in statistics.STATISTICS_QUERIES:
    _register(_name, _fn, _oracle)

# --- temporal joins (as-of, range) ------------------------------------------
for _name, _fn, _oracle in temporal.TEMPORAL_QUERIES:
    _register(_name, _fn, _oracle)

# --- event-time windowing (batch twins of the streaming plans) ---------------
for _name, _fn, _oracle in STREAMING_QUERIES:
    _register(_name, _fn, _oracle)

# --- multimodal binary columns ------------------------------------------------
for _name, _fn, _oracle in multimodal.MULTIMODAL_QUERIES:
    _register(_name, _fn, _oracle)

# --- SQL-text surface: identical ANSI text on Spark and DuckDB ---------------
from .sql_surface import SQL_SURFACE_QUERIES  # noqa: E402  (avoids circular import)

for _name, _fn, _oracle in SQL_SURFACE_QUERIES:
    _register(_name, _fn, _oracle)


# --- driver correctness window ordering --------------------------------------
# The driver's per-round correctness gate hashes the FIRST 50 registry
# entries (CORRECTNESS_r01.json == first 50 of registration order), so
# iteration order is part of the driver contract.  The window below puts
# one-or-more representatives of EVERY operator family (COVERAGE.md
# tables) inside the gate -- LLM-pipeline operators ahead of relational
# variants, which were all driver-green in round 1 and remain covered by
# tools/sweep.py + pytest.  tests/test_plans.py pins window membership
# per family so registry growth can't silently push a family dark.
DRIVER_WINDOW = 50

# Round-7 rotation (VERDICT r6 item #1): the window is declared BY FAMILY
# so the family-coverage pin (tests/test_plans.py) derives from this dict
# instead of duplicating it.  Composition this round:
#   * one multi-round-green ANCHOR per family (a systemic regression is
#     still caught by a known-stable query);
#   * 36 FIRST-TIMERS -- oracle-checked queries that have never received
#     a per-round driver hash (52 remained after r6's clean 32/32; the
#     remaining 16 rotate in next round).  All 19 round-6 additions are
#     included, notably the two round-7 RE-PLANNED queries
#     (source_frequency_cap, lang_token_budget_selection) and the
#     decimal-lifted kmeans_cluster_quality, whose numerics must bank a
#     fresh hash.  Every rotated-out sibling stays covered by
#     tools/sweep.py + pytest oracle parity.
PRIORITY_FAMILIES: dict[str, tuple[str, ...]] = {
    # reference parity: the reference's own two queries stay pinned
    "parity": ("wordcount", "inverted_index"),
    "dedup": (
        "dedup_exact",  # anchor
        "cluster_size_histogram",
        "cosine_threshold_curve",
        "dedup_cluster_survivors",
        "dedup_containment",
        "dedup_minhash_stopshingle",
        "doc_pair_passage_overlap",
        "incremental_dedup_new_docs",
    ),
    "graph": (
        "neardup_pagerank",  # anchor
        "neardup_degree_profile",
    ),
    "similarity": (
        "ann_ivf_topk",  # anchor
        "kmeans_cluster_quality",  # decimal-lifted sum this round
        "kmeans_label_purity",
        "pca_gram_stats",
        "embedding_norm_outliers",
    ),
    "text": (
        "text_tfidf",  # anchor
        "bpe_pair_counts",
        "kn_continuation_probs",
        "perplexity_quality_buckets",
        "quality_gate_stack",
        "tfidf_topk_terms",
        "training_shard_manifest",
        "length_bucket_profile",
    ),
    "pipeline": (
        "curation_pipeline",  # anchor
        "corpus_source_lang_matrix",
        "source_frequency_cap",  # re-planned this round: two-phase top-K
        "lang_token_budget_selection",  # re-planned: range prefix sum
        "language_sampling_weights",
        "embedding_alignment_audit",
        "event_rollup_cascade",
    ),
    "statistics": (
        "quantile_summary",  # anchor
        "daily_value_anomalies",
        "distinct_users_sketch_profile",
        "table_stats_profile",
    ),
    "relational": (
        "q18_large_orders",  # anchor (driver-green r1)
        "copurchase_part_pairs",
        "join_cardinality_estimate",
        "join_key_skew_profile",
    ),
    "temporal": (
        "asof_join_purchase_view",  # anchor
        "event_disorder_profile",
        "event_transition_matrix",
        "hour_of_week_profile",
        "interarrival_profile",
    ),
    "streaming": ("tumbling_window_events",),  # anchor
    "multimodal": ("multimodal_dedup",),  # anchor
    "join_strategies": ("skew_join_salted",),  # anchor
    "sql_surface": (
        "q1_pricing_summary_sql",  # anchor (driver-green r5+r6)
        "incremental_segment_revenue_sql",
    ),
}

PRIORITY_WINDOW: tuple[str, ...] = tuple(
    name for members in PRIORITY_FAMILIES.values() for name in members
)


def _reorder() -> None:
    global QUERIES
    missing = [n for n in PRIORITY_WINDOW if n not in QUERIES]
    if missing:  # fail loudly at import: a typo here would dark a family
        raise KeyError(f"PRIORITY_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in PRIORITY_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
