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

# Round-9 rotation (VERDICT r8 item #4, the FINAL rotation): the window
# is declared BY FAMILY so the family-coverage pin (tests/test_plans.py)
# derives from this dict instead of duplicating it.  Composition:
#   * 8 multi-round-green ANCHORS (a systemic regression is still caught
#     by a known-stable query; the reference's two queries stay pinned);
#   * 7 RE-BANKS -- the r8 driver reds, all one root cause (decimal
#     output columns decay to float64 through the driver's pandas fetch
#     of the DuckDB oracle), all converted this round to BIGINT /
#     canonical-STRING outputs and needing fresh green hashes;
#   * 35 FIRST-TIMERS -- every remaining oracle-checked query that has
#     never received a per-round driver hash (COVERAGE.md ledger).  The
#     two decimal-emitters among them (embedding_centroid_drift,
#     quality_logit_sufficient_stats) were converted BEFORE rotating in.
#     After this round the never-hashed ledger is EXHAUSTED: every
#     oracle-checked query has at least one banked driver hash.  Every
#     rotated-out sibling stays covered by tools/sweep.py + pytest.
PRIORITY_FAMILIES: dict[str, tuple[str, ...]] = {
    # reference parity: the reference's own two queries stay pinned
    "parity": (
        "wordcount",  # anchor (driver-green r1-r8)
        "inverted_index",  # anchor (driver-green r1-r8)
        "inverted_index_size_estimate",
    ),
    "dedup": (
        "dedup_exact",  # anchor (driver-green r1-r8)
        "cross_source_dup_matrix",
        "shingle_df_profile",
        "part_entity_clusters",
    ),
    "graph": (
        "neardup_lpa_communities",
        "neardup_clustering_coefficient",
        "neardup_kcore_peel",
    ),
    "similarity": (
        "ann_ivf_topk",  # anchor (driver-green r5, r8)
        "pca_gram_stats",  # RE-BANK: decimal -> BIGINT outputs
        "embedding_dim_stats",  # RE-BANK: decimal -> BIGINT var_num
        "label_centroid_distance_matrix",  # RE-BANK: dist2_q -> STRING
        "embedding_centroid_drift",  # first-timer, dist2_q -> STRING
    ),
    "text": (
        "text_tfidf",  # anchor (driver-green r4, r8)
        "quality_score_auc",  # RE-BANK: decimal -> BIGINT u2
        "quality_logit_sufficient_stats",  # first-timer, v -> BIGINT
        "ngram_novelty_curve",
        "eval_decontam_funnel",
        "repeated_passage_windows",
        "source_vocab_overlap",
        "term_pmi_pairs",
        "text_bigrams",
        "text_char_entropy",
        "text_normalize",
        "tokenizer_fertility_by_lang",
    ),
    "pipeline": (
        "source_policy_apply",
        "t_closeness_report",
        "source_quality_decision",
        "weekly_value_wow",
        "mixture_temperature_curve",
    ),
    "statistics": (
        "welch_t_test",  # RE-BANK: decimal -> BIGINT numerators
        "ks_drift_test",  # RE-BANK: decimal -> BIGINT d_num
        "stratified_kfold_assign",
        "sketch_summary",
    ),
    "relational": (
        "customer_rfm_features_approx",
        "negative_sampling_pairs",
    ),
    "temporal": (
        "daily_profile_similarity",  # RE-BANK: dist2_q -> STRING
        "purchase_attribution",
        "seasonality_adjusted_daily",
    ),
    "streaming": ("tumbling_window_events",),  # anchor (green r7-r8)
    "multimodal": (
        "multimodal_shard_manifest",
        "multimodal_bytes_histogram",
    ),
    "join_strategies": ("skew_join_salted",),  # anchor (green r7-r8)
    "sql_surface": (
        "q1_pricing_summary_sql",  # anchor (driver-green r5-r8)
        "q10_returned_items_sql",
        "q15_top_supplier_sql",
        "q16_supplier_diversity_sql",
        "q20_heavy_shippers_sql",
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
