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

# Round-11 rotation (VERDICT r10 items #1-#2): the window is declared BY
# FAMILY so the family-coverage pin (tests/test_plans.py) derives from
# this dict instead of duplicating it.  Composition:
#   * the 9 never-hashed queries added post-rotation in r10 (COVERAGE.md
#     "queued r11" list) -- banking them restores the zero-exception
#     ledger invariant;
#   * RE-BANKS for the 12 queries whose VALUES changed when the codebook
#     cardinality was pinned to a constant (VERDICT r10 item #1,
#     md5-rank selection replacing the corpus-proportional stride): the
#     exact set comes from the committed digest diff
#     tools/digests_r10_sf0.01.json vs tools/digests_r11_sf0.01.json
#     (12 divergent, 3 of them already in the queued list above);
#   * the 2 parity anchors (pin-required) plus the sole members of the
#     streaming and join_strategies families;
#   * the remaining 28 slots drain the never-driver-hashed backlog
#     (COVERAGE.md), leaving only 4 deferred (inverted_index_size_
#     estimate, text_normalize, text_bigrams, repeated_passage_windows
#     -- each a close sibling of an already-banked query, and all four
#     stay in the committed sweep + digest bank).  Every rotated-out
#     query keeps its prior banked hash and stays covered by
#     tools/sweep.py + pytest; no rotated-out query's values changed
#     this round (digest diff: 12/12 divergent queries are in-window).
PRIORITY_FAMILIES: dict[str, tuple[str, ...]] = {
    # reference parity: the reference's own two queries stay pinned
    "parity": (
        "wordcount",  # anchor (driver-green r1-r10)
        "inverted_index",  # anchor (driver-green r1-r10)
    ),
    "dedup": (
        "source_dedup_rate",  # never-hashed (queued r11)
        "minhash_lane_uniformity",  # never-hashed (queued r11)
        "part_entity_clusters",  # never-hashed backlog
        "shingle_df_profile",  # never-hashed backlog
    ),
    "graph": (
        "knn_reciprocity_audit",  # never-hashed (queued r11)
        "neardup_clustering_coefficient",  # never-hashed backlog
        "neardup_kcore_peel",  # never-hashed backlog
    ),
    "similarity": (
        # re-banks: codebook pinned to K_CENTROIDS/PQ_CODEWORDS constants
        "ann_ivf_topk",
        "ann_ivf_pq_topk",
        "ann_ivf_nprobe_curve",
        "ann_recall_at_k_curve",
        "ann_method_recall",
        "pq_adc_topk",
        "kmeans_assign",
        "kmeans_cluster_quality",
        "kmeans_label_purity",
        # never-hashed (queued r11), values also moved with the codebook
        "ivf_cell_balance",
        "pq_code_usage",
        "pq_distortion_stats",
        "embedding_centroid_drift",  # never-hashed backlog
    ),
    "text": (
        "eval_decontam_funnel",  # never-hashed backlog
        "negative_sampling_pairs",  # never-hashed backlog
        "ngram_novelty_curve",  # never-hashed backlog
        "source_vocab_overlap",  # never-hashed backlog
        "term_pmi_pairs",  # never-hashed backlog
        "text_char_entropy",  # never-hashed backlog
        "tokenizer_fertility_by_lang",  # never-hashed backlog
    ),
    "pipeline": (
        "source_epochs_plan",  # never-hashed (queued r11)
        "mixture_temperature_curve",  # never-hashed backlog
        "source_policy_apply",  # never-hashed backlog
        "source_quality_decision",  # never-hashed backlog
        "t_closeness_report",  # never-hashed backlog
        "stratified_kfold_assign",  # never-hashed backlog
    ),
    "statistics": (
        "daily_value_mad_outliers",  # never-hashed (queued r11)
        "mann_kendall_trend_test",  # never-hashed (queued r11)
        "sketch_summary",  # never-hashed backlog
    ),
    "relational": ("customer_rfm_features_approx",),  # never-hashed backlog
    "temporal": (
        "purchase_attribution",  # never-hashed backlog
        "seasonality_adjusted_daily",  # never-hashed backlog
        "weekly_value_wow",  # never-hashed backlog
    ),
    "streaming": ("tumbling_window_events",),  # anchor (green r2-r10)
    "multimodal": (
        "multimodal_bytes_histogram",  # never-hashed backlog
        "multimodal_shard_manifest",  # never-hashed backlog
    ),
    "join_strategies": ("skew_join_salted",),  # anchor (green r2-r10)
    "sql_surface": (
        "q10_returned_items_sql",  # never-hashed backlog
        "q15_top_supplier_sql",  # never-hashed backlog
        "q16_supplier_diversity_sql",  # never-hashed backlog
        "q20_heavy_shippers_sql",  # never-hashed backlog
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
