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

# Round-12 rotation (VERDICT r11 items #1-#2): drain the ENTIRE
# never-driver-hashed backlog in one window -- the 42 queries added
# after the r11 rotation (COVERAGE.md "queued r12" list, including the
# 4 r11-deferred siblings and the 2 rows-only stragglers) -- plus the
# pin-required anchors (the reference's own two queries, the sole
# streaming/join_strategies members, one multimodal and one sql_surface
# representative, all driver-green in r11 or earlier).  After this bank,
# every oracle-checked query in the registry holds a driver hash with
# zero exceptions.  42 + 6 anchors = 48; the remaining 2 slots bank this
# round's new operators the same round they land (the r11 verdict's
# window-capacity rule: post-rotation additions may not exceed
# DRIVER_WINDOW minus the anchor set).  Two in-window queries carry
# deliberate round-12 VALUE changes, banked fresh here:
# item_item_cofilter_topk (customer fan-out cap, VERDICT r11 #1) and
# simhash_band_width_audit (wide-geometry row, VERDICT r11 #3).  Every
# rotated-out query keeps its prior banked hash and stays covered by
# tools/sweep.py + pytest.
PRIORITY_FAMILIES: dict[str, tuple[str, ...]] = {
    # reference parity: the reference's own two queries stay pinned
    "parity": (
        "wordcount",  # anchor (driver-green r1-r11)
        "inverted_index",  # anchor (driver-green r1-r11)
        "inverted_index_size_estimate",  # never-hashed (deferred r11)
    ),
    "dedup": (
        "prefix_filter_jaccard_join",  # queued r12
        "simhash_band_width_audit",  # queued r12 (+ r12 wide-geometry row)
        "dbscan_lsh_clusters",  # queued r12
        "dedup_sorted_neighborhood",  # queued r12
        "cdc_chunk_dedup",  # queued r12
        "leakage_safe_split_audit",  # queued r12
    ),
    "graph": (
        "link_prediction_scores",  # queued r12
        "khop_reach_profile",  # queued r12
        "ktruss_peel_funnel",  # queued r12
    ),
    "similarity": (
        "ann_rank_quality_curve",  # queued r12
        "ann_ivf_residual_pq_topk",  # queued r12
        "pq_residual_gain_audit",  # queued r12
        "jl_projection_distortion",  # queued r12
        "ann_filtered_topk",  # queued r12
        "ann_filter_recall_audit",  # queued r12
        "kcenter_coreset_select",  # queued r12
        "rbo_rank_overlap",  # queued r12
    ),
    "text": (
        "cms_width_error_curve",  # queued r12
        "bm25_topk_docs",  # queued r12
        "dirichlet_ql_topk_docs",  # queued r12
        "unigram_piece_candidates",  # queued r12
        "unigram_lm_learn",  # queued r12 (rows-only by design)
        "gate_agreement_kappa",  # queued r12
        "conformal_quality_threshold",  # queued r12 (+ r12 degenerate guard)
        "repeated_passage_windows",  # never-hashed (deferred r11)
        "text_bigrams",  # never-hashed (deferred r11)
        "text_normalize",  # never-hashed (deferred r11)
        # round-12's own additions, banked the round they land (the two
        # slots the anchor arithmetic leaves free)
        "js_divergence_sources",  # NEW r12
        "heaps_law_fit",  # NEW r12
    ),
    "pipeline": ("dp_sensitivity_audit",),  # queued r12
    "statistics": (
        "mann_whitney_u_test",  # queued r12
        "kruskal_wallis_h_test",  # queued r12
        "hill_tail_index",  # queued r12
        "ljung_box_test",  # queued r12
        "weighted_reservoir_sample",  # queued r12
        "stratified_quota_alloc",  # queued r12
        "geomean_event_value",  # never-hashed (rows-only by design)
        "value_decile_features_approx",  # never-hashed (rows-only by design)
    ),
    "relational": (
        "item_item_cofilter_topk",  # queued r12 (+ r12 fan-out cap)
        "pareto_frontier_customers",  # queued r12
        "audience_overlap_matrix",  # queued r12
    ),
    "temporal": (
        "holt_linear_smooth",  # queued r12
        "forecast_backtest_mase",  # queued r12
    ),
    "streaming": ("tumbling_window_events",),  # anchor (green r2-r11)
    "multimodal": ("multimodal_bytes_histogram",),  # anchor (green r11)
    "join_strategies": ("skew_join_salted",),  # anchor (green r2-r11)
    "sql_surface": ("q15_top_supplier_sql",),  # anchor (green r11)
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
