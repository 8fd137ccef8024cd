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

# Round-5 rotation (VERDICT r4 item #3): within each family, siblings
# that banked multiple green driver rounds rotate OUT in favor of
# members that have never received a per-round driver hash (31 of the
# 50 below are first-timers; every rotated-out sibling stays covered by
# tools/sweep.py + pytest oracle parity).  Every family keeps at least
# one multi-round-green anchor so a systemic regression is still caught
# by a known-stable query.
PRIORITY_WINDOW: tuple[str, ...] = (
    # reference parity (anchors -- the reference's own two queries)
    "wordcount",
    "inverted_index",
    "inverted_index_map",
    # dedup: two anchors + the round-4 scale paths' first hashes
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "semantic_dedup_hybrid",
    # graph: anchor + triangle counting's first hash
    "neardup_pagerank",
    "neardup_triangles",
    # similarity: two anchors + the int8 pair's first hashes
    "ann_ivf_topk",
    "kmeans_assign",
    "embedding_quantize_int8",
    "ann_int8_topk",
    # text analysis: anchors (tfidf, the newly-replanned packing, the
    # once-red vocab encode) + six first hashes
    "text_tfidf",
    "vocab_encode_documents",
    "token_budget_packing",
    "text_repetition_filter",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "corpus_zipf_stats",
    "vocab_table",
    "text_sentiment",
    "text_bigram_coverage",
    # curation pipelines: two anchors + the round-4 CDC/mixture pair
    "curation_pipeline",
    "training_data_prep",
    "corpus_mixture_sample",
    "snapshot_diff_orders",
    # statistics: anchor + four first hashes
    "quantile_summary",
    "value_decile_features",
    "geomean_event_value_exact",
    "train_test_split_events",
    "sample_topk_per_group",
    # relational: the two members never hashed by any round
    "q21_waiting_suppliers",
    "customer_rfm_features",
    # temporal: anchor + forward as-of and gap-fill first hashes
    "asof_join_purchase_view",
    "asof_forward_purchase_view",
    "events_gap_fill",
    # event-time windowing: anchor + three first hashes
    "tumbling_window_events",
    "sliding_window_events",
    "user_event_type_distinct",
    "enriched_purchases_by_tier",
    "purchase_snapshot_latest",
    # multimodal: anchor + metadata/resize first hashes
    "multimodal_dedup",
    "multimodal_metadata",
    "multimodal_resize",
    # join-strategy plan shapes (layout-dependent: keep both under gate)
    "skew_join_salted",
    "colocated_bucket_join",
    # SQL-text surface: first driver hashes for the dialect-portable form
    "q1_pricing_summary_sql",
    "k_anonymity_report_sql",
    "value_decile_features_sql",
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
