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

PRIORITY_WINDOW: tuple[str, ...] = (
    # reference parity (word count flagship + both inverted-index shapes)
    "wordcount",
    "inverted_index",
    "inverted_index_map",
    # dedup family -- every variant
    "dedup_exact",
    "fuzzy_part_name_pairs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "simhash_near_pairs",
    "dedup_embedding_pairs",
    "dedup_clusters",
    # graph
    "neardup_pagerank",
    # similarity family -- every variant
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ann_label_recall",
    "embedding_vector_suite",
    "kmeans_assign",
    # text analysis representatives
    "text_tfidf",
    "text_langid",
    "text_quality_score",
    "doc_fingerprint",
    "token_count_stats",
    "contamination_overlap",
    "pii_redaction",
    "vocab_encode_documents",
    "doc_token_windows",
    "token_budget_packing",
    # curation pipelines -- every variant
    "curation_pipeline",
    "merge_upsert_orders",
    "corpus_release_pipeline",
    "k_anonymity_report",
    "incremental_segment_revenue",
    "data_quality_audit",
    "training_data_prep",
    # statistics representatives
    "quantile_summary",
    "sample_stratified",
    "histogram_event_values",
    "winsorize_event_values",
    # temporal representatives
    "asof_join_purchase_view",
    "range_join_purchase_views_1h",
    "lag_feature_matrix",
    "scd2_user_event_intervals",
    # event-time windowing representatives
    "tumbling_window_events",
    "session_windows_users",
    # multimodal representatives
    "multimodal_chunk",
    "multimodal_dedup",
    # join-strategy plan shapes new this round
    "skew_join_salted",
    "colocated_bucket_join",
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
