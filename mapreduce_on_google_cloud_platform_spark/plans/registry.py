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
# MapType result: unit-tested order-insensitively, no SQL oracle (driver
# records a rows-only check).
_register("inverted_index_map", wordcount.inverted_index_map, None)

# --- relational core (SURVEY.md §7 M2) --------------------------------------
for _name, _fn, _oracle in relational.RELATIONAL_QUERIES:
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
