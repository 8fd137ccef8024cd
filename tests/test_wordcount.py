from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_on_google_cloud_platform_spark.operators import wordcount
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "wordcount",
        "wordcount_salted",
        "inverted_index",
        "inverted_index_postings",
        "inverted_index_positional",
        "inverted_index_size_estimate",
    ],
)
def test_oracle_parity(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


def test_wordcount_total_is_token_count(spark):
    """Multiset stability (FIXTURES.md §2): sum of counts == cleaned tokens."""
    wc = QUERIES["wordcount"](spark, SF_SMOKE)
    total = wc.agg(F.sum("cnt")).collect()[0][0]
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    n_tokens = tokens_df(load_table(spark, SF_SMOKE, "documents")).count()
    assert total == n_tokens > 0


def test_parallelism_invariance(spark):
    """Reference's implicit property test (SURVEY.md §5): results must be
    invariant to parallelism degrees (its configs vary map/reduce 45 vs 50)."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    base = sorted(
        tokens_df(docs).groupBy("word").count().collect()
    )
    for n in (1, 4, 45):
        got = sorted(
            tokens_df(docs.repartition(n)).groupBy("word").count().collect()
        )
        assert got == base


def test_tokenizer_rules(spark):
    """Pin the tokenizer contract (FIXTURES.md §1): punctuation deleted not
    split, digits kept, symbol-only tokens dropped, whitespace runs split."""
    df = spark.createDataFrame(
        [(1, "Don't  stop quick-brown end. 42 --- _under_score_ MiXeD\tTAB\nline")],
        "doc_id long, text string",
    )
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df

    words = sorted(r.word for r in tokens_df(df).collect())
    assert words == sorted(
        ["dont", "stop", "quickbrown", "end", "42", "underscore", "mixed", "tab", "line"]
    )


def test_inverted_index_maptype_matches_flat(spark):
    flat = QUERIES["inverted_index"](spark, SF_SMOKE).collect()
    mapped = wordcount.inverted_index_maptype(spark, SF_SMOKE).collect()
    want = {}
    for r in flat:
        want.setdefault(r.word, {})[r.doc_id] = r.cnt
    got = {r.word: dict(r.postings_map) for r in mapped}
    assert got == want


def test_inverted_index_map_json_is_canonical(spark):
    """The declared query renders the map as byte-deterministic JSON:
    entries in doc_id order, so equal maps always serialize identically
    (hashable rows -- the CORRECTNESS_r01 red-row fix)."""
    import json

    rows = QUERIES["inverted_index_map"](spark, SF_SMOKE).collect()
    flat = QUERIES["inverted_index"](spark, SF_SMOKE).collect()
    want = {}
    for r in flat:
        want.setdefault(r.word, {})[r.doc_id] = r.cnt
    for r in rows:
        parsed = json.loads(r.postings_json)
        # JSON object keys are strings; compare against stringified doc_ids
        # and assert numeric (not lexicographic) doc_id ordering.
        assert parsed == {str(k): v for k, v in want[r.word].items()}
        assert list(parsed) == sorted(parsed, key=int)  # doc_id-ordered


def test_index_size_estimate_bounds(spark):
    """Delta-gap model invariants: the estimate never exceeds the flat
    64-bit layout (every gap bitlen <= 64), every bucket holds at least
    2^bucket-df words, and the ratio restates the integer columns."""
    rows = QUERIES["inverted_index_size_estimate"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.est_index_bits <= r.flat_index_bits
        assert r.flat_index_bits == 64 * r.n_postings
        assert r.n_postings >= r.n_words * (1 << r.df_bucket)
        assert r.compression_ratio == r.est_index_bits / r.flat_index_bits


def test_reference_text_sink(spark):
    df = spark.createDataFrame([("fox", 17)], "word string, cnt long")
    lines = [r.line for r in wordcount.reference_text_sink(df).collect()]
    assert lines == ["fox - [17]"]


@pytest.mark.slow
def test_oracle_parity_sf001(spark):
    for name in ("wordcount", "inverted_index_postings"):
        assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)
