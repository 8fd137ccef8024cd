from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
    TEXT_ANALYSIS_QUERIES,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in TEXT_ANALYSIS_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_quality_bounds(spark):
    rows = QUERIES["text_quality_score"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 <= r.distinct_ratio <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0


def test_langid_covers_all_docs(spark):
    df = QUERIES["text_langid"](spark, SF_SMOKE)
    n_docs = df.count()
    assert n_docs > 0
    assert df.filter("lang_pred IS NULL").count() == 0
