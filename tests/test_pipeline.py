from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle


def test_oracle_parity_smoke(spark):
    assert_matches_oracle(
        QUERIES["curation_pipeline"](spark, SF_SMOKE),
        ORACLES["curation_pipeline"],
        SF_SMOKE,
    )


@pytest.mark.slow
def test_oracle_parity_sf001(spark):
    assert_matches_oracle(
        QUERIES["curation_pipeline"](spark, SF_ORACLE),
        ORACLES["curation_pipeline"],
        SF_ORACLE,
    )


def test_funnel_monotone(spark):
    rows = QUERIES["curation_pipeline"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_docs_in >= r.n_pass >= r.n_kept >= 0
        assert 0.0 <= r.kept_ratio <= 1.0
        if r.n_kept > 0:
            assert r.tokens_kept > 0
