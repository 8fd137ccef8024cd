from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.relational import (
    RELATIONAL_QUERIES,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in RELATIONAL_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)
