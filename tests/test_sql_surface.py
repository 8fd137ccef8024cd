"""SQL-text surface: the same ANSI string must agree across engines."""

from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES
from mapreduce_on_google_cloud_platform_spark.plans.sql_surface import (
    SQL_SURFACE_QUERIES,
)

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in SQL_SURFACE_QUERIES]


def test_sql_text_is_shared_verbatim():
    """The declared oracle IS the executed Spark SQL text -- the whole
    point of the surface; a drift between them would silently weaken the
    check back to 'plan matches SQL'."""
    for name, _, oracle in SQL_SURFACE_QUERIES:
        assert ORACLES[name] == oracle


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)
