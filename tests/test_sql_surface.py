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


def test_managed_catalog_tables_round_trip(spark):
    """The reference's named-blob namespace, reborn as MANAGED tables:
    saveAsTable persists through the session catalog, spark.table reads
    it back, append adds rows, dropping removes it."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    name = "catalog_demo_orders"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    orders = load_table(spark, SF_SMOKE, "orders").limit(100)
    orders.write.saveAsTable(name)
    try:
        assert spark.table(name).count() == 100
        assert name in [t.name for t in spark.catalog.listTables()]
        orders.limit(10).write.mode("append").saveAsTable(name)
        assert spark.table(name).count() == 110
        # catalog predicates still push down
        plan = (
            spark.table(name)
            .filter(F.col("o_orderkey") == 1)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "EqualTo(o_orderkey,1)" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert name not in [t.name for t in spark.catalog.listTables()]
