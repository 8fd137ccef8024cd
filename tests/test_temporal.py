from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.temporal import TEMPORAL_QUERIES
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in TEMPORAL_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_asof_gap_nonnegative_and_left(spark):
    rows = QUERIES["asof_join_purchase_view"](spark, SF_SMOKE).collect()
    assert rows
    n_matched = 0
    for r in rows:
        if r.view_event_id is not None:
            assert r.gap_us >= 0
            assert r.view_ts <= r.ts
            n_matched += 1
        else:
            assert r.view_ts is None and r.gap_us is None
    assert n_matched > 0  # data has prior views for at least some purchases


def test_asof_one_row_per_purchase(spark):
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    df = QUERIES["asof_join_purchase_view"](spark, SF_SMOKE)
    n_purchases = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert df.count() == n_purchases
    assert df.select("event_id").distinct().count() == n_purchases


def test_range_join_counts_bounded_by_total_views(spark):
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["range_join_purchase_views_1h"](spark, SF_SMOKE).collect()
    assert rows
    views_per_user = {
        r.user_id: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert 0 <= r.n_views_1h <= views_per_user.get(r.user_id, 0)
        if r.n_views_1h == 0:
            assert r.view_value_1h is None
