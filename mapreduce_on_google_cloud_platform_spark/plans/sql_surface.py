"""The SQL-text entry point: one ANSI SQL string, two engines.

The reference has no SQL at all (SURVEY.md §2 "explicitly absent" -- its
only plan IR is five URL segments).  Spark gives a full SQL front end
for free; this module declares queries whose *oracle string itself* is
executed by ``spark.sql`` over catalog-registered views.  The driver
then runs the identical text on DuckDB -- so the check is not merely
"the DataFrame plan matches the SQL" but "both engines agree on the
same ANSI text", pinning Catalyst's parser/analyzer against an
independent implementation.

Only dialect-portable oracles qualify (ANSI joins, CAST, TIMESTAMP
literals, IN/HAVING subqueries); queries relying on DuckDB-specific
functions (datediff('day', ...), list lambdas, UNPIVOT) stay
DataFrame-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import pipeline, relational, statistics
from ..sources import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (the reference's
    named-blob namespace, reborn as the session catalog)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return fn


# (name, shared SQL text) -- each runs verbatim on Spark AND DuckDB.
_PORTABLE: list[tuple[str, str]] = [
    ("q1_pricing_summary_sql", relational.Q1_ORACLE),
    ("q6_forecast_revenue_sql", relational.Q6_ORACLE),
    ("q10_returned_items_sql", relational.Q10_ORACLE),
    ("q15_top_supplier_sql", relational.Q15_ORACLE),
    ("q16_supplier_diversity_sql", relational.Q16_ORACLE),
    ("q20_heavy_shippers_sql", relational.Q20_ORACLE),
    ("q22_idle_rich_customers_sql", relational.Q22_ORACLE),
    ("loyal_customers_division_sql", relational.DIVISION_ORACLE),
    ("k_anonymity_report_sql", pipeline.K_ANON_ORACLE),
    ("incremental_segment_revenue_sql", pipeline.INCR_ORACLE),
    ("histogram_event_values_sql", statistics.HISTOGRAM_ORACLE),
    ("value_decile_features_sql", statistics.VALUE_DECILE_ORACLE),
    # round 6: portable via the STRING type alias (DuckDB accepts STRING
    # for VARCHAR; Spark rejects bare VARCHAR -- the one dialect seam)
    ("table_stats_profile_sql", statistics.TABLE_STATS_ORACLE),
    ("source_frequency_cap_sql", pipeline.SOURCE_CAP_ORACLE),
]

SQL_SURFACE_QUERIES: list[tuple[str, object, str]] = [
    (name, _sql_query(sql), sql) for name, sql in _PORTABLE
]
