"""Temporal join operators: as-of join and range (interval) join.

The reference has no joins at all (SURVEY.md §2 "explicitly absent");
these are north-star additions every event/feature pipeline needs and
Spark lacks as built-ins.  Both are expressed as compositions of existing
DataFrame ops (SURVEY.md §7: composition first, Pandas UDF only if
semantics demand it -- they don't here).

* ``asof_join_purchase_view`` -- for every purchase event, the latest
  view event by the same user at-or-before the purchase.  Implemented as
  the MERGE formulation: union both streams, one window sort per user,
  ``last(..., ignorenulls)`` carries the most recent view forward.  ONE
  shuffle on user_id and no join node at all -- at 100 TB this beats any
  join-then-rank plan because each side is scanned once and never
  replicated.  DuckDB's native ASOF JOIN is the oracle.

* ``range_join_purchase_views_1h`` -- per purchase, how many views (and
  their value sum) the same user produced in the preceding hour.  With an
  equi-key (user_id) plus a band predicate this is a plain sort-merge
  join + band filter; Catalyst keeps the band condition out of the join
  keys and applies it post-match, which is the right plan shape.  A
  band join WITHOUT an equi-key would instead need time-bucket salting
  (join on floor(ts/1h) +/- 1 bucket) -- documented here as the scale
  path, not needed while user_id exists.

Determinism: (user_id, ts) is unique in the events data (verified at
every SF), so "latest at-or-before" has a single well-defined witness and
both engines agree without a tie-break rule.  Gap/window arithmetic is
integer microseconds; value sums go through DECIMAL(18,2) (exact under
any partitioning) and surface as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest view at-or-before each purchase, per user (as-of LEFT join)."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
        F.lit(None).cast("bigint").alias("p_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("bigint").alias("v_id"),
        F.lit(None).cast("timestamp").alias("v_ts"),
        F.col("event_id").alias("p_id"),
    )
    # Views order before purchases at equal ts => the inclusive (<=) bound.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).select(
        "*",
        F.last("v_id", ignorenulls=True).over(w).alias("view_event_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
    )
    return merged.filter(F.col("is_probe") == 1).select(
        F.col("p_id").alias("event_id"),
        "user_id",
        "ts",
        "view_event_id",
        "view_ts",
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


ASOF_ORACLE = """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.event_id AS view_event_id,
           v.ts AS view_ts,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def range_join_purchase_views_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: count + value sum of same-user views in the prior hour."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
        F.col("value").alias("v_value"),
    )
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("ts"))
    )
    return (
        p.join(v, cond, "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(
            F.count("v_id").alias("n_views_1h"),
            F.sum(F.col("v_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("view_value_1h"),
        )
    )


RANGE_JOIN_ORACLE = """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id AS v_user, ts AS v_ts, event_id AS v_id, value AS v_value
        FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts,
           count(v.v_id) AS n_views_1h,
           CAST(sum(CAST(v.v_value AS DECIMAL(18,2))) AS DOUBLE) AS view_value_1h
    FROM p LEFT JOIN v
      ON p.user_id = v.v_user
     AND v.v_ts >= p.ts - INTERVAL 1 HOUR
     AND v.v_ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
"""


TEMPORAL_QUERIES: list[tuple[str, object, str | None]] = [
    ("asof_join_purchase_view", asof_join_purchase_view, ASOF_ORACLE),
    ("range_join_purchase_views_1h", range_join_purchase_views_1h, RANGE_JOIN_ORACLE),
]
