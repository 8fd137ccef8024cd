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


def asof_forward_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: the earliest view strictly AFTER each purchase --
    the other direction of the as-of pair (feature pipelines need both:
    backward for "state at event time", forward for "next outcome").
    Same MERGE formulation, scanned in descending time; at equal ts the
    probe sorts FIRST so a same-timestamp view is excluded (strict >)."""
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
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_probe").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).select(
        "*",
        F.last("v_id", ignorenulls=True).over(w).alias("next_view_event_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("next_view_ts"),
    )
    return merged.filter(F.col("is_probe") == 1).select(
        F.col("p_id").alias("event_id"),
        "user_id",
        "ts",
        "next_view_event_id",
        "next_view_ts",
        (F.unix_micros("next_view_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


ASOF_FORWARD_ORACLE = """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.event_id AS next_view_event_id,
           v.ts AS next_view_ts,
           epoch_us(v.ts) - epoch_us(p.ts) AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND v.ts > p.ts
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


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the event stream onto an hourly grid per event type:
    hours with no events appear with ``n_events = 0`` and a NULL hourly
    value, and ``filled_value`` carries the last observed hourly sum
    forward (the resample + ffill every time-series feature pipeline
    needs).

    Plan shape: one aggregation of the raw stream to (type, hour), then a
    generated spine — ``sequence()`` over the global [min, max] hour
    crossed with the distinct types — LEFT-joins the aggregate.  The
    spine's size is types x hours regardless of event volume, so at
    100 TB it is negligible next to the stream and broadcast-joins
    against the hourly aggregate; the only full-data pass is the first
    partial-aggregated groupBy.  The forward fill is one window per type
    over the *spine-sized* table, never over raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hr"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("hr_value"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "hr_value",
        F.last("hr_value", ignorenulls=True).over(w).alias("filled_value"),
    )


GAP_FILL_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hr_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.hr
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        ) g
    )
    SELECT s.event_type, s.hr,
           coalesce(h.n_events, 0) AS n_events,
           h.hr_value AS hr_value,
           last_value(h.hr_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM spine s
    LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hr = h.hr
"""


def lag_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting feature matrix on the dense hourly grid: per
    (event_type, hour) the hourly value plus lag-1h, lag-2h, lag-24h and
    the trailing 3-hour mean -- the standard supervised-learning layout
    for time series.  Lags are computed on the gap-filled spine (missing
    hours are exact zero), so a lag crosses gaps correctly instead of
    skipping to the previous OBSERVED row.  The sums stay decimal until
    each surfaced column; the 3-hour mean is one double division.  Same
    scale shape as events_gap_fill: lags ride a window over the
    spine-sized table, never over raw events."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hr"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("event_type", "hr")
        .agg(F.sum("v").alias("v_dec"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    dense = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce(F.col("v_dec"), F.lit(0).cast("decimal(18,2)")).alias("v_dec"),
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    l1 = F.lag("v_dec", 1).over(w)
    l2 = F.lag("v_dec", 2).over(w)
    l24 = F.lag("v_dec", 24).over(w)
    return dense.select(
        "event_type",
        "hr",
        F.col("v_dec").cast("double").alias("v"),
        l1.cast("double").alias("lag_1h"),
        l2.cast("double").alias("lag_2h"),
        l24.cast("double").alias("lag_24h"),
        ((F.col("v_dec") + l1 + l2).cast("double") / F.lit(3.0)).alias("ma_3h"),
    ).orderBy("event_type", "hr")


LAG_FEATURES_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               sum(CAST(value AS DECIMAL(18,2))) AS v_dec
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT t.event_type, g.hr
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        ) g
    ),
    dense AS (
        SELECT s.event_type, s.hr,
               coalesce(h.v_dec, CAST(0 AS DECIMAL(18,2))) AS v_dec
        FROM spine s
        LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hr = h.hr
    )
    SELECT event_type, hr,
           CAST(v_dec AS DOUBLE) AS v,
           CAST(lag(v_dec, 1) OVER w AS DOUBLE) AS lag_1h,
           CAST(lag(v_dec, 2) OVER w AS DOUBLE) AS lag_2h,
           CAST(lag(v_dec, 24) OVER w AS DOUBLE) AS lag_24h,
           CAST(v_dec + lag(v_dec, 1) OVER w + lag(v_dec, 2) OVER w AS DOUBLE)
               / 3.0 AS ma_3h
    FROM dense
    WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ORDER BY event_type, hr
"""


def scd2_user_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each event becomes a
    validity interval ``[valid_from, valid_to)`` per user, closed by the
    user's next event (``lead``), with the latest event left open
    (``is_current``).  This is the standard change-stream -> history-table
    transform; one shuffle on user_id, one sort, every interval emitted
    by a single window pass (no self-join against "the next row")."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        (F.unix_micros(nxt) - F.unix_micros("ts")).alias("duration_us"),
    )


SCD2_ORACLE = """
    SELECT user_id, event_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS duration_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# Exponentially time-decayed user value: sum of event values weighted by
# exp(-age/tau) relative to the corpus watermark (global max ts) -- the
# classic recency-weighted engagement feature.  Age is exact integer
# microseconds (difference of epoch_us values against a broadcast scalar
# watermark); each weighted term value*exp(-age_us/TAU_US) is one
# identical double expression tree on both engines, cast to
# DECIMAL(25,12) and summed exactly, so partitioning cannot perturb the
# result.  Scale: one broadcast scalar + one combinable shuffle on
# user_id; no windows.
# ---------------------------------------------------------------------------

DECAY_TAU_US = 7 * 86400 * 1_000_000  # one-week e-folding time


def time_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import dec

    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(F.max(F.unix_micros("ts")).alias("wm_us"))
    age_us = F.col("wm_us") - F.unix_micros(F.col("ts"))
    term = (
        F.col("value") * F.exp(-(age_us.cast("double")) / F.lit(float(DECAY_TAU_US)))
    ).cast("decimal(25,12)")
    return (
        ev.crossJoin(F.broadcast(wm))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.round(F.sum(term).cast("double"), 6).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


DECAYED_VALUE_ORACLE = f"""
    WITH wm AS (SELECT max(epoch_us(ts)) AS wm_us FROM events)
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           round(CAST(sum(CAST(
               value * exp(-(CAST(wm_us - epoch_us(ts) AS DOUBLE))
                           / {float(DECAY_TAU_US)})
           AS DECIMAL(25,12))) AS DOUBLE), 6) AS decayed_value
    FROM events, wm
    GROUP BY user_id
    ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Hour-of-week seasonality profile: traffic + value by (day-of-week,
# hour-of-day) -- the load-shape aggregate behind capacity planning and
# anomaly baselines.  Both coordinates come from pure UTC epoch
# arithmetic (1970-01-01 was a Thursday: dow = (days_since_epoch + 4)
# mod 7, Sunday = 0), NOT from calendar functions, so neither engine's
# session timezone nor locale-dependent week-start can skew a bucket.
# share_of_total divides each cell's exact integer count by the exact
# corpus total (a broadcast one-row scalar).  Scale: one combinable
# shuffle to 168 groups; partial aggregation reduces every partition to
# <=168 rows before the exchange.
# ---------------------------------------------------------------------------


def hour_of_week_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import dec

    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    keyed = ev.select(
        ((F.floor(epoch / 86400) + 4) % 7).cast("int").alias("dow"),
        (F.floor(epoch / 3600) % 24).cast("int").alias("hod"),
        "value",
    )
    total = keyed.agg(F.count(F.lit(1)).alias("total_n"))
    return (
        keyed.groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hod",
            "n_events",
            "sum_value",
            F.round(
                F.col("n_events").cast("double") / F.col("total_n"), 6
            ).alias("share_of_total"),
        )
        .orderBy("dow", "hod")
    )


HOUR_OF_WEEK_ORACLE = """
    WITH keyed AS (
        SELECT CAST((floor(epoch(ts) / 86400) + 4) % 7 AS INTEGER) AS dow,
               CAST(floor(epoch(ts) / 3600) % 24 AS INTEGER) AS hod,
               value
        FROM events
    ),
    total AS (SELECT count(*) AS total_n FROM keyed)
    SELECT dow, hod,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           round(CAST(count(*) AS DOUBLE) / any_value(total_n), 6)
               AS share_of_total
    FROM keyed, total
    GROUP BY dow, hod
    ORDER BY dow, hod
"""


# ---------------------------------------------------------------------------
# Inter-arrival time profile: the distribution of per-user gaps between
# consecutive events, bucketed into power-of-two microsecond ranges --
# the diagnostic that picks a sessionization timeout (the valley
# between the intra-session and inter-session modes) and sizes
# streaming state retention.  The lag() window is PARTITIONED by
# user_id (parallel); ties on ts are broken by event_id so the gap
# sequence is deterministic; the bucket index is the integer
# binary-digit count of (gap_us + 1), exact on both engines (no float
# log).  One combinable shuffle onto < 64 bucket groups + a broadcast
# scalar total.
# ---------------------------------------------------------------------------


def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = (
        ev.select(
            "user_id", (us - F.lag(us).over(w)).alias("gap_us")
        )
        .filter(F.col("gap_us").isNotNull())
    )
    bucket = (F.length(F.bin(F.col("gap_us") + 1)) - 1).cast("int")
    keyed = gaps.select(bucket.alias("bucket"), "gap_us")
    total = keyed.agg(F.count(F.lit(1)).alias("total_n"))
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_gaps",
            "min_gap_us",
            "max_gap_us",
            F.round(F.col("n_gaps").cast("double") / F.col("total_n"), 6).alias(
                "share"
            ),
        )
        .orderBy("bucket")
    )


INTERARRIVAL_ORACLE = """
    WITH gaps AS (
        SELECT CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                   AS gap_us
        FROM events
    ),
    keyed AS (
        SELECT CAST(length(printf('%b', gap_us + 1)) - 1 AS INTEGER)
                   AS bucket,
               gap_us
        FROM gaps WHERE gap_us IS NOT NULL
    ),
    total AS (SELECT count(*) AS total_n FROM keyed)
    SELECT bucket,
           count(*) AS n_gaps,
           min(gap_us) AS min_gap_us,
           max(gap_us) AS max_gap_us,
           round(CAST(count(*) AS DOUBLE) / any_value(total_n), 6) AS share
    FROM keyed, total
    GROUP BY bucket
    ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Marketing-style conversion attribution: for every purchase, the FIRST
# and LAST qualifying touch (click/view) by the same user inside a 24h
# lookback window, plus touch count and time-to-convert -- the
# first-touch/last-touch report every growth pipeline runs.  The touch
# candidates come from a banded range join that KEEPS the user_id
# equi-key (hash join + band residual, the range_join_purchase_views_1h
# pattern -- never a nested loop), and first/last are combinable
# min/max(struct(ts, event_id, ...)) aggregates with the unique
# event_id as a total-order tie-break, so no window touches the fact
# stream and ties cannot flap.  Unattributed purchases (no touch in the
# window) survive via a left join with n_touches = 0.
# ---------------------------------------------------------------------------

ATTRIB_LOOKBACK_SEC = 24 * 3600
ATTRIB_TOUCH_TYPES = ("click", "view")


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p_us")
    )
    t = ev.filter(F.col("event_type").isin(*ATTRIB_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    lb_us = ATTRIB_LOOKBACK_SEC * 1_000_000
    joined = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(lb_us)),
    )
    touch = F.struct(
        F.col("t_us").alias("us"),
        F.col("t_id").alias("id"),
        F.col("t_type").alias("ch"),
    )
    attributed = joined.groupBy("event_id", "user_id", "p_us").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.min(touch).alias("ft"),
        F.max(touch).alias("lt"),
    )
    return (
        p.join(
            attributed.select(
                "event_id",
                "n_touches",
                F.col("ft.ch").alias("first_channel"),
                F.col("lt.ch").alias("last_channel"),
                F.col("lt.us").alias("lt_us"),
            ),
            "event_id",
            "left",
        )
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_touches", F.lit(0)).alias("n_touches"),
            "first_channel",
            "last_channel",
            F.expr("(p_us - lt_us) div 1000000").alias("secs_to_convert"),
        )
        .orderBy("event_id")
    )


ATTRIBUTION_ORACLE = f"""
    WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id AS t_user, event_id AS t_id,
               event_type AS t_type, epoch_us(ts) AS t_us
        FROM events
        WHERE event_type IN ('click', 'view')
    ),
    j AS (
        SELECT p.*, t_id, t_type, t_us,
               row_number() OVER (PARTITION BY event_id
                                  ORDER BY t_us ASC, t_id ASC) AS rf,
               row_number() OVER (PARTITION BY event_id
                                  ORDER BY t_us DESC, t_id DESC) AS rl,
               count(*) OVER (PARTITION BY event_id) AS n_touches
        FROM p JOIN t
          ON user_id = t_user
         AND t_us < p_us
         AND t_us >= p_us - {ATTRIB_LOOKBACK_SEC * 1_000_000}
    ),
    agg AS (
        SELECT event_id,
               any_value(n_touches) AS n_touches,
               max(CASE WHEN rf = 1 THEN t_type END) AS first_channel,
               max(CASE WHEN rl = 1 THEN t_type END) AS last_channel,
               max(CASE WHEN rl = 1 THEN t_us END) AS lt_us
        FROM j GROUP BY event_id
    )
    SELECT p.event_id, p.user_id,
           CAST(coalesce(agg.n_touches, 0) AS BIGINT) AS n_touches,
           first_channel, last_channel,
           CAST((p_us - lt_us) // 1000000 AS BIGINT) AS secs_to_convert
    FROM p LEFT JOIN agg USING (event_id)
    ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Seasonality-adjusted daily residuals: composes the hour-of-week
# baseline with per-day actuals -- a raw daily z-score flags every
# weekend as an anomaly; subtracting the (dow, hod) expectation first
# is the standard fix.  Each event's residual is value minus its cell's
# mean; the cell means are 168 numbers broadcast back to the stream.
#
# Determinism: the cell mean is ONE double division of exact aggregates
# (IEEE-identical on both engines); each per-event residual is a double
# subtraction immediately cast to DECIMAL(25,12) (the exp-decay
# discipline -- truncating below double precision so summation order
# cannot show), and the daily rollup sums those decimals exactly.
# Scale: two combinable aggregates (168 cells; one shuffle per level) +
# one broadcast join; no windows.
# ---------------------------------------------------------------------------


def seasonality_adjusted_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import dec

    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    keyed = ev.select(
        ((F.floor(epoch / 86400) + 4) % 7).cast("int").alias("dow"),
        (F.floor(epoch / 3600) % 24).cast("int").alias("hod"),
        F.floor(epoch / 86400).cast("bigint").alias("day"),
        "value",
    )
    cells = keyed.groupBy("dow", "hod").agg(
        (
            F.sum(dec("value")).cast("double") / F.count(F.lit(1))
        ).alias("cell_mean")
    )
    resid = (
        keyed.join(F.broadcast(cells), ["dow", "hod"])
        .select(
            "day",
            dec("value").alias("v"),
            (F.col("value").cast("double") - F.col("cell_mean"))
            .cast("decimal(25,12)")
            .alias("r"),
        )
    )
    return (
        resid.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("actual_value"),
            F.round(F.sum("r").cast("double"), 6).alias("residual"),
        )
        .select(
            "day",
            "n_events",
            "actual_value",
            "residual",
            F.round(
                F.col("residual") / (F.col("actual_value") - F.col("residual")),
                6,
            ).alias("residual_ratio"),
        )
        .orderBy("day")
    )


SEASONAL_RESIDUAL_ORACLE = """
    WITH keyed AS (
        SELECT CAST((floor(epoch(ts) / 86400) + 4) % 7 AS INTEGER) AS dow,
               CAST(floor(epoch(ts) / 3600) % 24 AS INTEGER) AS hod,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               value
        FROM events
    ),
    cells AS (
        SELECT dow, hod,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                   AS cell_mean
        FROM keyed GROUP BY dow, hod
    ),
    resid AS (
        SELECT day,
               CAST(value AS DECIMAL(18,2)) AS v,
               CAST(CAST(value AS DOUBLE) - cell_mean AS DECIMAL(25,12)) AS r
        FROM keyed JOIN cells USING (dow, hod)
    ),
    daily AS (
        SELECT day,
               count(*) AS n_events,
               CAST(sum(v) AS DOUBLE) AS actual_value,
               round(CAST(sum(r) AS DOUBLE), 6) AS residual
        FROM resid GROUP BY day
    )
    SELECT day, n_events, actual_value, residual,
           round(residual / (actual_value - residual), 6) AS residual_ratio
    FROM daily
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix: first-order Markov counts over each
# user's time-ordered event stream -- the behavioral-model input
# (next-action prediction, funnel leak detection: a heavy
# view->view self-loop with a thin view->purchase edge IS the leak).
# The consecutive pair comes from a user-PARTITIONED lag (parallel;
# ties broken by event_id as everywhere); the matrix is |types|^2
# cells, and each row's transition probability divides exact counts by
# the exact row total via one broadcast-joined division.
# ---------------------------------------------------------------------------


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    cells = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_totals = cells.groupBy("from_type").agg(
        F.sum("n").alias("row_total")
    )
    return (
        cells.join(F.broadcast(row_totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias(
                "p_transition"
            ),
        )
        .orderBy("from_type", "to_type")
    )


TRANSITION_MATRIX_ORACLE = """
    WITH pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS from_type,
               event_type AS to_type
        FROM events
    ),
    cells AS (
        SELECT from_type, to_type, count(*) AS n
        FROM pairs WHERE from_type IS NOT NULL
        GROUP BY 1, 2
    ),
    row_totals AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        FROM cells GROUP BY from_type
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE) / row_total, 6) AS p_transition
    FROM cells JOIN row_totals USING (from_type)
    ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# Session-timeout sensitivity curve: how many sessions the corpus
# splits into for a ladder of inactivity thresholds -- the table read
# NEXT TO interarrival_profile when choosing a sessionization timeout
# (sessions(T) = users + gaps exceeding T; the flattening point of the
# curve is the natural session boundary).  One pass over the per-user
# lag gaps: every threshold is a conditional sum in the same combinable
# aggregate; the single row explodes to one row per threshold.
# ---------------------------------------------------------------------------

SESSION_GAP_LADDER_SEC = (300, 900, 1800, 3600, 7200)


def session_timeout_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    aggs = [
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.when(F.col("gap_us").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_gaps"),
    ]
    for t in SESSION_GAP_LADDER_SEC:
        aggs.append(
            F.sum(
                F.when(F.col("gap_us") > t * 1_000_000, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"brk_{t}")
        )
    one = gaps.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("timeout_sec"),
                F.col(f"brk_{t}").alias("n_breaks"),
            )
            for t in SESSION_GAP_LADDER_SEC
        ]
    )
    return (
        one.select("n_users", "n_gaps", F.explode(rows).alias("r"))
        .select(
            F.col("r.timeout_sec").alias("timeout_sec"),
            (F.col("n_users") + F.col("r.n_breaks")).alias("n_sessions"),
            F.col("r.n_breaks").alias("n_breaks"),
            "n_users",
            F.round(
                (F.col("n_users") + F.col("r.n_breaks")).cast("double")
                / F.col("n_users"),
                6,
            ).alias("sessions_per_user"),
        )
        .orderBy("timeout_sec")
    )


def _session_curve_oracle() -> str:
    selects = "\n    UNION ALL\n".join(
        f"""    SELECT {t} AS timeout_sec,
           CAST(any_value(n_users)
                + sum(CASE WHEN gap_us > {t * 1_000_000} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN gap_us > {t * 1_000_000} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_breaks,
           CAST(any_value(n_users) AS BIGINT) AS n_users,
           round(CAST(any_value(n_users)
                      + sum(CASE WHEN gap_us > {t * 1_000_000} THEN 1 ELSE 0 END)
                      AS DOUBLE) / any_value(n_users), 6) AS sessions_per_user
    FROM gaps, u"""
        for t in SESSION_GAP_LADDER_SEC
    )
    return f"""
    WITH gaps AS (
        SELECT CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                   AS gap_us
        FROM events
    ),
    u AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
{selects}
    ORDER BY timeout_sec
"""


SESSION_CURVE_ORACLE = _session_curve_oracle()


# ---------------------------------------------------------------------------
# Out-of-order arrival profile -- the measurement that SIZES a streaming
# watermark instead of guessing it: treating event_id as the ingest
# (arrival) order, an event's lateness is how far behind its user's
# running event-time high-water mark it arrived.  The power-of-two
# lateness histogram (interarrival_profile's engine-portable
# bit-length bucket idiom -- no log2, which differs across engines)
# reads directly as "a watermark of 2^k microseconds would admit this
# share of events"; bucket -1 is the in-order mass.
#
# Scale: one per-user PARTITIONED running-max window over the arrival
# order, a combinable bucket groupBy (<= 64 buckets), one broadcast
# scalar total.  The same shape as interarrival_profile.
# ---------------------------------------------------------------------------


def event_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros("ts")
    late = ev.select((F.max(us).over(w) - us).alias("lateness_us"))
    bucket = (
        F.when(
            F.col("lateness_us").isNull() | (F.col("lateness_us") <= 0),
            F.lit(-1),
        )
        .otherwise(F.length(F.bin(F.col("lateness_us") + 1)) - 1)
        .cast("int")
    )
    keyed = late.select(bucket.alias("bucket"), "lateness_us")
    total = keyed.agg(F.count(F.lit(1)).alias("total_n"))
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("lateness_us").alias("min_lateness_us"),
            F.max("lateness_us").alias("max_lateness_us"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_events",
            "min_lateness_us",
            "max_lateness_us",
            F.round(
                F.col("n_events").cast("double") / F.col("total_n"), 6
            ).alias("share"),
        )
        .orderBy("bucket")
    )


DISORDER_ORACLE = """
    WITH late AS (
        SELECT CAST(max(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - epoch_us(ts) AS BIGINT) AS lateness_us
        FROM events
    ),
    keyed AS (
        SELECT CASE WHEN lateness_us IS NULL OR lateness_us <= 0 THEN -1
                    ELSE CAST(length(printf('%b', lateness_us + 1)) - 1
                              AS INTEGER)
               END AS bucket,
               lateness_us
        FROM late
    ),
    total AS (SELECT count(*) AS total_n FROM keyed)
    SELECT bucket,
           count(*) AS n_events,
           min(lateness_us) AS min_lateness_us,
           max(lateness_us) AS max_lateness_us,
           round(CAST(count(*) AS DOUBLE) / any_value(total_n), 6) AS share
    FROM keyed, total
    GROUP BY bucket
    ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Daily-profile similarity search -- distributed time-series similarity
# in the shape the OLAP literature studies it (distributed top-k series
# similarity; cf. the REPOSE/Odyssey line of work): per event type,
# find the K most similar pairs of days by exact squared distance
# between their 24-hour value profiles.  The operations analyst's
# "which past day did today behave like?" question.
#
# Exactness: profiles are 24 FLAT integer-cent columns (conditional
# decimal sums -- the flat-column discipline from SCALING.md, no
# arrays/HOFs in the join); the distance is sum_h (a_h - b_h)^2 lifted
# to decimal(38,0) (hourly cents at petabyte scale square past BIGINT),
# so ranking ties break on exact integers + (day_a, day_b) -- bit-stable
# on any engine/partitioning.  dist2_q is EMITTED as the canonical
# STRING of the exact integer: decimal outputs decay to float64 through
# the driver's pandas fetch of the DuckDB oracle (the r7+r8 red class),
# and at petabyte scale the value exceeds int64, so the string channel
# is the one representation that is exact on every path; the oracle's
# rmse double goes via VARCHAR->DOUBLE (DuckDB's direct
# DECIMAL->DOUBLE cast mis-rounds >= 2^63).  Hours/days come from epoch
# arithmetic (timezone-proof, same rule as hour_of_week_profile).
#
# Scale: the profile table is CALENDAR-bounded (types x days), tiny
# regardless of event volume; the pair space is a banded equi-join
# (same type, day gap <= SIM_BAND_DAYS) so it grows linearly in days,
# never days^2; the per-type top-K window runs over that bounded band.
# ---------------------------------------------------------------------------

SIM_TOPK = 5
SIM_BAND_DAYS = 28


def daily_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable import dec

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    keyed = ev.select(
        "event_type",
        us.alias("_us"),
        dec("value").alias("v"),
    ).select(
        "event_type",
        F.expr("_us div 86400000000").alias("day_idx"),
        F.expr("(_us div 3600000000) % 24").alias("hour"),
        "v",
    )
    profile = keyed.groupBy("event_type", "day_idx").agg(
        *[
            (
                F.sum(F.when(F.col("hour") == h, F.col("v")).otherwise(dec(F.lit(0))))
                * 100
            )
            .cast("bigint")
            .alias(f"h{h}")
            for h in range(24)
        ]
    )
    a = profile.alias("a")
    b = profile.alias("b")
    dist2 = None
    for h in range(24):
        d = (F.col(f"a.h{h}") - F.col(f"b.h{h}")).cast("decimal(19,0)")
        term = d * d
        dist2 = term if dist2 is None else dist2 + term
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day_idx") < F.col("b.day_idx"))
            & (F.col("b.day_idx") - F.col("a.day_idx") <= SIM_BAND_DAYS),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day_idx").alias("da"),
            F.col("b.day_idx").alias("db"),
            dist2.cast("decimal(38,0)").alias("dist2_q"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.asc("dist2_q"), F.asc("da"), F.asc("db")
    )
    return (
        pairs.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= SIM_TOPK)
        .select(
            "event_type",
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("da").cast("int")
            ).alias("day_a"),
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("db").cast("int")
            ).alias("day_b"),
            (F.col("db") - F.col("da")).cast("int").alias("gap_days"),
            # ranking above used the exact decimal; the EMITTED column is
            # its canonical string (exact on every fetch path, no int64
            # ceiling at petabyte scale)
            F.col("dist2_q").cast("string").alias("dist2_q"),
            F.col("sim_rank").cast("int").alias("sim_rank"),
            F.round(
                F.sqrt(F.col("dist2_q").cast("double") / 24.0) / 100.0, 6
            ).alias("hourly_rmse"),
        )
        .orderBy("event_type", "sim_rank")
    )


def _profile_similarity_oracle() -> str:
    hcols = ",\n               ".join(
        f"CAST(sum(CASE WHEN hour = {h} THEN v ELSE CAST(0 AS DECIMAL(18,2)) "
        f"END) * 100 AS BIGINT) AS h{h}"
        for h in range(24)
    )
    dterms = " + ".join(
        f"(CAST(a.h{h} - b.h{h} AS HUGEINT) * CAST(a.h{h} - b.h{h} AS HUGEINT))"
        for h in range(24)
    )
    return f"""
    WITH keyed AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day_idx,
               (epoch_us(ts) // 3600000000) % 24 AS hour,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
    ),
    profile AS (
        SELECT event_type, day_idx,
               {hcols}
        FROM keyed
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, a.day_idx AS da, b.day_idx AS db,
               CAST({dterms} AS DECIMAL(38,0)) AS dist2_q
        FROM profile a
        JOIN profile b
          ON a.event_type = b.event_type
         AND a.day_idx < b.day_idx
         AND b.day_idx - a.day_idx <= {SIM_BAND_DAYS}
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY dist2_q ASC, da ASC, db ASC
        ) AS sim_rank
        FROM pairs
    )
    SELECT event_type,
           DATE '1970-01-01' + CAST(da AS INTEGER) AS day_a,
           DATE '1970-01-01' + CAST(db AS INTEGER) AS day_b,
           CAST(db - da AS INTEGER) AS gap_days,
           CAST(dist2_q AS VARCHAR) AS dist2_q,
           CAST(sim_rank AS INTEGER) AS sim_rank,
           round(sqrt(CAST(CAST(dist2_q AS VARCHAR) AS DOUBLE) / 24.0)
                 / 100.0, 6) AS hourly_rmse
    FROM ranked
    WHERE sim_rank <= {SIM_TOPK}
    ORDER BY event_type, sim_rank
"""


PROFILE_SIMILARITY_ORACLE = _profile_similarity_oracle()


# ---------------------------------------------------------------------------
# New-vs-returning actives -- the first product-analytics split of any
# daily active report: per day, how many active users are seen for the
# FIRST time vs returning.  First-seen day is a per-user min (combinable
# aggregate, never a window over the event stream).
#
# Scale: distinct (user, day) pairs (two-phase distinct), one per-user
# min, one dimension-sized join back on user, one per-day rollup.  Days
# come from epoch arithmetic (timezone-proof).
# ---------------------------------------------------------------------------


def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
        )
        .distinct()
        .persist()  # consumed by first-seen AND the join probe
    )
    first = ud.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    return (
        ud.join(first, "user_id")
        .groupBy("day_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(
                F.when(F.col("day_idx") == F.col("first_day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_new"),
        )
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("day_idx").cast("int")
            ).alias("day"),
            "n_active",
            "n_new",
            (F.col("n_active") - F.col("n_new")).alias("n_returning"),
            F.round(
                F.col("n_new").cast("double") / F.col("n_active"), 6
            ).alias("new_share"),
        )
        .orderBy("day")
    )


NEW_RETURNING_ORACLE = """
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day_idx
        FROM events
    ),
    first AS (
        SELECT user_id, min(day_idx) AS first_day FROM ud GROUP BY user_id
    )
    SELECT DATE '1970-01-01' + CAST(day_idx AS INTEGER) AS day,
           count(*) AS n_active,
           CAST(sum(CASE WHEN day_idx = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(count(*) - sum(CASE WHEN day_idx = first_day THEN 1 ELSE 0
                END) AS BIGINT) AS n_returning,
           round(CAST(sum(CASE WHEN day_idx = first_day THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS new_share
    FROM ud JOIN first USING (user_id)
    GROUP BY day_idx
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# DAU / WAU stickiness -- the engagement ratio product teams track
# daily.  The scale hazard is the rolling 7-day DISTINCT: a window
# can't dedup users, and a (days x pairs) band join is quadratic-ish.
# Plan: EXPLODE each distinct (user, day) into the 7 report days it
# contributes to (a fixed 7x expansion of the deduped pair table, NOT
# of the event stream), then one two-phase distinct count per day --
# every stage map-side combinable, days bounded by the calendar.
# Report days are the observed activity days (inner join with DAU).
# ---------------------------------------------------------------------------


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
        )
        .distinct()
        .persist()  # consumed by the DAU rollup AND the 7x explode
    )
    dau = ud.groupBy("day_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day_idx"), F.col("day_idx") + 6)
        ).alias("day_idx"),
    )
    wau = contrib.groupBy("day_idx").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau7")
    )
    return (
        dau.join(wau, "day_idx")
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("day_idx").cast("int")
            ).alias("day"),
            "dau",
            "wau7",
            F.round(F.col("dau").cast("double") / F.col("wau7"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


DAU_WAU_ORACLE = """
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day_idx
        FROM events
    ),
    dau AS (
        SELECT day_idx, CAST(count(*) AS BIGINT) AS dau
        FROM ud GROUP BY day_idx
    ),
    contrib AS (
        SELECT DISTINCT user_id, day_idx + i AS day_idx
        FROM ud, unnest(range(0, 7)) t(i)
    ),
    wau AS (
        SELECT day_idx, CAST(count(*) AS BIGINT) AS wau7
        FROM contrib GROUP BY day_idx
    )
    SELECT DATE '1970-01-01' + CAST(dau.day_idx AS INTEGER) AS day,
           dau, wau7,
           round(CAST(dau AS DOUBLE) / wau7, 6) AS stickiness
    FROM dau JOIN wau USING (day_idx)
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# Conversion-latency histogram -- how long before a purchase was the
# user's last view?  The distribution that justifies (or refutes) the
# 24h attribution lookback and sizes the as-of join's effective band.
# Composes the audited as-of MERGE plan (zero join nodes, one exchange)
# with the interarrival power-of-two idiom; purchases with NO prior view
# land in the declared bucket -1 instead of silently dropping.  Scale:
# histogram over the as-of output is one combinable groupBy onto
# ~64 bucket rows; the broadcast total is a scalar.
# ---------------------------------------------------------------------------


def conversion_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    asof = asof_join_purchase_view(spark, sf_dir)
    bucket = (
        F.when(F.col("gap_us").isNull(), F.lit(-1))
        .otherwise(F.length(F.bin(F.col("gap_us") + 1)) - 1)
        .cast("int")
    )
    keyed = asof.select(bucket.alias("bucket"), "gap_us")
    total = keyed.agg(F.count(F.lit(1)).alias("total_n"))
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_purchases",
            "min_gap_us",
            "max_gap_us",
            F.round(
                F.col("n_purchases").cast("double") / F.col("total_n"), 6
            ).alias("share"),
        )
        .orderBy("bucket")
    )


CONVERSION_LATENCY_ORACLE = f"""
    WITH asof_pv AS ({ASOF_ORACLE}),
    keyed AS (
        SELECT CASE WHEN gap_us IS NULL THEN -1
                    ELSE CAST(length(printf('%b', gap_us + 1)) - 1 AS INTEGER)
               END AS bucket,
               gap_us
        FROM asof_pv
    ),
    total AS (SELECT count(*) AS total_n FROM keyed)
    SELECT bucket,
           count(*) AS n_purchases,
           min(gap_us) AS min_gap_us,
           max(gap_us) AS max_gap_us,
           round(CAST(count(*) AS DOUBLE) / any_value(total_n), 6) AS share
    FROM keyed, total
    GROUP BY bucket
    ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Session-length histogram at the declared 30-minute timeout --
# session_timeout_curve picks the timeout; this reports what the chosen
# sessions LOOK like: a power-of-two histogram of events-per-session
# with each class's share and exact mean duration (the session-depth
# distribution behind engagement metrics and sequence-length budgets).
# Shares the batch sessionization kernel's shape (streaming/windows.py
# SESSION_GAP_US): per-user lag + cumulative break flags -- windows
# bounded by a user's own activity, never the corpus.  The histogram
# reduces sessions map-side onto ~32 bucket rows; mean duration is ONE
# double division of exact integer sums.
# ---------------------------------------------------------------------------


def session_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import SESSION_GAP_US

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            (us - F.lag(us).over(w)) > SESSION_GAP_US, 1
        ).otherwise(0).alias("brk"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.select(
        "user_id",
        "us",
        F.sum("brk").over(w2).alias("session_no"),
    ).groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
    keyed = sess.select(
        (F.length(F.bin(F.col("n_events"))) - 1).cast("int").alias("bucket"),
        "n_events",
        "duration_us",
    )
    tot = keyed.agg(F.count(F.lit(1)).cast("bigint").alias("total_sessions"))
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.sum("duration_us").cast("bigint").alias("sum_duration_us"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_sessions",
            "min_events",
            "max_events",
            "total_events",
            F.round(
                F.col("n_sessions").cast("double") / F.col("total_sessions"), 6
            ).alias("session_share"),
            F.round(
                F.col("sum_duration_us").cast("double")
                / (F.col("n_sessions") * F.lit(1_000_000)),
                6,
            ).alias("avg_duration_sec"),
        )
        .orderBy("bucket")
    )


def _session_length_oracle() -> str:
    from ..streaming.windows import SESSION_GAP_US

    return f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    sess AS (
        SELECT user_id, session_no,
               CAST(count(*) AS BIGINT) AS n_events,
               max(us) - min(us) AS duration_us
        FROM (
            SELECT user_id, us,
                   sum(brk) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS session_no
            FROM flagged
        )
        GROUP BY user_id, session_no
    ),
    keyed AS (
        SELECT CAST(length(printf('%b', n_events)) - 1 AS INTEGER) AS bucket,
               n_events, duration_us
        FROM sess
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_sessions FROM keyed)
    SELECT bucket,
           count(*) AS n_sessions,
           min(n_events) AS min_events,
           max(n_events) AS max_events,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           round(CAST(count(*) AS DOUBLE) / any_value(total_sessions), 6)
               AS session_share,
           round(CAST(sum(duration_us) AS DOUBLE) / (count(*) * 1000000), 6)
               AS avg_duration_sec
    FROM keyed, tot
    GROUP BY bucket
    ORDER BY bucket
"""


SESSION_LENGTH_ORACLE = _session_length_oracle()


# ---------------------------------------------------------------------------
# Holt linear (double exponential) smoothing -- the first FORECAST in
# the temporal family: seasonality_adjusted_daily and theil_sen explain
# the past; capacity planning needs level + trend projected one step
# ahead, with the in-sample one-step error reported honestly next to it.
#
# Smoothing is inherently sequential (state_t depends on state_{t-1}),
# which is exactly what the ordered-fold idiom is for: the per-type
# daily series is calendar-BOUNDED, so it collects into one
# date-sorted array and the recurrence runs as a JVM higher-order fold
# (F.aggregate) -- the unigram-Viterbi discipline.  The DuckDB twin is
# the identical list_reduce over the identical array with every
# constant written as a DOUBLE literal (0.5e0, not 0.5 -- DuckDB parses
# bare decimals as DECIMAL and the whole fold silently changes type),
# so both engines execute the same IEEE op sequence and the final
# state is bit-equal.  Series shorter than 2 days emit NULLs.
#
#     l' = A v + (1-A)(l + t);  t' = B (l' - l) + (1-B) t
#     sse' = sse + (v - (l + t))^2        (one-step-ahead error)
#
# Scale shape: one combinable daily rollup, one combinable
# collect_list per type (array bounded by the calendar), zero windows,
# zero joins.  Output: one row per event type.
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def holt_linear_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("x"))
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs")
    )
    A, B = HOLT_ALPHA, HOLT_BETA
    xs = F.col("xs")
    n = F.size(xs)
    init = F.struct(
        F.element_at(xs, 1).alias("l"),
        (F.element_at(xs, 2) - F.element_at(xs, 1)).alias("t"),
        F.lit(0.0).alias("e"),
    )

    def _step(acc, v):
        lp = F.lit(A) * v + F.lit(1 - A) * (acc["l"] + acc["t"])
        return F.struct(
            lp.alias("l"),
            (F.lit(B) * (lp - acc["l"]) + F.lit(1 - B) * acc["t"]).alias("t"),
            (
                acc["e"]
                + (v - (acc["l"] + acc["t"])) * (v - (acc["l"] + acc["t"]))
            ).alias("e"),
        )

    folded = F.aggregate(
        F.slice(xs, 3, F.greatest(n - 2, F.lit(0))), init, _step
    )
    ok = n >= 2
    return (
        arr.select(
            "event_type",
            n.cast("bigint").alias("n_days"),
            F.when(ok, folded["l"]).alias("level"),
            F.when(ok, folded["t"]).alias("trend"),
            F.when(ok, folded["l"] + folded["t"]).alias("forecast_next"),
            F.when(n > 2, F.sqrt(folded["e"] / (n - 2).cast("double"))).alias(
                "one_step_rmse"
            ),
        )
        .orderBy("event_type")
    )


HOLT_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(
                   list_sort(list({{'day': day, 'x': x}})),
                   s -> CAST(s.x AS DOUBLE)) AS xs
        FROM daily GROUP BY event_type
    ),
    -- state rides a DOUBLE[3] = [level, trend, sse], NOT a struct:
    -- DuckDB evaluates a struct-pack lambda's fields sequentially INTO
    -- the accumulator slot, so a later field reading acc.l observes the
    -- freshly-written new level (measured: the fold silently computes a
    -- different recurrence).  List construction evaluates all elements
    -- from the pre-update accumulator -- the portable form.
    folded AS (
        SELECT event_type, len(xs) AS n,
               list_reduce(
                   list_prepend(
                       [xs[1], xs[2] - xs[1], 0.0e0],
                       list_transform(xs[3:], v -> [v, 0.0e0, 0.0e0])),
                   (acc, v) -> [
                       {HOLT_ALPHA}e0 * v[1]
                           + {1 - HOLT_ALPHA}e0 * (acc[1] + acc[2]),
                       {HOLT_BETA}e0 * (({HOLT_ALPHA}e0 * v[1]
                                      + {1 - HOLT_ALPHA}e0
                                      * (acc[1] + acc[2])) - acc[1])
                           + {1 - HOLT_BETA}e0 * acc[2],
                       acc[3] + (v[1] - (acc[1] + acc[2]))
                              * (v[1] - (acc[1] + acc[2]))]) AS st
        FROM arr
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CASE WHEN n >= 2 THEN st[1] END AS level,
           CASE WHEN n >= 2 THEN st[2] END AS trend,
           CASE WHEN n >= 2 THEN st[1] + st[2] END AS forecast_next,
           CASE WHEN n > 2
                THEN sqrt(st[3] / CAST(n - 2 AS DOUBLE)) END AS one_step_rmse
    FROM folded
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# holt_winters_seasonal: additive Holt-Winters (Winters 1960) with the
# weekly season -- the third rung of the smoothing ladder (EWMA level,
# Holt level+trend, HW level+trend+season).  hour_of_week_profile and
# seasonality_adjusted_daily PROVE the weekly cycle exists; this is
# the forecaster that exploits it:
#
#     l' = A (v - s_idx) + (1-A)(l + t)
#     t' = B (l' - l) + (1-B) t
#     s_idx' = G (v - l') + (1-G) s_idx        (idx = (pos-1) mod 7)
#
# Init: l0 = mean(week 1), t0 = (mean(week 2) - mean(week 1))/7,
# s_i = x_i - l0; the fold runs from position 8.  Same ordered-fold
# discipline as holt_linear_smooth: the per-type daily series is
# calendar-bounded, the recurrence is a JVM higher-order fold over
# (value, position) pairs, and the DuckDB twin is the IDENTICAL
# list_reduce over a flat DOUBLE[10] state (the struct-state aliasing
# hazard documented at HOLT_ORACLE applies; the seasonal slot update
# is a per-slot CASE on (pos-1) mod 7 in both engines, so the IEEE op
# sequence is token-identical).  Series shorter than two full seasons
# (n < 14) emit NULLs.  Scale shape: one combinable daily rollup, one
# bounded per-type array, zero windows, zero joins.
# ---------------------------------------------------------------------------

HW_ALPHA = 0.5
HW_BETA = 0.3
HW_GAMMA = 0.3
HW_M = 7


def holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("x"))
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda st: st["x"].cast("double"),
        ).alias("xs")
    )
    A, B, G, M = HW_ALPHA, HW_BETA, HW_GAMMA, HW_M
    xs = F.col("xs")
    n = F.size(xs)
    mean1 = F.aggregate(
        F.slice(xs, 1, M), F.lit(0.0), lambda a, v: a + v
    ) / F.lit(float(M))
    mean2 = F.aggregate(
        F.slice(xs, M + 1, M), F.lit(0.0), lambda a, v: a + v
    ) / F.lit(float(M))
    init_fields = [mean1.alias("l"), ((mean2 - mean1) / F.lit(float(M))).alias("t")]
    for i in range(1, M + 1):
        init_fields.append((F.element_at(xs, i) - mean1).alias(f"s{i}"))
    init_fields.append(F.lit(0.0).alias("e"))
    init = F.struct(*init_fields)
    tail = F.transform(
        F.slice(xs, M + 1, F.greatest(n - M, F.lit(0))),
        lambda v, i: F.struct(
            v.alias("v"), (i + M + 1).cast("bigint").alias("p")
        ),
    )

    def _step(acc, sv):
        v, pos = sv["v"], sv["p"]
        m = (pos - 1) % M  # 0..6
        sold = F.when(m == 0, acc["s1"])
        for i in range(2, M + 1):
            sold = sold.when(m == i - 1, acc[f"s{i}"])
        sold = sold.otherwise(acc[f"s{M}"])
        fc = acc["l"] + acc["t"] + sold
        lp = F.lit(A) * (v - sold) + F.lit(1 - A) * (acc["l"] + acc["t"])
        fields = [
            lp.alias("l"),
            (F.lit(B) * (lp - acc["l"]) + F.lit(1 - B) * acc["t"]).alias("t"),
        ]
        for i in range(1, M + 1):
            fields.append(
                F.when(
                    m == i - 1,
                    F.lit(G) * (v - lp) + F.lit(1 - G) * acc[f"s{i}"],
                )
                .otherwise(acc[f"s{i}"])
                .alias(f"s{i}")
            )
        fields.append((acc["e"] + (v - fc) * (v - fc)).alias("e"))
        return F.struct(*fields)

    folded = F.aggregate(tail, init, _step)
    ok = n >= 2 * M
    nm = (n % M).cast("bigint")  # next position n+1 -> slot (n % M) + 1
    season_next = F.when(nm == 0, folded["s1"])
    for i in range(2, M + 1):
        season_next = season_next.when(nm == i - 1, folded[f"s{i}"])
    season_next = season_next.otherwise(folded[f"s{M}"])
    return (
        arr.select(
            "event_type",
            n.cast("bigint").alias("n_days"),
            F.when(ok, folded["l"]).alias("level"),
            F.when(ok, folded["t"]).alias("trend"),
            F.when(ok, season_next).alias("season_next"),
            F.when(ok, folded["l"] + folded["t"] + season_next).alias(
                "forecast_next"
            ),
            F.when(
                ok, F.sqrt(folded["e"] / (n - M).cast("double"))
            ).alias("one_step_rmse"),
        )
        .orderBy("event_type")
    )


def _hw_oracle() -> str:
    A, B, G, M = HW_ALPHA, HW_BETA, HW_GAMMA, HW_M
    # state DOUBLE[10] = [l, t, s1..s7, e]; input [v, pos]
    lp = (
        f"{A}e0 * (v[1] - ({{sold}})) + {1 - A}e0 * (acc[1] + acc[2])"
    )
    sold = (
        "CASE "
        + " ".join(
            f"WHEN (CAST(v[2] AS BIGINT) - 1) % {M} = {i - 1}"
            f" THEN acc[{i + 2}]"
            for i in range(1, M + 1)
        )
        + f" ELSE acc[{M + 2}] END"
    )
    lp_full = lp.format(sold=sold)
    slots = []
    for i in range(1, M + 1):
        slots.append(
            f"CASE WHEN (CAST(v[2] AS BIGINT) - 1) % {M} = {i - 1}"
            f" THEN {G}e0 * (v[1] - ({lp_full})) + {1 - G}e0 * acc[{i + 2}]"
            f" ELSE acc[{i + 2}] END"
        )
    init_s = ", ".join(
        f"xs[{i}] - lm1" for i in range(1, M + 1)
    )
    season_next = (
        "CASE "
        + " ".join(
            f"WHEN n % {M} = {i - 1} THEN st[{i + 2}]"
            for i in range(1, M + 1)
        )
        + f" ELSE st[{M + 2}] END"
    )
    return f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(
                   list_sort(list({{'day': day, 'x': x}})),
                   s -> CAST(s.x AS DOUBLE)) AS xs
        FROM daily GROUP BY event_type
    ),
    means AS (
        SELECT event_type, xs, len(xs) AS n,
               list_reduce(list_prepend(0.0e0, xs[1:{M}]),
                           (a, v) -> a + v) / {float(M)!r} AS lm1,
               list_reduce(list_prepend(0.0e0, xs[{M + 1}:{2 * M}]),
                           (a, v) -> a + v) / {float(M)!r} AS lm2
        FROM arr
    ),
    folded AS (
        SELECT event_type, n,
               list_reduce(
                   list_prepend(
                       [lm1, (lm2 - lm1) / {float(M)!r}, {init_s}, 0.0e0],
                       list_transform(xs[{M + 1}:],
                                      (v, i) -> [v, CAST(i + {M} AS DOUBLE)])),
                   (acc, v) -> [
                       {lp_full},
                       {B}e0 * (({lp_full}) - acc[1]) + {1 - B}e0 * acc[2],
                       {", ".join(slots)},
                       acc[{M + 3}] + (v[1] - (acc[1] + acc[2] + ({sold})))
                                    * (v[1] - (acc[1] + acc[2] + ({sold})))
                   ]) AS st
        FROM means
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CASE WHEN n >= {2 * M} THEN st[1] END AS level,
           CASE WHEN n >= {2 * M} THEN st[2] END AS trend,
           CASE WHEN n >= {2 * M} THEN {season_next} END AS season_next,
           CASE WHEN n >= {2 * M}
                THEN st[1] + st[2] + ({season_next}) END AS forecast_next,
           CASE WHEN n >= {2 * M}
                THEN sqrt(st[{M + 3}] / CAST(n - {M} AS DOUBLE))
           END AS one_step_rmse
    FROM folded
    ORDER BY event_type
"""


HOLT_WINTERS_ORACLE = _hw_oracle()


# ---------------------------------------------------------------------------
# Forecast backtest (MASE) -- is the smoother WORTH anything on this
# series?  One-step-ahead backtest of three forecasters per event type:
# naive-1 (tomorrow = today), seasonal-naive-7 (tomorrow = same weekday
# last week), and the Holt smoother above.  Errors are mean ABSOLUTE
# one-step errors over the common scoring region (days 8..n, so every
# forecaster is defined at every scored step -- no forecaster gets a
# different denominator), and each model's MASE is its MAE divided by
# the naive-1 MAE: MASE < 1 beats naive, the standard Hyndman-Koehler
# scale-free skill score.  A Holt MASE > 1 says "ship the naive
# forecast" -- the honest outcome on a trendless series.
#
# Exactness: naive and seasonal errors are |integer - integer| summed
# exactly in DECIMAL; the Holt error stream is the same ordered fold as
# holt_linear_smooth extended to accumulate |error| from day 8 on
# (state = [level, trend, pos, sum_abs_err] as a DOUBLE[] -- the
# struct-state aliasing hazard documented there applies here too), so
# both engines run the identical IEEE sequence.  MAEs and MASEs are
# single double divisions, NULL when the scoring region is empty or
# the naive MAE is zero.
#
# Scale shape: identical to holt_linear_smooth -- one combinable daily
# rollup, one bounded per-type array, window-free, join-free.
# ---------------------------------------------------------------------------

MASE_SEASON = 7
MASE_SKIP = 8  # first scored position (1-based): all models defined


def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("x"))
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs")
    )
    A, B = HOLT_ALPHA, HOLT_BETA
    xs = F.col("xs")
    n = F.size(xs)
    idx = F.sequence(F.lit(MASE_SKIP), n)  # scored positions (1-based)
    scored_n = F.when(n >= MASE_SKIP, (n - MASE_SKIP + 1).cast("bigint"))
    # exact decimal sums of |int - int| for the two reference models
    naive_sum = F.aggregate(
        idx,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, i: acc
        + F.abs(
            (F.element_at(xs, i) - F.element_at(xs, i - 1)).cast(
                "decimal(38,0)"
            )
        ),
    )
    seasonal_sum = F.aggregate(
        idx,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, i: acc
        + F.abs(
            (
                F.element_at(xs, i)
                - F.element_at(xs, i - F.lit(MASE_SEASON))
            ).cast("decimal(38,0)")
        ),
    )
    # Holt fold over positions 3..n: state [level, trend, pos, abs_err_sum];
    # the one-step error |x_pos - (l + t)| accrues only from MASE_SKIP on
    holt_state = F.aggregate(
        F.sequence(F.lit(3), n),
        F.array(
            F.element_at(xs, 1),
            F.element_at(xs, 2) - F.element_at(xs, 1),
            F.lit(2.0),
            F.lit(0.0),
        ),
        lambda acc, i: F.array(
            F.lit(A) * F.element_at(xs, i)
            + F.lit(1 - A) * (acc[0] + acc[1]),
            F.lit(B)
            * (
                (
                    F.lit(A) * F.element_at(xs, i)
                    + F.lit(1 - A) * (acc[0] + acc[1])
                )
                - acc[0]
            )
            + F.lit(1 - B) * acc[1],
            acc[2] + F.lit(1.0),
            acc[3]
            + F.when(
                i >= F.lit(MASE_SKIP),
                F.abs(F.element_at(xs, i) - (acc[0] + acc[1])),
            ).otherwise(F.lit(0.0)),
        ),
    )
    base = arr.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        scored_n.alias("n_scored"),
        F.when(n >= MASE_SKIP, naive_sum).alias("naive_sum"),
        F.when(n >= MASE_SKIP, seasonal_sum).alias("seasonal_sum"),
        F.when(n >= MASE_SKIP, holt_state[3]).alias("holt_sum"),
    )
    nsd = F.col("n_scored").cast("double")
    naive_mae = F.col("naive_sum").cast("double") / nsd
    seasonal_mae = F.col("seasonal_sum").cast("double") / nsd
    holt_mae = F.col("holt_sum") / nsd
    return base.select(
        "event_type",
        "n_days",
        "n_scored",
        naive_mae.alias("naive_mae"),
        seasonal_mae.alias("seasonal_mae"),
        holt_mae.alias("holt_mae"),
        F.when(naive_mae > 0, seasonal_mae / naive_mae).alias("seasonal_mase"),
        F.when(naive_mae > 0, holt_mae / naive_mae).alias("holt_mase"),
    ).orderBy("event_type")


FORECAST_MASE_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_transform(
                   list_sort(list({{'day': day, 'x': x}})),
                   s -> CAST(s.x AS DOUBLE)) AS xs
        FROM daily GROUP BY event_type
    ),
    folded AS (
        SELECT event_type, len(xs) AS n,
               CASE WHEN len(xs) >= {MASE_SKIP} THEN
                   list_reduce(
                       list_prepend(CAST(0 AS DECIMAL(38,0)),
                           list_transform(range({MASE_SKIP}, len(xs) + 1),
                               i -> CAST(abs(CAST(xs[i] AS BIGINT)
                                    - CAST(xs[i - 1] AS BIGINT))
                                    AS DECIMAL(38,0)))),
                       (acc, v) -> acc + v)
               END AS naive_sum,
               CASE WHEN len(xs) >= {MASE_SKIP} THEN
                   list_reduce(
                       list_prepend(CAST(0 AS DECIMAL(38,0)),
                           list_transform(range({MASE_SKIP}, len(xs) + 1),
                               i -> CAST(abs(CAST(xs[i] AS BIGINT)
                                    - CAST(xs[i - {MASE_SEASON}] AS BIGINT))
                                    AS DECIMAL(38,0)))),
                       (acc, v) -> acc + v)
               END AS seasonal_sum,
               CASE WHEN len(xs) >= {MASE_SKIP} THEN
                   list_reduce(
                       list_prepend([xs[1], xs[2] - xs[1], 2.0e0, 0.0e0],
                           list_transform(range(3, len(xs) + 1),
                               i -> [xs[i], CAST(i AS DOUBLE), 0.0e0, 0.0e0])),
                       (acc, v) -> [
                           {HOLT_ALPHA}e0 * v[1]
                               + {1 - HOLT_ALPHA}e0 * (acc[1] + acc[2]),
                           {HOLT_BETA}e0 * (({HOLT_ALPHA}e0 * v[1]
                                          + {1 - HOLT_ALPHA}e0
                                          * (acc[1] + acc[2])) - acc[1])
                               + {1 - HOLT_BETA}e0 * acc[2],
                           acc[3] + 1.0e0,
                           acc[4] + CASE WHEN v[2] >= {float(MASE_SKIP)}
                               THEN abs(v[1] - (acc[1] + acc[2]))
                               ELSE 0.0e0 END])[4]
               END AS holt_sum
        FROM arr
    ),
    base AS (
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               CASE WHEN n >= {MASE_SKIP}
                    THEN CAST(n - {MASE_SKIP} + 1 AS BIGINT) END AS n_scored,
               naive_sum, seasonal_sum, holt_sum
        FROM folded
    )
    SELECT event_type, n_days, n_scored,
           CAST(naive_sum AS DOUBLE) / CAST(n_scored AS DOUBLE) AS naive_mae,
           CAST(seasonal_sum AS DOUBLE) / CAST(n_scored AS DOUBLE)
               AS seasonal_mae,
           holt_sum / CAST(n_scored AS DOUBLE) AS holt_mae,
           CASE WHEN CAST(naive_sum AS DOUBLE) / CAST(n_scored AS DOUBLE) > 0
                THEN (CAST(seasonal_sum AS DOUBLE) / CAST(n_scored AS DOUBLE))
                     / (CAST(naive_sum AS DOUBLE) / CAST(n_scored AS DOUBLE))
           END AS seasonal_mase,
           CASE WHEN CAST(naive_sum AS DOUBLE) / CAST(n_scored AS DOUBLE) > 0
                THEN (holt_sum / CAST(n_scored AS DOUBLE))
                     / (CAST(naive_sum AS DOUBLE) / CAST(n_scored AS DOUBLE))
           END AS holt_mase
    FROM base
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# EWMA control chart (Roberts 1959 / NIST e-handbook 6.3.2.4) -- the
# small-shift drift monitor the CUSUM changepoint localizer pairs with:
# per event type, the exponentially weighted moving average of the daily
# total against time-varying control limits
#     z_t  = lambda * x_t + (1 - lambda) * z_{t-1},   z_0 = mu
#     UCL_t = mu + L * sigma * sqrt(lambda/(2-lambda) * (1 - (1-l)^2t))
# flagging out-of-control days.
#
# Determinism: z_t is a sequential recurrence -- the Holt ordered-fold
# idiom (JVM F.aggregate / DuckDB list_reduce over DOUBLE[] state,
# never struct state -- the measured aliasing hazard documented at
# HOLT_ORACLE).  The variance factor (1-lambda)^(2t) is NOT computed
# with power() (engine libm risk): the fold carries w_t = w_{t-1} * q^2
# as a pure multiplication chain, bit-equal by construction.  mu/sigma
# come from exact DECIMAL sufficient statistics (sum, sum-of-squares on
# the cents grid) with the variance a per-row double chain.  Per-day
# rows come from indexing the fold's output arrays with an exploded
# 1..n sequence -- bounded by the CALENDAR, not the corpus.
#
# Scale shape: one combinable daily groupBy over events; everything
# after rides the per-type calendar-bounded array.  Zero joins beyond
# the per-type fold row, zero windows.
# ---------------------------------------------------------------------------

EWMA_LAMBDA = 0.2  # q = 0.8; lambda/(2-lambda) = 1/9 (exact int ratio)
EWMA_L = 3  # 3-sigma limits


def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("x"))
    )
    c18 = F.col("x").cast("decimal(18,0)")
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("sorted"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(c18).alias("sx"),
        F.sum(c18 * c18).alias("sxx"),
    )
    n = F.col("n_days")
    nd = n.cast("double")
    mu = F.col("sx").cast("double") / nd
    sigma = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double") / nd
        )
        / (n - 1).cast("double")
    )
    lam, q = EWMA_LAMBDA, 1 - EWMA_LAMBDA
    q2 = q * q
    xs = F.transform(F.col("sorted"), lambda s: s["x"].cast("double"))
    # state [z, w]: EWMA level and the (1-lambda)^(2t) variance factor,
    # both appended per step so every day gets a row.  acc layout:
    # acc = [z_0, w_0, z_1, w_1, ...]; step reads the last pair.
    zs_ws = F.aggregate(
        xs,
        F.array(F.col("mu"), F.lit(1.0)),
        lambda acc, v: F.concat(
            acc,
            F.array(
                F.lit(lam) * v
                + F.lit(q) * F.element_at(acc, F.size(acc) - 1),
                F.lit(q2) * F.element_at(acc, F.size(acc)),
            ),
        ),
    )
    base = (
        arr.withColumn("mu", mu)
        .withColumn("sigma", sigma)
        .withColumn("zw", zs_ws)
    )
    i = F.col("i")
    half_width = (
        F.lit(float(EWMA_L))
        * F.col("sigma")
        * F.sqrt(
            F.lit(1).cast("double") / F.lit(9).cast("double")
            * (F.lit(1).cast("double") - F.element_at("zw", (i * 2 + 2)))
        )
    )
    out = (
        base.select(
            "event_type",
            "n_days",
            "mu",
            "sigma",
            "sorted",
            "zw",
            F.explode(F.sequence(F.lit(1), F.col("n_days").cast("int"))).alias(
                "i"
            ),
        )
        .select(
            "event_type",
            "n_days",
            i.cast("int").alias("day_index"),
            F.element_at("sorted", i)["day"].alias("day"),
            F.element_at("sorted", i)["x"].alias("cents"),
            F.round(F.col("mu"), 6).alias("mu_cents"),
            F.when(F.col("n_days") > 1, F.round(F.col("sigma"), 6)).alias(
                "sigma_cents"
            ),
            F.round(F.element_at("zw", i * 2 + 1), 6).alias("ewma_cents"),
            F.when(F.col("n_days") > 1, F.round(F.col("mu") + half_width, 6))
            .alias("ucl_cents"),
            F.when(F.col("n_days") > 1, F.round(F.col("mu") - half_width, 6))
            .alias("lcl_cents"),
            F.when(
                F.col("n_days") > 1,
                (
                    F.element_at("zw", i * 2 + 1)
                    > F.col("mu") + half_width
                )
                | (
                    F.element_at("zw", i * 2 + 1)
                    < F.col("mu") - half_width
                ),
            ).alias("out_of_control"),
        )
        .orderBy("event_type", "day_index")
    )
    return out


EWMA_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2
    ),
    arr AS (
        SELECT event_type,
               list_sort(list({{'day': day, 'x': x}})) AS sorted,
               CAST(count(*) AS BIGINT) AS n_days,
               sum(CAST(x AS DECIMAL(18,0))) AS sx,
               sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx
        FROM daily GROUP BY event_type
    ),
    stats AS (
        SELECT *,
               CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu,
               sqrt((CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                       / CAST(n_days AS DOUBLE))
                    / CAST(n_days - 1 AS DOUBLE)) AS sigma
        FROM arr
    ),
    folded AS (
        SELECT *,
               list_reduce(
                   list_prepend(
                       [mu, 1.0e0],
                       list_transform(
                           list_transform(sorted, s -> CAST(s.x AS DOUBLE)),
                           v -> [v, 0.0e0])),
                   (acc, v) -> list_append(
                       list_append(acc,
                           {EWMA_LAMBDA}e0 * v[1]
                           + {1 - EWMA_LAMBDA}e0 * acc[-2]),
                       {(1 - EWMA_LAMBDA) ** 2}e0 * acc[-1])) AS zw
        FROM stats
    )
    SELECT event_type, n_days,
           CAST(i AS INTEGER) AS day_index,
           sorted[i].day AS day,
           sorted[i].x AS cents,
           round(mu, 6) AS mu_cents,
           CASE WHEN n_days > 1 THEN round(sigma, 6) END AS sigma_cents,
           round(zw[i * 2 + 1], 6) AS ewma_cents,
           CASE WHEN n_days > 1 THEN round(mu + {EWMA_L}e0 * sigma
               * sqrt(CAST(1 AS DOUBLE) / CAST(9 AS DOUBLE)
                      * (CAST(1 AS DOUBLE) - zw[i * 2 + 2])), 6)
           END AS ucl_cents,
           CASE WHEN n_days > 1 THEN round(mu - {EWMA_L}e0 * sigma
               * sqrt(CAST(1 AS DOUBLE) / CAST(9 AS DOUBLE)
                      * (CAST(1 AS DOUBLE) - zw[i * 2 + 2])), 6)
           END AS lcl_cents,
           CASE WHEN n_days > 1 THEN
               zw[i * 2 + 1] > mu + {EWMA_L}e0 * sigma
                   * sqrt(CAST(1 AS DOUBLE) / CAST(9 AS DOUBLE)
                          * (CAST(1 AS DOUBLE) - zw[i * 2 + 2]))
               OR zw[i * 2 + 1] < mu - {EWMA_L}e0 * sigma
                   * sqrt(CAST(1 AS DOUBLE) / CAST(9 AS DOUBLE)
                          * (CAST(1 AS DOUBLE) - zw[i * 2 + 2]))
           END AS out_of_control
    FROM folded, unnest(range(1, CAST(n_days AS BIGINT) + 1)) t(i)
    ORDER BY event_type, day_index
"""


# ---------------------------------------------------------------------------
# Croston's method (Croston 1972, "Forecasting and stock control for
# intermittent demands") -- the forecaster the Holt/naive family is
# systematically wrong about: a series that is MOSTLY ZERO (sparse
# per-segment demand at 100 TB: a niche event type, a long-tail part).
# SES on such a series chases zeros; Croston separately smooths the
# NONZERO demand sizes (z) and the inter-demand intervals (p) and
# forecasts z/p demand per period.
#
# The fold runs over the ZERO-FILLED calendar (the events_gap_fill
# grid, bounded by the calendar span), with struct state in Spark and
# DOUBLE[4] list state in DuckDB ([size, interval, gap, initialized] --
# the HOLT_ORACLE aliasing lesson), conditionals as CASE inside the
# lambda.  Every chain is the identical IEEE tree in both engines.
# ---------------------------------------------------------------------------

CROSTON_ALPHA = 0.1


def croston_demand_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").cast("bigint").alias("x"))
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
    )
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("x"), F.lit(0).cast("bigint")).alias("x"),
    )
    arr = filled.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("x") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonzero"),
    )
    A = CROSTON_ALPHA
    init = F.struct(
        F.lit(0.0).alias("z"),
        F.lit(0.0).alias("p"),
        F.lit(0.0).alias("q"),
        F.lit(0.0).alias("init"),
    )

    def _step(acc, v):
        qp = acc["q"] + F.lit(1.0)
        nz = v > 0
        first = acc["init"] == F.lit(0.0)
        return F.struct(
            F.when(
                nz,
                F.when(first, v).otherwise(
                    F.lit(A) * v + F.lit(1 - A) * acc["z"]
                ),
            )
            .otherwise(acc["z"])
            .alias("z"),
            F.when(
                nz,
                F.when(first, qp).otherwise(
                    F.lit(A) * qp + F.lit(1 - A) * acc["p"]
                ),
            )
            .otherwise(acc["p"])
            .alias("p"),
            F.when(nz, F.lit(0.0)).otherwise(qp).alias("q"),
            F.when(nz, F.lit(1.0)).otherwise(acc["init"]).alias("init"),
        )

    folded = arr.withColumn("st", F.aggregate(F.col("xs"), init, _step))
    ok = F.col("st")["init"] == F.lit(1.0)
    return folded.select(
        "event_type",
        "n_days",
        "n_nonzero",
        (
            F.col("n_nonzero").cast("double") / F.col("n_days").cast("double")
        ).alias("demand_rate"),
        F.when(ok, F.col("st")["z"]).alias("croston_size"),
        F.when(ok, F.col("st")["p"]).alias("croston_interval"),
        F.when(
            ok & (F.col("st")["p"] > 0),
            F.col("st")["z"] / F.col("st")["p"],
        ).alias("croston_forecast"),
    ).orderBy("event_type")


CROSTON_ORACLE = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2
    ),
    span AS (
        SELECT event_type, min(day) AS lo, max(day) AS hi
        FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT s.event_type, CAST(g.d AS DATE) AS day
        FROM span s, unnest(generate_series(s.lo, s.hi,
                                            INTERVAL 1 DAY)) g(d)
    ),
    filled AS (
        SELECT g.event_type, g.day,
               COALESCE(d.x, CAST(0 AS BIGINT)) AS x
        FROM grid g LEFT JOIN daily d USING (event_type, day)
    ),
    arr AS (
        SELECT event_type,
               list_transform(
                   list_sort(list({{'day': day, 'x': x}})),
                   s -> CAST(s.x AS DOUBLE)) AS xs,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonzero
        FROM filled GROUP BY event_type
    ),
    folded AS (
        SELECT event_type, n_days, n_nonzero,
               list_reduce(
                   list_prepend(
                       [0.0e0, 0.0e0, 0.0e0, 0.0e0],
                       list_transform(xs,
                           v -> [v, 0.0e0, 0.0e0, 0.0e0])),
                   (acc, v) -> [
                       CASE WHEN v[1] > 0 THEN
                           CASE WHEN acc[4] = 0.0e0 THEN v[1]
                                ELSE {CROSTON_ALPHA}e0 * v[1]
                                     + {1 - CROSTON_ALPHA}e0 * acc[1] END
                       ELSE acc[1] END,
                       CASE WHEN v[1] > 0 THEN
                           CASE WHEN acc[4] = 0.0e0 THEN acc[3] + 1.0e0
                                ELSE {CROSTON_ALPHA}e0 * (acc[3] + 1.0e0)
                                     + {1 - CROSTON_ALPHA}e0 * acc[2] END
                       ELSE acc[2] END,
                       CASE WHEN v[1] > 0 THEN 0.0e0
                       ELSE acc[3] + 1.0e0 END,
                       CASE WHEN v[1] > 0 THEN 1.0e0
                       ELSE acc[4] END]) AS st
        FROM arr
    )
    SELECT event_type, n_days, n_nonzero,
           CAST(n_nonzero AS DOUBLE) / CAST(n_days AS DOUBLE)
               AS demand_rate,
           CASE WHEN st[4] = 1.0e0 THEN st[1] END AS croston_size,
           CASE WHEN st[4] = 1.0e0 THEN st[2] END AS croston_interval,
           CASE WHEN st[4] = 1.0e0 AND st[2] > 0 THEN st[1] / st[2]
           END AS croston_forecast
    FROM folded
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kaplan_meier_repurchase: Kaplan-Meier survival (1958) + Nelson-Aalen
# cumulative hazard of the customer repurchase interval.  "How long
# until a customer orders again" with the honest censoring treatment:
# the wait after a customer's LAST order is not a repurchase time, it
# is a right-censored observation at the corpus's observation end
# (max order date) -- dropping it (as a naive gap histogram does)
# biases survival low.  Per customer the consecutive-order gaps are
# events, the final open gap is censored.
#
# Determinism: d_t / c_t / n_t are exact integers; each KM factor
# ln((n-d)/n) and each NA increment d/n rides the DECIMAL(18,9) squash
# (JVM log vs libm ln last-ulp rule -- the hill_tail_index
# discipline), the cumulative sums are exact decimal, and the final
# exp() is emitted through round(.,9) (the geomean discipline: JVM exp
# and libm exp also disagree in the last ulp; measured here -- 56 of
# 547 rows off by 1 ulp before the round).  A risk set that dies
# entirely (n_t = d_t) pins survival to exactly 0.0 from that t on via
# a cumulative flag, never ln(0).
#
# Scale shape: the per-customer lead() window shuffles on o_custkey
# (combinable, no skew -- order counts per customer are small); the
# life table aggregates to ONE row per distinct gap length, bounded by
# the calendar span (~2.4k rows at any corpus size), so the
# partitionless cumulative windows run on a driver-safe bounded table
# -- the mann_kendall calendar-bounded posture, never event-bounded.
# ---------------------------------------------------------------------------


def kaplan_meier_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ties in o_orderdate within a customer: order additionally by
    # o_orderkey so lead() is deterministic; the DATE DIFFERENCE is
    # tie-order-invariant anyway (same-day pairs give gap 0).
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    maxd = orders.agg(F.max("o_orderdate").alias("obs_end"))
    gaps = (
        orders.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(maxd))
        .select(
            F.when(
                F.col("nxt").isNotNull(),
                F.datediff("nxt", "o_orderdate"),
            )
            .otherwise(F.datediff("obs_end", "o_orderdate"))
            .cast("bigint")
            .alias("gap_days"),
            F.col("nxt").isNotNull().alias("is_event"),
        )
    )
    life = gaps.groupBy("gap_days").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_events"),
        F.sum(F.when(F.col("is_event"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_censored"),
    )
    total = gaps.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    wcum = Window.orderBy("gap_days").rowsBetween(Window.unboundedPreceding, -1)
    winc = Window.orderBy("gap_days").rowsBetween(Window.unboundedPreceding, 0)
    tbl = (
        life.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(wcum),
                F.lit(0),
            ),
        )
        .withColumn(
            "ln_factor",
            F.when(
                (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk")),
                F.log(
                    (F.col("n_risk") - F.col("n_events")).cast("double")
                    / F.col("n_risk").cast("double")
                ).cast("decimal(18,9)"),
            ).otherwise(F.lit(0).cast("decimal(18,9)")),
        )
        .withColumn(
            "na_inc",
            (
                F.col("n_events").cast("double")
                / F.col("n_risk").cast("double")
            ).cast("decimal(18,9)"),
        )
        .withColumn(
            "dead",
            F.max(
                F.when(F.col("n_events") == F.col("n_risk"), 1).otherwise(0)
            ).over(winc),
        )
    )
    return tbl.select(
        "gap_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.sum("ln_factor").over(winc).cast("double")), 9)
        )
        .alias("km_survival"),
        F.sum("na_inc").over(winc).cast("double").alias("na_cumhazard"),
    ).orderBy("gap_days")


KAPLAN_MEIER_ORACLE = """
    WITH gaps AS (
        SELECT CASE WHEN nxt IS NOT NULL
                    THEN date_diff('day', o_orderdate, nxt)
                    ELSE date_diff('day', o_orderdate,
                                   (SELECT max(o_orderdate) FROM orders))
               END AS gap_days,
               nxt IS NOT NULL AS is_event
        FROM (
            SELECT o_custkey, o_orderdate,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS nxt
            FROM orders
        )
    ),
    life AS (
        SELECT CAST(gap_days AS BIGINT) AS gap_days,
               CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_events,
               CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_censored
        FROM gaps GROUP BY 1
    ),
    tbl AS (
        SELECT gap_days, n_events, n_censored,
               CAST((SELECT CAST(count(*) AS BIGINT) FROM gaps)
                    - COALESCE(sum(n_events + n_censored) OVER (
                          ORDER BY gap_days
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) AS BIGINT) AS n_risk
        FROM life
    ),
    facts AS (
        SELECT gap_days, n_risk, n_events, n_censored,
               CASE WHEN n_events > 0 AND n_events < n_risk
                    THEN CAST(ln(CAST(n_risk - n_events AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE))
                              AS DECIMAL(18,9))
                    ELSE CAST(0 AS DECIMAL(18,9))
               END AS ln_factor,
               CAST(CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
                    AS DECIMAL(18,9)) AS na_inc,
               max(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY gap_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS dead
        FROM tbl
    )
    SELECT gap_days, n_risk, n_events, n_censored,
           CASE WHEN dead = 1 THEN 0.0
                ELSE round(exp(CAST(sum(ln_factor) OVER (
                         ORDER BY gap_days
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS DOUBLE)), 9)
           END AS km_survival,
           CAST(sum(na_inc) OVER (
               ORDER BY gap_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS na_cumhazard
    FROM facts
    ORDER BY gap_days
"""


TEMPORAL_QUERIES: list[tuple[str, object, str | None]] = [
    ("kaplan_meier_repurchase", kaplan_meier_repurchase, KAPLAN_MEIER_ORACLE),
    ("croston_demand_forecast", croston_demand_forecast, CROSTON_ORACLE),
    ("holt_linear_smooth", holt_linear_smooth, HOLT_ORACLE),
    ("holt_winters_seasonal", holt_winters_seasonal, HOLT_WINTERS_ORACLE),
    ("ewma_control_chart", ewma_control_chart, EWMA_ORACLE),
    ("forecast_backtest_mase", forecast_backtest_mase, FORECAST_MASE_ORACLE),
    (
        "conversion_latency_histogram",
        conversion_latency_histogram,
        CONVERSION_LATENCY_ORACLE,
    ),
    (
        "session_length_histogram",
        session_length_histogram,
        SESSION_LENGTH_ORACLE,
    ),
    (
        "daily_profile_similarity",
        daily_profile_similarity,
        PROFILE_SIMILARITY_ORACLE,
    ),
    ("new_vs_returning_users", new_vs_returning_users, NEW_RETURNING_ORACLE),
    ("dau_wau_stickiness", dau_wau_stickiness, DAU_WAU_ORACLE),
    ("event_disorder_profile", event_disorder_profile, DISORDER_ORACLE),
    ("asof_join_purchase_view", asof_join_purchase_view, ASOF_ORACLE),
    ("asof_forward_purchase_view", asof_forward_purchase_view, ASOF_FORWARD_ORACLE),
    ("range_join_purchase_views_1h", range_join_purchase_views_1h, RANGE_JOIN_ORACLE),
    ("events_gap_fill", events_gap_fill, GAP_FILL_ORACLE),
    ("lag_feature_matrix", lag_feature_matrix, LAG_FEATURES_ORACLE),
    ("scd2_user_event_intervals", scd2_user_event_intervals, SCD2_ORACLE),
    ("time_decayed_user_value", time_decayed_user_value, DECAYED_VALUE_ORACLE),
    ("hour_of_week_profile", hour_of_week_profile, HOUR_OF_WEEK_ORACLE),
    ("interarrival_profile", interarrival_profile, INTERARRIVAL_ORACLE),
    ("purchase_attribution", purchase_attribution, ATTRIBUTION_ORACLE),
    (
        "seasonality_adjusted_daily",
        seasonality_adjusted_daily,
        SEASONAL_RESIDUAL_ORACLE,
    ),
    ("event_transition_matrix", event_transition_matrix, TRANSITION_MATRIX_ORACLE),
    ("session_timeout_curve", session_timeout_curve, SESSION_CURVE_ORACLE),
]
