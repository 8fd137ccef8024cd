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


def test_gap_fill_spine_dense_and_filled(spark):
    """The hourly spine must be contiguous per type (no missing hours),
    gaps must appear as n_events=0 with a carried-forward filled_value,
    and filled_value must equal the most recent non-null hr_value."""
    rows = QUERIES["events_gap_fill"](spark, SF_SMOKE).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert any(r.n_events == 0 for r in rows), "spine should contain gaps"
    for evt, rs in by_type.items():
        rs.sort(key=lambda r: r.hr)
        for a, b in zip(rs, rs[1:]):
            assert (b.hr - a.hr).total_seconds() == 3600, (evt, a.hr, b.hr)
        last = None
        for r in rs:
            if r.hr_value is not None:
                assert r.n_events > 0
                last = r.hr_value
            else:
                assert r.n_events == 0
            assert r.filled_value == last


def test_scd2_intervals_tile_per_user(spark):
    """Per user: intervals are disjoint, adjacent (valid_to == next
    valid_from), and exactly one interval is open/current."""
    rows = QUERIES["scd2_user_event_intervals"](spark, SF_SMOKE).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from, uid
            delta = b.valid_from - a.valid_from
            assert a.duration_us == (
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds
            )


def test_decayed_value_bounded_by_total(spark):
    """exp(-age/tau) weights are in (0, 1], so the decayed sum is
    positive-bounded by the plain sum whenever all values are >= 0."""
    rows = QUERIES["time_decayed_user_value"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.decayed_value <= r.total_value + 1e-6
        assert r.n_events >= 1


def test_hour_of_week_profile_is_a_probability_partition(spark):
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["hour_of_week_profile"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dow <= 6
        assert 0 <= r.hod <= 23
        assert r.n_events > 0
    # shares partition the event stream (rounding leaves < 1e-3 slack)
    assert abs(sum(r.share_of_total for r in rows) - 1.0) < 1e-3


def test_interarrival_buckets_bound_their_gaps(spark):
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["interarrival_profile"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    n_events, n_users = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()
    # one gap per event except each user's first
    assert sum(r.n_gaps for r in rows) == n_events - n_users
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        # bucket b holds gap_us in [2^b - 1, 2^(b+1) - 2]
        assert 2**r.bucket - 1 <= r.min_gap_us <= r.max_gap_us <= 2 ** (r.bucket + 1) - 2


def test_purchase_attribution_windows_and_channels(spark):
    """Every purchase appears once; attributed rows carry channels from
    the touch set with last touch at most 24h before; unattributed rows
    have null channels; first <= last in time implies secs_to_convert
    bounded by the lookback."""
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        ATTRIB_LOOKBACK_SEC,
        ATTRIB_TOUCH_TYPES,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["purchase_attribution"](spark, SF_SMOKE).collect()
    import duckdb

    n_purch = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/events.parquet') "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert len(rows) == n_purch
    assert any(r.n_touches > 0 for r in rows)
    assert any(r.n_touches == 0 for r in rows)
    for r in rows:
        if r.n_touches == 0:
            assert r.first_channel is None and r.last_channel is None
            assert r.secs_to_convert is None
        else:
            assert r.first_channel in ATTRIB_TOUCH_TYPES
            assert r.last_channel in ATTRIB_TOUCH_TYPES
            assert 0 <= r.secs_to_convert <= ATTRIB_LOOKBACK_SEC


def test_seasonal_residuals_sum_to_zero(spark):
    """Residuals against the per-cell mean must cancel across the full
    stream (each cell's residuals sum to zero by construction of the
    mean; the decimal-exact summation makes that visible at 1e-3)."""
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["seasonality_adjusted_daily"](spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r.residual for r in rows)) < 1e-3
    assert any(abs(r.residual) > 0 for r in rows)
    for r in rows:
        assert r.n_events > 0


def test_transition_matrix_is_row_stochastic(spark):
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["event_transition_matrix"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    n_events, n_users = duckdb.sql(
        f"SELECT count(*), count(DISTINCT user_id) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()
    # one transition per event except each user's first
    assert sum(r.n for r in rows) == n_events - n_users
    from collections import defaultdict

    row_p = defaultdict(float)
    for r in rows:
        row_p[r.from_type] += r.p_transition
    for ft, p in row_p.items():
        assert abs(p - 1.0) < 1e-3, ft


def test_session_curve_monotone_and_agrees_with_sessionization(spark):
    """Session counts are non-increasing in the timeout, and the curve's
    1800s step must equal the row count of the declared 30-minute
    sessionization query -- two independent formulations of the same
    quantity."""
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["session_timeout_curve"](spark, SF_SMOKE).collect()
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.n_sessions == r.n_users + r.n_breaks
        assert r.sessions_per_user >= 1.0
    step_30m = next(r for r in rows if r.timeout_sec == 1800)
    n_sessions = QUERIES["session_windows_users"](spark, SF_SMOKE).count()
    assert step_30m.n_sessions == n_sessions


def test_event_disorder_profile_invariants(spark):
    """Shares sum to 1 over all events; positive-lateness buckets hold
    the 2^k ranges the bit-length idiom promises."""
    import duckdb

    rows = QUERIES["event_disorder_profile"](spark, SF_SMOKE).collect()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchone()[0]
    assert sum(r.n_events for r in rows) == n_events
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        if r.bucket >= 0:
            assert 2**r.bucket <= r.min_lateness_us + 1
            assert r.max_lateness_us + 1 < 2 ** (r.bucket + 1)


def test_daily_profile_similarity_matches_numpy(spark):
    """Top-K day pairs recomputed with numpy from the raw events (exact
    integer cents, same epoch bucketing) must match ranks and distances
    exactly."""
    from collections import defaultdict
    from decimal import Decimal

    import numpy as np

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        SIM_BAND_DAYS,
        SIM_TOPK,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    prof: dict[tuple, np.ndarray] = defaultdict(lambda: np.zeros(24, dtype=object))
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        day, hour = us // 86_400_000_000, (us // 3_600_000_000) % 24
        cents = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        prof[(r.event_type, day)][hour] += cents
    by_type: dict[str, list] = defaultdict(list)
    for (et, day), v in prof.items():
        by_type[et].append((day, v))
    expect: dict[str, list] = {}
    for et, days in by_type.items():
        days.sort()
        pairs = []
        for i, (da, va) in enumerate(days):
            for db, vb in days[i + 1:]:
                if db - da > SIM_BAND_DAYS:
                    continue
                d = va - vb
                pairs.append((int(np.sum(d * d)), da, db))
        pairs.sort()
        expect[et] = pairs[:SIM_TOPK]
    rows = QUERIES["daily_profile_similarity"](spark, SF_SMOKE).collect()
    got: dict[str, list] = defaultdict(list)
    epoch = __import__("datetime").date(1970, 1, 1)
    for r in sorted(rows, key=lambda r: (r.event_type, r.sim_rank)):
        got[r.event_type].append(
            (int(r.dist2_q), (r.day_a - epoch).days, (r.day_b - epoch).days)
        )
    assert dict(got) == expect


def test_new_vs_returning_partitions_actives(spark):
    """new + returning == active per day; the first report day is all-new;
    total new across days equals the distinct user count."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    rows = sorted(
        QUERIES["new_vs_returning_users"](spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    assert rows
    assert rows[0].n_returning == 0
    for r in rows:
        assert r.n_new + r.n_returning == r.n_active
    n_users = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_new for r in rows) == n_users


def test_dau_wau_stickiness_bounds(spark):
    """WAU >= DAU always (the week contains the day); stickiness in
    (0, 1]; WAU recomputed directly for a sample day must match."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    rows = QUERIES["dau_wau_stickiness"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.wau7 >= r.dau > 0
        assert 0.0 < r.stickiness <= 1.0
    import datetime

    from pyspark.sql import functions as F

    mid = sorted(rows, key=lambda r: r.day)[len(rows) // 2]
    epoch = datetime.date(1970, 1, 1)
    d = (mid.day - epoch).days
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_idx")
    )
    direct = (
        ev.filter((F.col("day_idx") >= d - 6) & (F.col("day_idx") <= d))
        .select("user_id")
        .distinct()
        .count()
    )
    assert direct == mid.wau7


def test_conversion_latency_reconciles_with_asof(spark):
    """Histogram must re-partition the as-of output exactly: bucket -1
    carries the no-prior-view purchases, bucketed gaps respect their
    power-of-two bounds, shares sum to 1."""
    asof = QUERIES["asof_join_purchase_view"](spark, SF_SMOKE).collect()
    rows = QUERIES["conversion_latency_histogram"](spark, SF_SMOKE).collect()
    assert sum(r.n_purchases for r in rows) == len(asof)
    n_null = sum(1 for a in asof if a.gap_us is None)
    by_bucket = {r.bucket: r for r in rows}
    if n_null:
        assert by_bucket[-1].n_purchases == n_null
        assert by_bucket[-1].min_gap_us is None
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        if r.bucket >= 0:
            assert 2 ** r.bucket <= r.min_gap_us + 1
            assert r.max_gap_us + 1 < 2 ** (r.bucket + 1)


def test_session_histogram_reconciles_with_timeout_curve(spark):
    """Total sessions at the 1800 s timeout must equal the
    session_timeout_curve's n_sessions at that ladder point; per-bucket
    invariants (power-of-two bounds, shares sum to 1, events >= sessions)."""
    rows = QUERIES["session_length_histogram"](spark, SF_SMOKE).collect()
    curve = {
        r.timeout_sec: r.n_sessions
        for r in QUERIES["session_timeout_curve"](spark, SF_SMOKE).collect()
    }
    assert sum(r.n_sessions for r in rows) == curve[1800]
    assert abs(sum(r.session_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 2 ** r.bucket <= r.min_events <= r.max_events < 2 ** (r.bucket + 1)
        assert r.total_events >= r.n_sessions
        assert r.avg_duration_sec >= 0.0


def test_holt_matches_python_recompute(spark):
    """Differential replay of the fold: identical IEEE sequence over the
    date-sorted daily series must give bit-equal level/trend/forecast."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    def _cents(v: float) -> int:
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    daily: dict[str, dict] = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect():
        daily[r.event_type][r.ts.date()] += _cents(r.value)

    rows = {r.event_type: r for r in QUERIES["holt_linear_smooth"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(daily)
    A, B = HOLT_ALPHA, HOLT_BETA
    for t, series in daily.items():
        xs = [float(series[d]) for d in sorted(series)]
        r = rows[t]
        assert r.n_days == len(xs)
        if len(xs) < 2:
            assert r.level is None and r.trend is None
            continue
        l, tr, e = xs[0], xs[1] - xs[0], 0.0
        for v in xs[2:]:
            lp = A * v + (1 - A) * (l + tr)
            tp = B * (lp - l) + (1 - B) * tr
            e = e + (v - (l + tr)) * (v - (l + tr))
            l, tr = lp, tp
        assert r.level == l and r.trend == tr
        assert r.forecast_next == l + tr
        if len(xs) > 2:
            assert r.one_step_rmse == (e / (len(xs) - 2)) ** 0.5


def test_holt_forecast_identity(spark):
    """forecast_next must equal level + trend exactly, and the rmse is
    nonnegative wherever defined."""
    for r in QUERIES["holt_linear_smooth"](spark, SF_SMOKE).collect():
        if r.level is not None:
            assert r.forecast_next == r.level + r.trend
        if r.one_step_rmse is not None:
            assert r.one_step_rmse >= 0.0


def test_mase_matches_python_recompute(spark):
    """Differential replay: the three one-step error streams over the
    common scoring region, and MASE = model MAE / naive MAE."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
        MASE_SEASON,
        MASE_SKIP,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    def _cents(v: float) -> int:
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    daily: dict[str, dict] = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect():
        daily[r.event_type][r.ts.date()] += _cents(r.value)

    rows = {r.event_type: r for r in QUERIES["forecast_backtest_mase"](spark, SF_SMOKE).collect()}
    A, B = HOLT_ALPHA, HOLT_BETA
    for t, series in daily.items():
        xs = [float(series[d]) for d in sorted(series)]
        r = rows[t]
        assert r.n_days == len(xs)
        if len(xs) < MASE_SKIP:
            assert r.n_scored is None
            continue
        scored = range(MASE_SKIP - 1, len(xs))  # 0-based
        naive = sum(abs(int(xs[i]) - int(xs[i - 1])) for i in scored)
        seas = sum(
            abs(int(xs[i]) - int(xs[i - MASE_SEASON])) for i in scored
        )
        l, tr, err = xs[0], xs[1] - xs[0], 0.0
        for i in range(2, len(xs)):
            if i >= MASE_SKIP - 1:
                err = err + abs(xs[i] - (l + tr))
            lp = A * xs[i] + (1 - A) * (l + tr)
            tr = B * (lp - l) + (1 - B) * tr
            l = lp
        ns = len(xs) - MASE_SKIP + 1
        assert r.n_scored == ns
        assert r.naive_mae == naive / ns
        assert r.seasonal_mae == seas / ns
        assert r.holt_mae == err / ns
        if naive > 0:
            assert r.seasonal_mase == (seas / ns) / (naive / ns)
            assert r.holt_mase == (err / ns) / (naive / ns)
        for v in (r.naive_mae, r.seasonal_mae, r.holt_mae):
            assert v >= 0.0


def test_ewma_matches_independent_python(spark):
    """Differential guard: rebuild the EWMA recurrence, control limits,
    and flags in pure Python from the parquet and require close
    agreement (the engine path is bit-deterministic; the reference here
    is an independent implementation, so compare to 1e-6 after the
    6-dp rounding)."""
    import math
    from collections import defaultdict

    import duckdb

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        EWMA_L,
        EWMA_LAMBDA,
    )
    from tests.conftest import SF_SMOKE

    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
            FROM '{SF_SMOKE}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, day, x in daily:
        series[et].append((day, x))

    rows = QUERIES["ewma_control_chart"](spark, SF_SMOKE).collect()
    by_key = {(r.event_type, r.day_index): r for r in rows}
    n_rows = 0
    for et, pts in series.items():
        xs = [x for _, x in pts]
        n = len(xs)
        mu = sum(xs) / n
        var = (sum(v * v for v in xs) - sum(xs) ** 2 / n) / (n - 1)
        sigma = math.sqrt(var)
        z, w = mu, 1.0
        for t, (day, x) in enumerate(pts, start=1):
            z = EWMA_LAMBDA * x + (1 - EWMA_LAMBDA) * z
            w = w * (1 - EWMA_LAMBDA) ** 2
            hw = EWMA_L * sigma * math.sqrt(1.0 / 9.0 * (1.0 - w))
            r = by_key[(et, t)]
            n_rows += 1
            assert r.day == day and r.cents == x
            assert abs(r.ewma_cents - z) < 1e-6
            assert abs(r.ucl_cents - (mu + hw)) < 1e-6
            assert abs(r.lcl_cents - (mu - hw)) < 1e-6
            assert r.out_of_control == (z > mu + hw or z < mu - hw)
    assert n_rows == len(rows)


def test_ewma_limits_widen_then_saturate(spark):
    """The variance factor (1-(1-lambda)^2t) is increasing in t, so the
    control band must widen monotonically and approach the asymptote."""
    from tests.conftest import SF_SMOKE

    rows = QUERIES["ewma_control_chart"](spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day_index)
        widths = [r.ucl_cents - r.lcl_cents for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(widths, widths[1:])), et
        # asymptotic width = 2 * L * sigma * sqrt(1/9)
        asym = 2 * 3 * rs[0].sigma_cents * (1.0 / 3.0)
        assert widths[-1] <= asym + 1e-6, et


def test_croston_matches_independent_python(spark):
    """Differential check: recompute Croston (zero-filled calendar,
    size/interval smoothing, demand-rate) in pure Python and compare
    bit-exactly; on an all-nonzero series Croston's interval must
    converge toward 1 and the size equals SES of the sizes."""
    import datetime

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        CROSTON_ALPHA,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from decimal import ROUND_HALF_UP, Decimal

    def _cents(v):
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    daily = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        k = (r.event_type, r.ts.date())
        daily[k] = daily.get(k, 0) + _cents(r.value)
    series = {}
    for (et, d), v in daily.items():
        series.setdefault(et, {})[d] = v
    got = {
        r.event_type: r
        for r in QUERIES["croston_demand_forecast"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(series)
    a, q1 = CROSTON_ALPHA, 1 - CROSTON_ALPHA
    for et, d in series.items():
        lo, hi = min(d), max(d)
        days = [lo + datetime.timedelta(days=i) for i in range((hi - lo).days + 1)]
        xs = [float(d.get(day, 0)) for day in days]
        z = p = qq = 0.0
        init = 0.0
        for x in xs:
            qp = qq + 1.0
            if x > 0:
                if init == 0.0:
                    z, p = x, qp
                else:
                    z = a * x + q1 * z
                    p = a * qp + q1 * p
                qq, init = 0.0, 1.0
            else:
                qq = qp
        g = got[et]
        assert g.n_days == len(xs)
        assert g.n_nonzero == sum(1 for x in xs if x > 0)
        assert g.demand_rate == float(g.n_nonzero) / float(g.n_days)
        if init == 1.0:
            assert g.croston_size == z
            assert g.croston_interval == p
            if p > 0:
                assert g.croston_forecast == z / p
            assert g.croston_interval >= 1.0 - 1e-12


def test_kaplan_meier_matches_python(spark):
    """Independent life-table recompute: gaps (censored last), risk
    sets, KM product, NA cumulative hazard."""
    import math

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    orders = {}
    for r in load_table(spark, SF_SMOKE, "orders").collect():
        orders.setdefault(r.o_custkey, []).append((r.o_orderdate, r.o_orderkey))
    obs_end = max(d for v in orders.values() for d, _ in v)
    gaps = []
    for v in orders.values():
        v.sort()
        for (d1, _), (d2, _) in zip(v, v[1:]):
            gaps.append(((d2 - d1).days, True))
        gaps.append(((obs_end - v[-1][0]).days, False))
    life = {}
    for g, ev in gaps:
        d, c = life.get(g, (0, 0))
        life[g] = (d + 1, c) if ev else (d, c + 1)
    rows = sorted(
        QUERIES["kaplan_meier_repurchase"](spark, SF_SMOKE).collect(),
        key=lambda r: r.gap_days,
    )
    assert [r.gap_days for r in rows] == sorted(life)
    n = len(gaps)
    lnsum, nasum, dead = 0, 0, False
    from decimal import ROUND_HALF_UP, Decimal

    def sq(x):
        return Decimal(repr(x)).quantize(
            Decimal("1e-9"), rounding=ROUND_HALF_UP
        )

    for r in rows:
        d, c = life[r.gap_days]
        assert (r.n_events, r.n_censored) == (d, c)
        assert r.n_risk == n
        if d == r.n_risk:
            dead = True
        if 0 < d < r.n_risk:
            lnsum += sq(math.log((r.n_risk - d) / r.n_risk))
        nasum += sq(d / r.n_risk)
        if dead:
            assert r.km_survival == 0.0
        else:
            assert r.km_survival == round(math.exp(float(lnsum)), 9)
        assert r.na_cumhazard == float(nasum)
        n -= d + c
    assert n == 0


def test_holt_winters_matches_python(spark):
    """Pure-Python recompute of the additive HW recurrence (same IEEE
    op order) per event type."""
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_M,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from decimal import ROUND_HALF_UP, Decimal

    daily = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        k = (r.event_type, r.ts.date())
        cents = int(
            Decimal(repr(r.value * 100)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        daily[k] = daily.get(k, 0) + cents
    series = {}
    for (t, d), x in sorted(daily.items(), key=lambda kv: kv[0]):
        series.setdefault(t, []).append((d, x))
    got = {
        r.event_type: r
        for r in QUERIES["holt_winters_seasonal"](spark, SF_SMOKE).collect()
    }
    A, B, G, M = HW_ALPHA, HW_BETA, HW_GAMMA, HW_M
    for t, pts in series.items():
        pts.sort()
        xs = [float(x) for _, x in pts]
        n = len(xs)
        g = got[t]
        assert g.n_days == n
        if n < 2 * M:
            assert g.level is None and g.forecast_next is None
            continue
        l = sum(xs[:M]) / float(M)
        tr = (sum(xs[M : 2 * M]) / float(M) - l) / float(M)
        sv = [xs[i] - l for i in range(M)]
        e = 0.0
        for p in range(M + 1, n + 1):
            v = xs[p - 1]
            idx = (p - 1) % M
            sold = sv[idx]
            fc = l + tr + sold
            lp = A * (v - sold) + (1 - A) * (l + tr)
            tp = B * (lp - l) + (1 - B) * tr
            sv[idx] = G * (v - lp) + (1 - G) * sold
            e = e + (v - fc) * (v - fc)
            l, tr = lp, tp
        season_next = sv[n % M]
        assert g.level == l
        assert g.trend == tr
        assert g.season_next == season_next
        assert g.forecast_next == l + tr + season_next
        assert g.one_step_rmse == math.sqrt(e / float(n - M))
