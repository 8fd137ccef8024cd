from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
    SAMPLE_K,
    STATISTICS_QUERIES,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

ORACLE_NAMES = [name for name, _, o in STATISTICS_QUERIES if o is not None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_quantiles_ordered(spark):
    for r in QUERIES["quantile_summary"](spark, SF_SMOKE).collect():
        assert r.qty_p25 <= r.qty_p50 <= r.qty_p75 <= r.qty_p95
        assert r.price_p25 <= r.price_p50 <= r.price_p75 <= r.price_p95


def test_sample_rate_plausible(spark):
    # 1/16 hash sample: across all strata the total draw is binomial;
    # just assert it's nonempty and nowhere near the full table
    rows = QUERIES["sample_stratified"](spark, SF_SMOKE).collect()
    assert rows
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    total = load_table(spark, SF_SMOKE, "orders").count()
    n = sum(r.n_sampled for r in rows)
    assert 0 < n < total / 4
    for r in rows:
        assert r.est_total == 16 * r.n_sampled


def test_topk_sample_exactly_k(spark):
    rows = QUERIES["sample_topk_per_group"](spark, SF_SMOKE).collect()
    assert rows
    per_group: dict[str, list[int]] = {}
    for r in rows:
        per_group.setdefault(r.o_orderpriority, []).append(r.pick_rank)
    for ranks in per_group.values():
        assert sorted(ranks) == list(range(1, min(SAMPLE_K, len(ranks)) + 1))


def test_sketch_error_bounds(spark):
    """The declared query now emits the sketch CONTRACT booleans (round-7
    re-shape); they must all hold, and the exact columns must agree with
    a direct computation."""
    rows = QUERIES["sketch_summary"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.approx_users_in_bounds, r
        assert r.approx_p50_rank_ok, r
        assert r.min_value <= r.max_value
        assert 0 < r.exact_users <= r.n_events


def test_geomean_grouped_agg_matches_numpy(spark):
    """The GROUPED_AGG pandas_udf path, value-checked against a direct
    numpy computation per group (rows-only in the driver contract; this
    is its correctness gate)."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    got = {
        r.event_type: (r.n, r.geomean_value)
        for r in QUERIES["geomean_event_value"](spark, SF_SMOKE).collect()
    }
    t = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    t = t[t.value > 0]
    from decimal import ROUND_HALF_UP, Decimal

    grid = Decimal(1).scaleb(-12)
    for et, grp in t.groupby("event_type"):
        n, gm = got[et]
        assert n == len(grp)
        # numpy stays the sanity reference at the declared 6-dp rounding
        assert math.isclose(
            gm,
            float(np.exp(np.log(grp.value.to_numpy()).mean())),
            abs_tol=5e-7,
            rel_tol=1e-6,
        )
        # ... and the decimal-grid recompute (round 13 determinism
        # discipline: quantized ln sum, one division, HALF_UP round(6))
        # must match EXACTLY -- this is what the shared oracle hashes
        total = Decimal(0)
        for x in grp.value.to_numpy():
            total += Decimal(math.log(float(x))).quantize(
                grid, rounding=ROUND_HALF_UP
            )
        expect = float(
            Decimal(math.exp(float(total) / len(grp))).quantize(
                Decimal(1).scaleb(-6), rounding=ROUND_HALF_UP
            )
        )
        assert gm == expect


def test_split_assignment_is_leakage_safe(spark):
    """Every user must land in exactly ONE split (the split is a pure
    function of user_id), splits must be non-degenerate at smoke scale,
    and proportions should be in the neighborhood of 80/10/10."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        split_assignment,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", split_assignment(F.col("user_id")).alias("split")
    )
    per_user = ev.distinct().groupBy("user_id").count()
    assert per_user.filter(F.col("count") > 1).count() == 0

    sizes = {r.split: r.n for r in
             ev.distinct().groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"train", "val", "test"}
    total = sum(sizes.values())
    assert 0.65 <= sizes["train"] / total <= 0.95


def test_geomean_exact_twin_agrees_with_grouped_agg(spark):
    """The JVM-expression geomean must agree with the GROUPED_AGG pandas
    path to the twin's declared rounding (1e-6) on every group."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    udf_rows = {
        r.event_type: r.geomean_value
        for r in QUERIES["geomean_event_value"](spark, SF_SMOKE).collect()
    }
    for r in QUERIES["geomean_event_value_exact"](spark, SF_SMOKE).collect():
        assert abs(r.geomean_value - udf_rows[r.event_type]) <= 1e-6


def test_decile_approx_tracks_exact_binning(spark):
    """The sort-free sketch path must agree with the exact ntile path:
    every row within one bin, >=99% exactly equal (GK at accuracy 10k on
    these group sizes is near-exact; a broken bounds join would scatter
    assignments uniformly)."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    exact = {
        r.event_id: r.decile
        for r in QUERIES["value_decile_features"](spark, SF_SMOKE).collect()
    }
    rows = QUERIES["value_decile_features_approx"](spark, SF_SMOKE).collect()
    assert len(rows) == len(exact)
    same = sum(1 for r in rows if r.decile == exact[r.event_id])
    assert all(abs(r.decile - exact[r.event_id]) <= 1 for r in rows)
    assert same / len(rows) >= 0.99


def test_sketch_profile_exact_regime_and_merge(spark):
    """distinct_users_sketch_profile: at test scale both sketch families
    are below capacity (THETA_LGK/HLL_LGK docstring), so every estimate
    must EQUAL the exact count -- including the 'ALL' row, whose HLL
    figure comes from merging per-type sketches (hll_union_agg), pinning
    the two-level partial-aggregate path."""
    rows = QUERIES["distinct_users_sketch_profile"](spark, SF_SMOKE).collect()
    assert rows
    by_type = {r.event_type: r for r in rows}
    assert "ALL" in by_type
    for r in rows:
        assert r.distinct_theta == r.distinct_exact, r.event_type
        assert r.distinct_hll == r.distinct_exact, r.event_type
    per_type_max = max(
        r.distinct_exact for r in rows if r.event_type != "ALL"
    )
    assert by_type["ALL"].distinct_exact >= per_type_max
    assert by_type["ALL"].n_events == sum(
        r.n_events for r in rows if r.event_type != "ALL"
    )


def test_psi_self_consistency(spark):
    """PSI is ~0 when base and current halves come from the same
    generator (the synthetic stream is stationary), and the drifted flag
    restates the threshold comparison."""
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        PSI_DRIFT_THRESHOLD,
    )

    rows = QUERIES["value_distribution_psi"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.psi >= -1e-9  # PSI is a sum of (p-q)ln(p/q) >= 0 terms
        assert r.drifted == (r.psi > PSI_DRIFT_THRESHOLD)
        assert r.base_n + r.cur_n > 0


def test_ks_drift_self_consistency(spark):
    """KS invariants on the stationary synthetic stream: D in [0, 1],
    D restates the integer numerator exactly, the halves of each type sum
    to the type's event count, and the stationary stream never drifts."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        KS_CRIT_COEFF,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["ks_drift_test"](spark, SF_SMOKE).collect()
    assert rows
    totals = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0
        assert r.ks_d == int(r.d_num) / (r.base_n * r.cur_n)
        assert r.base_n + r.cur_n == totals[r.event_type]
        assert r.drifted == (r.ks_d > r.ks_crit)
        assert abs(
            r.ks_crit
            - KS_CRIT_COEFF
            * ((r.base_n + r.cur_n) / (r.base_n * r.cur_n)) ** 0.5
        ) < 1e-12
        assert not r.drifted  # stationary generator: no real drift


def test_daily_anomaly_zscores_standardized(spark):
    """Per type: z-scores must average ~0 and flag exactly the |z|
    threshold exceedances."""
    from collections import defaultdict

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        ANOMALY_Z,
    )

    rows = QUERIES["daily_value_anomalies"](spark, SF_SMOKE).collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
        assert r.is_anomaly == (abs(r.z) > ANOMALY_Z)
    for t, grp in by_type.items():
        mean_z = sum(r.z for r in grp) / len(grp)
        assert abs(mean_z) < 1e-3, t


def test_table_stats_profile_invariants(spark):
    """NDV never exceeds row count; the primary key's NDV equals it;
    min <= max as rendered values for the key."""
    rows = {r.column_name: r for r in QUERIES["table_stats_profile"](spark, SF_SMOKE).collect()}
    n_rows = {r.n_rows for r in rows.values()}
    assert len(n_rows) == 1
    (n,) = n_rows
    for r in rows.values():
        assert r.n_distinct + r.n_nulls <= n + (1 if r.n_nulls else 0)
        assert r.n_distinct <= n
    assert rows["o_orderkey"].n_distinct == n
    assert int(rows["o_orderkey"].min_value) <= int(rows["o_orderkey"].max_value)


def test_stratified_kfold_balance(spark):
    """Folds are 0..K-1; per-lang shares sum to 1; assignment covers
    every document exactly once."""
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import KFOLD_K
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["stratified_kfold_assign"](spark, SF_SMOKE).collect()
    assert rows
    per_lang: dict[str, float] = {}
    for r in rows:
        assert 0 <= r.fold < KFOLD_K
        per_lang[r.lang] = per_lang.get(r.lang, 0.0) + r.fold_share
    for lang, s in per_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_theil_sen_matches_local_median(spark):
    """Differential check: the distributed rank-median of pairwise slopes
    equals a direct local computation over the same daily totals."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    daily = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("x"))
        .collect()
    )
    by_type: dict = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((r.d, int(r.x)))
    rows = QUERIES["theil_sen_daily_trend"](spark, SF_SMOKE).collect()
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        pts = sorted(by_type[r.event_type])
        slopes = sorted(
            (x2 - x1) / (d2 - d1)
            for i, (d1, x1) in enumerate(pts)
            for (d2, x2) in pts[i + 1 :]
        )
        n = len(slopes)
        assert r.n_days == len(pts) and r.n_pairs == n
        lo, hi = slopes[(n + 1) // 2 - 1], slopes[n // 2]
        assert r.slope_cents_per_day == (lo + hi) / 2
        assert r.trend_sign == (r.slope_cents_per_day > 0) - (
            r.slope_cents_per_day < 0
        )


def test_global_quantiles_match_local_sort(spark):
    """The two-phase bin+select plan must return exactly the type-1
    quantile elements a local full sort produces."""
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        GLOBAL_QUANTILE_PS,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    values = sorted(
        r.value for r in load_table(spark, SF_SMOKE, "events").select("value").collect()
    )
    rows = QUERIES["global_exact_quantiles"](spark, SF_SMOKE).collect()
    assert [r.p for r in rows] == list(GLOBAL_QUANTILE_PS)
    for r in rows:
        assert r.n == len(values)
        assert r.rank == math.ceil(r.p * r.n)
        assert r.value == values[r.rank - 1]


def test_benford_partitions_and_chi2(spark):
    """Digit rows partition the positive-cents stream; shares sum to 1;
    every chi2 term restates its integer count against the embedded
    Benford constant."""
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        BENFORD_P,
    )

    rows = QUERIES["benford_first_digit_audit"](spark, SF_SMOKE).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n = rows[0].n
    assert sum(r.n_obs for r in rows) == n
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-12
    assert abs(sum(BENFORD_P.values()) - 1.0) < 1e-15
    for r in rows:
        assert r.benford_p == BENFORD_P[r.digit]
        exp = n * r.benford_p
        assert r.chi2_term == (r.n_obs - exp) * (r.n_obs - exp) / exp
        assert abs(r.deviation - (r.obs_share - r.benford_p)) < 1e-18


def test_chi2_cells_partition_and_marginals(spark):
    """Cells partition the event stream; expected values reconstruct the
    marginal products; each chi2 term restates its own cell."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["chi_square_independence"](spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_obs for r in rows) == n
    assert {r.tod_block for r in rows} <= {0, 1, 2, 3}
    # expected marginals: summing expected within a row recovers the row
    # total (sum_c col_n = n cancels the /n)
    by_type: dict[str, float] = {}
    obs_by_type: dict[str, int] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.expected
        obs_by_type[r.event_type] = obs_by_type.get(r.event_type, 0) + r.n_obs
        exp = r.expected
        assert r.chi2_term == (r.n_obs - exp) * (r.n_obs - exp) / exp
    for t, s in by_type.items():
        assert abs(s - obs_by_type[t]) < 1e-6


def test_welch_t_internal_consistency(spark):
    """Halves partition the stream; variances nonnegative; Satterthwaite
    df lands in [1, n_b+n_c-2]; the flag restates the rounded t."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["welch_t_test"](spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_b + r.n_c for r in rows) == total
    for r in rows:
        # exact decimal numerators: var = var_num / (n*(n-1)) >= 0, and
        # the mean-shift numerator restates the emitted rounded means
        assert r.var_num_b >= 0 and r.var_num_c >= 0
        diff = int(r.mean_diff_num) / (r.n_b * r.n_c)
        assert abs(diff - (r.mean_base_cents - r.mean_cur_cents)) < 2e-6
        assert 1 <= r.welch_df <= r.n_b + r.n_c - 2
        assert r.mean_shifted == (abs(r.t_stat) > 1.96)


def test_cusum_telescopes_and_single_peak_value(spark):
    """Per type: cusum at the last day returns to ~0 (telescoping sum),
    the peak flag marks exactly the max |cusum| days, and daily cents
    reconcile with the raw stream."""
    rows = QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        # S_n = n*P_n - n*T = 0 exactly (rounded representation)
        assert rs[-1].cusum_cents == 0.0
        peak = max(abs(r.cusum_cents) for r in rs)
        for r in rs:
            assert r.is_peak == (abs(r.cusum_cents) == peak)
        assert sum(1 for r in rs if r.is_peak) >= 1


def test_autocorr_bounded_and_pair_counts(spark):
    """r1 in [-1, 1]; pair count is day count minus one per type."""
    rows = QUERIES["daily_autocorr_lag1"](spark, SF_SMOKE).collect()
    days = {
        (r.event_type, r.day)
        for r in QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    n_days: dict[str, int] = {}
    for t, _ in days:
        n_days[t] = n_days.get(t, 0) + 1
    for r in rows:
        assert -1.0 <= r.r1 <= 1.0
        assert r.n_pairs == n_days[r.event_type] - 1
        assert r.is_persistent == (r.r1 > 0.0)


def test_daily_corr_matrix_shape(spark):
    """Strict upper triangle over the type set; r bounded; n_days equals
    the shared-day count; self-consistency with the cusum daily table."""
    rows = QUERIES["event_type_daily_corr"](spark, SF_SMOKE).collect()
    days_per_type: dict[str, set] = {}
    for r in QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect():
        days_per_type.setdefault(r.event_type, set()).add(r.day)
    types = sorted(days_per_type)
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert {(r.type_a, r.type_b) for r in rows} == expected_pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert -1.0 <= r.r <= 1.0
        assert r.n_days == len(
            days_per_type[r.type_a] & days_per_type[r.type_b]
        )


def test_daily_mad_outliers_match_python_medians(spark):
    """Differential check: median_cents/mad_cents/robust_z reproduce
    Python's statistics.median on the same daily totals (the even-n
    average-of-middle-two definition both engines implement on the
    doubled integer lattice)."""
    import statistics as pystats

    rows = QUERIES["daily_value_mad_outliers"](spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        xs = [r.value_cents for r in rs]
        med = pystats.median(xs)
        mad = pystats.median([abs(x - med) for x in xs])
        for r in rs:
            assert r.median_cents == med
            assert r.mad_cents == mad
            if mad == 0:
                assert r.robust_z is None and r.is_outlier is False
            else:
                z = round(1.349 * (2 * r.value_cents - 2 * med) / (4 * mad), 6)
                assert r.robust_z == z
                assert r.is_outlier == (abs(z) > 3.5)


def test_mann_kendall_matches_python_recompute(spark):
    """Differential check: S, the tie-corrected variance, and z reproduce
    a direct Python recomputation from the same daily totals (taken from
    cusum_changepoint, which emits the identical daily table)."""
    import math
    from collections import Counter

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        MK_Z_CRIT,
    )

    daily: dict[str, list] = {}
    for r in QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect():
        daily.setdefault(r.event_type, []).append((r.day, r.value_cents))
    rows = {r.event_type: r for r in QUERIES["mann_kendall_trend_test"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(daily)
    for et, series in daily.items():
        xs = [x for _, x in sorted(series)]
        n = len(xs)
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
        var18 = n * (n - 1) * (2 * n + 5) - tie
        r = rows[et]
        assert r.n_days == n and r.s_stat == s and r.var_s_x18 == var18, et
        if var18 == 0:
            assert r.z is None and r.trending is False, et
        else:
            num = float(s - 1 if s > 0 else (s + 1 if s < 0 else 0))
            z = round(num / math.sqrt(var18 / 18.0), 6)
            assert r.z == z and r.trending == (abs(z) > MK_Z_CRIT), et


def test_mann_kendall_one_day_series_emits_degenerate_row(spark, tmp_path):
    """A type observed on a single day has no sign pair, so the pair
    rollup yields no row for it -- the monitor must still list it with
    the documented degenerate values instead of silently dropping it
    (ADVICE r10).  Built on a synthetic events table: one one-day type
    next to one three-day type."""
    import datetime

    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 1, "solo", 5.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 9), 1, "multi", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 2, 9), 1, "multi", 2.0, "{}"),
        (4, datetime.datetime(2024, 1, 3, 9), 1, "multi", 3.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: r
        for r in QUERIES["mann_kendall_trend_test"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"solo", "multi"}
    solo = out["solo"]
    assert solo.n_days == 1 and solo.s_stat == 0 and solo.var_s_x18 == 0
    assert solo.z is None and solo.trending is False
    assert out["multi"].n_days == 3 and out["multi"].s_stat == 3


def test_mann_whitney_matches_python_recompute(spark):
    """Differential check against a direct Python midrank recompute from
    the raw events: n1/n2, the 2x-scaled U statistic, the tie term, and
    the tie-corrected z."""
    import math
    from collections import Counter

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        MK_Z_CRIT,
        MWU_GROUP_A,
        MWU_GROUP_B,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from decimal import ROUND_HALF_UP, Decimal

    def _cents(v: float) -> int:  # F.round is HALF_UP; Python round is not
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    ev = [
        (r.event_type, _cents(r.value))
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
        if r.event_type in (MWU_GROUP_A, MWU_GROUP_B)
    ]
    xs = sorted(c for _, c in ev)
    # midrank of value v (1-based): positions of its tie block
    first = {}
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
    cnt = Counter(xs)
    midrank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    a_vals = [c for t, c in ev if t == MWU_GROUP_A]
    n1, n2 = len(a_vals), len(ev) - len(a_vals)
    r1 = sum(midrank[v] for v in a_vals)
    u1_x2 = round(2 * r1 - n1 * (n1 + 1))
    tie = sum(t**3 - t for t in cnt.values())
    n = n1 + n2
    var = (n1 * n2 / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
    z = (u1_x2 - n1 * n2) / (2.0 * math.sqrt(var))
    row = QUERIES["mann_whitney_u_test"](spark, SF_SMOKE).collect()[0]
    assert (row.n1, row.n2) == (n1, n2)
    assert row.u1_x2 == u1_x2 and row.tie_term == tie
    assert abs(row.z - z) < 1e-12
    assert abs(row.rank_biserial - (1.0 - u1_x2 / (n1 * n2))) < 1e-12
    assert row.significant == (abs(row.z) > MK_Z_CRIT)


def test_weighted_reservoir_is_exact_aes_topk(spark):
    """The emitted sample per source must be EXACTLY the top-K documents
    by the Efraimidis-Spirakis key u^(1/w) recomputed in Python from the
    same md5-derived uniforms, in the same order."""
    import hashlib
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        RESERVOIR_K,
        _RES_P,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    by_source: dict[str, list] = {}
    for r in docs:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) % _RES_P
        u = (h + 1) / 2147483648.0
        # ln squashed to 9 decimals (decimal(18,9) HALF_UP) like the plan
        from decimal import ROUND_HALF_UP, Decimal

        ln9 = float(
            Decimal(repr(math.log(u))).quantize(
                Decimal("1.000000000"), rounding=ROUND_HALF_UP
            )
        )
        by_source.setdefault(r.source, []).append((ln9 / r.n_chars, r.doc_id))
    expected = {
        src: [d for _, d in sorted(rows, key=lambda t: (-t[0], t[1]))][:RESERVOIR_K]
        for src, rows in by_source.items()
    }
    got: dict[str, list] = {}
    for r in QUERIES["weighted_reservoir_sample"](spark, SF_SMOKE).collect():
        got.setdefault(r.source, []).append((r.sample_rank, r.doc_id))
    for src, rows in got.items():
        assert [d for _, d in sorted(rows)] == expected[src], src


def test_kruskal_wallis_matches_python_recompute(spark):
    """Differential check against a direct Python pooled-midrank
    recompute from the raw events: per-group n and the 2x-scaled rank
    sum, the pooled tie term, and the tie-corrected H (to the ordered
    fold's own tolerance: the Python sum is exact-rational, the plan's
    is an ordered double fold, so compare at 1e-9 relative)."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    def _cents(v: float) -> int:
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    ev = [
        (r.event_type, _cents(r.value))
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
    ]
    xs = sorted(c for _, c in ev)
    first: dict[int, int] = {}
    for i, v in enumerate(xs):
        first.setdefault(v, i + 1)
    cnt = Counter(xs)
    # 2x midrank is always an integer: 2*first + (cnt - 1)
    midrank_x2 = {v: 2 * first[v] + (cnt[v] - 1) for v in cnt}
    groups: dict[str, list[int]] = {}
    for t, c in ev:
        groups.setdefault(t, []).append(c)
    n_total = len(ev)
    tie = sum(t**3 - t for t in cnt.values())
    s = Fraction(0)
    expect = {}
    for g, vals in groups.items():
        r_x2 = sum(midrank_x2[v] for v in vals)
        expect[g] = (len(vals), r_x2)
        s += Fraction(r_x2 * r_x2, 4 * len(vals))
    h = Fraction(12, n_total * (n_total + 1)) * s - 3 * (n_total + 1)
    h_tie = h / (1 - Fraction(tie, n_total**3 - n_total))

    rows = QUERIES["kruskal_wallis_h_test"](spark, SF_SMOKE).collect()
    assert len(rows) == len(groups)
    for r in rows:
        n_g, r_x2 = expect[r.event_type]
        assert (r.n, r.rank_sum_x2) == (n_g, r_x2), r.event_type
        assert r.n_total == n_total and r.tie_term == tie
        assert r.k_groups == len(groups)
        assert abs(r.h - float(h)) <= 1e-9 * max(1.0, abs(float(h)))
        assert abs(r.h_tie - float(h_tie)) <= 1e-9 * max(1.0, abs(float(h_tie)))
        # tie correction divides by a factor <= 1: |H_tie| >= |H| >= 0
        assert r.h >= 0 and r.h_tie >= r.h


def test_kruskal_wallis_rank_sums_cover_total(spark):
    """The pooled rank sums must re-assemble the total rank mass
    2 * (1 + ... + N) = N(N+1) exactly -- the invariant any midrank
    implementation error breaks first."""
    rows = QUERIES["kruskal_wallis_h_test"](spark, SF_SMOKE).collect()
    n = rows[0].n_total
    assert sum(r.rank_sum_x2 for r in rows) == n * (n + 1)
    for r in rows:
        # mean rank lies strictly inside [1, N]
        assert 1.0 <= r.mean_rank <= float(n)


def test_hill_tail_index_matches_python_recompute(spark):
    """Differential replay: per type, sort positive cents descending,
    take the top k+1, and recompute mean log excess / alpha with the
    same DECIMAL(18,9) per-term squash."""
    from decimal import ROUND_HALF_UP, Decimal
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        HILL_K,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    def _cents(v: float) -> int:
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    by_type: dict[str, list[int]] = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        c = _cents(r.value)
        if c > 0:
            by_type.setdefault(r.event_type, []).append(c)

    rows = QUERIES["hill_tail_index"](spark, SF_SMOKE).collect()
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        xs = sorted(by_type[r.event_type], reverse=True)[: HILL_K + 1]
        kp1 = xs[-1]
        terms = [
            Decimal(repr(math.log(x / kp1))).quantize(
                Decimal("1.000000000"), rounding=ROUND_HALF_UP
            )
            for x in xs[:-1]
        ]
        assert r.n_pos == len(by_type[r.event_type])
        assert r.k_used == len(terms)
        assert r.xkp1_cents == kp1
        s = float(sum(terms))
        if terms:
            assert r.mean_log_excess == s / len(terms)
        if s > 0:
            assert abs(r.hill_alpha - len(terms) / s) < 1e-12
            assert r.hill_alpha > 0


def test_quota_alloc_sums_to_total_and_matches_hamilton(spark):
    """The allocation must sum EXACTLY to QUOTA_TOTAL and equal a direct
    Python largest-remainder apportionment."""
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        QUOTA_TOTAL,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    counts: dict[str, int] = {}
    for r in load_table(spark, SF_SMOKE, "documents").collect():
        counts[r.source] = counts.get(r.source, 0) + 1
    n = sum(counts.values())
    base = {s: c * QUOTA_TOTAL // n for s, c in counts.items()}
    rem = {s: c * QUOTA_TOTAL % n for s, c in counts.items()}
    left = QUOTA_TOTAL - sum(base.values())
    extras = set(
        sorted(counts, key=lambda s: (-rem[s], s))[:left]
    )
    rows = QUERIES["stratified_quota_alloc"](spark, SF_SMOKE).collect()
    assert sum(r.alloc for r in rows) == QUOTA_TOTAL
    for r in rows:
        assert r.base_alloc == base[r.source]
        assert r.remainder_num == rem[r.source]
        assert r.extra_seat == (r.source in extras)
        assert r.alloc == base[r.source] + (r.source in extras)
        # Hamilton satisfies quota: alloc is floor or ceil of the
        # exact proportional share
        assert base[r.source] <= r.alloc <= base[r.source] + 1


def test_ljung_box_matches_python_recompute(spark):
    """Differential replay: exact integer ACF numerators/denominator
    from the daily series, the same DECIMAL(18,15) per-lag squash, and
    the same Q chain."""
    from decimal import ROUND_HALF_UP, Decimal
    from collections import defaultdict

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        CHI2_CRIT_95,
        LJUNG_BOX_LAGS,
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

    rows = QUERIES["ljung_box_test"](spark, SF_SMOKE).collect()
    by_type: dict[str, list] = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    assert set(by_type) == set(daily)
    for t, rs in by_type.items():
        xs = [daily[t][d] for d in sorted(daily[t])]
        n = len(xs)
        s = sum(xs)
        dev = [n * x - s for x in xs]
        den = sum(d * d for d in dev)
        q_sum = Decimal(0)
        rhos = {}
        for k in range(1, LJUNG_BOX_LAGS + 1):
            num = sum(dev[i] * dev[i - k] for i in range(k, n))
            rho = num / den if den > 0 else None
            rhos[k] = rho
            if rho is not None:
                q_sum += Decimal(repr(rho * rho / (n - k))).quantize(
                    Decimal("1." + "0" * 15), rounding=ROUND_HALF_UP
                )
        q = n * (n + 2.0) * float(q_sum)
        rs.sort(key=lambda r: r.lag)
        assert [r.lag for r in rs] == list(range(1, LJUNG_BOX_LAGS + 1))
        for r in rs:
            assert r.n_days == n
            exp_rho = rhos[r.lag]
            if exp_rho is None:
                assert r.rho is None
            else:
                assert abs(r.rho - exp_rho) < 1e-12
                assert -1.0 - 1e-12 <= r.rho <= 1.0 + 1e-12
            assert abs(r.q_stat - q) < 1e-9 * max(1.0, abs(q))
            assert r.df == LJUNG_BOX_LAGS
            assert r.significant == (r.q_stat > CHI2_CRIT_95[LJUNG_BOX_LAGS])
        assert rs[0].q_stat >= 0


def test_poisson_bootstrap_matches_independent_python(spark):
    """Differential check: recompute every replicate mean and the
    CI/SE chain in pure Python (hashlib md5 -> 31-bit lane -> affine
    variates -> pinned Poisson thresholds) and compare bit-exactly."""
    import hashlib
    import math

    from mapreduce_on_google_cloud_platform_spark.functions.hashing import (
        MINHASH_P,
    )
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        B_BOOT,
        BOOT_AB,
        BOOT_T,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    from decimal import ROUND_HALF_UP, Decimal

    def _cents(v):  # Spark round() is HALF_UP
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    per = {}
    for r in rows:
        h = (
            int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:15], 16)
            % MINHASH_P
        )
        c = _cents(r.value)
        st = per.setdefault(
            r.event_type, {"n": 0, "sx": 0, "s": [0] * B_BOOT, "m": [0] * B_BOOT}
        )
        st["n"] += 1
        st["sx"] += c
        for i, (a, b) in enumerate(BOOT_AB):
            u = (a * h + b) % MINHASH_P
            w = sum(1 for t in BOOT_T if u >= t)
            st["s"][i] += w * c
            st["m"][i] += w
    got = {
        r.event_type: r
        for r in QUERIES["poisson_bootstrap_ci"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per)
    for et, st in per.items():
        g = got[et]
        assert g.n_events == st["n"]
        assert g.mean_cents == float(st["sx"]) / float(st["n"])
        assert g.n_zero_replicates == sum(1 for m in st["m"] if m == 0)
        if g.n_zero_replicates == 0:
            ms = sorted(float(s) / float(m) for s, m in zip(st["s"], st["m"]))
            assert g.boot_lo_cents == ms[3]  # element_at(.., 4), 1-indexed
            assert g.boot_hi_cents == ms[60]
            bsum = 0.0
            bsumsq = 0.0
            for x in ms:
                bsum += x
                bsumsq += x * x
            se = math.sqrt(
                (bsumsq - bsum * bsum / float(B_BOOT)) / float(B_BOOT - 1)
            )
            assert g.boot_se_cents == se
            assert g.boot_lo_cents <= g.mean_cents + 5 * se
            assert g.boot_hi_cents >= g.mean_cents - 5 * se


def test_permutation_test_matches_independent_python(spark):
    """Differential check: recompute the observed statistic, all B_PERM
    md5 relabelings, and the add-one p-value in pure Python."""
    import hashlib

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        B_PERM,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from decimal import ROUND_HALF_UP, Decimal

    def _cents(v):
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    daily = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        daily.setdefault(r.event_type, {})
        d = daily[r.event_type]
        k = str(r.ts.date())
        d[k] = d.get(k, 0) + _cents(r.value)
    got = {
        r.event_type: r
        for r in QUERIES["permutation_test_mean_shift"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(daily)
    for et, d in daily.items():
        g = got[et]
        days = sorted(d)
        n = len(days)
        na = n // 2
        assert g.n_days == n and g.n_a == na and g.n_b == n - na
        if na == 0 or n - na == 0:
            assert g.obs_diff_cents is None
            continue
        sa = sum(d[k] for k in days[:na])
        sb = sum(d[k] for k in days[na:])
        obs = abs(
            float(sb) / float(n - na) - float(sa) / float(na)
        )
        assert g.obs_diff_cents == obs
        n_ge = 0
        for b in range(1, B_PERM + 1):
            order = sorted(
                days,
                key=lambda day: (
                    hashlib.md5(f"{et}:{day}:{b}".encode()).hexdigest(),
                    day,
                ),
            )
            psa = sum(d[k] for k in order[:na])
            psb = sum(d[k] for k in order[na:])
            stat = abs(
                float(psb) / float(n - na) - float(psa) / float(na)
            )
            if stat >= obs:
                n_ge += 1
        assert g.n_perm_ge == n_ge
        assert g.p_value == float(n_ge + 1) / float(B_PERM + 1)
        assert g.significant == (g.p_value <= 0.05)


def test_rank_correlations_match_scipy_free_python(spark):
    """Differential check: recompute Spearman rho (Pearson over
    midranks) and Kendall tau-b (pair counting) in pure Python and
    compare; also pin the analytic bounds and the Pearson/Spearman
    relationship on identical data."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from decimal import ROUND_HALF_UP, Decimal
    import math

    def _cents(v):
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    daily = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        k = (r.event_type, str(r.ts.date()))
        daily[k] = daily.get(k, 0) + _cents(r.value)
    types = sorted({t for t, _ in daily})
    series = {
        t: {d: v for (tt, d), v in daily.items() if tt == t} for t in types
    }
    got_s = {
        (r.type_a, r.type_b): r
        for r in QUERIES["spearman_daily_corr"](spark, SF_SMOKE).collect()
    }
    got_k = {
        (r.type_a, r.type_b): r
        for r in QUERIES["kendall_tau_daily"](spark, SF_SMOKE).collect()
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            common = sorted(set(series[ta]) & set(series[tb]))
            n = len(common)
            if n == 0:
                assert (ta, tb) not in got_s
                continue
            xa = [series[ta][d] for d in common]
            xb = [series[tb][d] for d in common]

            def m2(xs):
                sx = sorted(xs)
                return [
                    2 * (sx.index(v) + 1) + sx.count(v) - 1 for v in xs
                ]

            ma, mb = m2(xa), m2(xb)
            sa, sb = sum(ma), sum(mb)
            sab = sum(a * b for a, b in zip(ma, mb))
            saa = sum(a * a for a in ma)
            sbb = sum(b * b for b in mb)
            fa = float(n * saa - sa * sa)
            fb = float(n * sbb - sb * sb)
            g = got_s[(ta, tb)]
            assert g.n_days == n
            if fa > 0 and fb > 0:
                rho = float(n * sab - sa * sb) / (
                    math.sqrt(fa) * math.sqrt(fb)
                )
                assert g.rho == rho
                assert -1.0 - 1e-12 <= g.rho <= 1.0 + 1e-12
            conc = disc = tiex = tiey = npairs = 0
            for p in range(n):
                for q in range(p + 1, n):
                    npairs += 1
                    sx = (xa[q] > xa[p]) - (xa[q] < xa[p])
                    sy = (xb[q] > xb[p]) - (xb[q] < xb[p])
                    if sx * sy == 1:
                        conc += 1
                    elif sx * sy == -1:
                        disc += 1
                    if sx == 0:
                        tiex += 1
                    if sy == 0:
                        tiey += 1
            k = got_k[(ta, tb)]
            assert k.n_pairs == npairs
            assert k.n_concordant == conc
            assert k.n_discordant == disc
            if npairs - tiex > 0 and npairs - tiey > 0:
                tau = float(conc - disc) / (
                    math.sqrt(float(npairs - tiex))
                    * math.sqrt(float(npairs - tiey))
                )
                assert k.tau_b == tau
                assert -1.0 - 1e-12 <= k.tau_b <= 1.0 + 1e-12


def test_kmv_estimator_matches_python(spark):
    """Independent Python recompute of the KMV estimate: the sketch is
    the K smallest 60-bit md5 prefixes per type; below capacity it is
    declared exact."""
    import hashlib

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import KMV_K
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    seen = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        seen.setdefault(r.event_type, set()).add(r.user_id)
    got = {
        r.event_type: r
        for r in QUERIES["kmv_distinct_profile"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(seen)
    for t, users in seen.items():
        hs = sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            for u in users
        )
        g = got[t]
        assert g.n_exact == len(users)
        if len(users) <= KMV_K:
            assert g.n_kept == len(users)
            assert g.kmv_estimate == float(len(users))
            assert g.abs_rel_error == 0.0
        else:
            assert g.n_kept == KMV_K
            est = float(KMV_K - 1) * float(1 << 60) / float(hs[KMV_K - 1])
            assert g.kmv_estimate == est


def test_dedup_bloom_admission_audit_matches_python(spark):
    """Independent Python Bloom build/probe: same split, same bit
    positions, same false-positive count."""
    import hashlib

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        BLOOM_K,
        BLOOM_M_BITS,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    texts = {
        hashlib.md5(r.text.encode()).hexdigest()
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    members = {ch for ch in texts if ch[31] in "01234567"}
    probes = texts - members

    def positions(ch):
        return [
            int(
                hashlib.md5(f"{ch}|{j}".encode()).hexdigest()[4 * j : 4 * j + 4],
                16,
            )
            for j in range(BLOOM_K)
        ]

    occupied = {p for ch in members for p in positions(ch)}
    n_fp = sum(
        1 for ch in probes if all(p in occupied for p in positions(ch))
    )
    row = QUERIES["dedup_bloom_admission_audit"](spark, SF_SMOKE).collect()[0]
    assert row.n_members == len(members)
    assert row.n_probes == len(probes)
    assert row.m_bits == BLOOM_M_BITS
    assert row.n_bits_set == len(occupied)
    assert row.n_false_pos == n_fp
    assert 0.0 <= row.fill_fraction < 1.0
    assert row.predicted_fpr == row.fill_fraction**BLOOM_K


def test_pettitt_matches_bruteforce(spark):
    """Direct O(n^2)-per-split recompute of K = max_t |U_t| and the
    earliest argmax day, per event type."""
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

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
    for (t, d), x in daily.items():
        series.setdefault(t, []).append((d, x))
    got = {
        r.event_type: r
        for r in QUERIES["pettitt_changepoint_test"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(series)
    for t, pts in series.items():
        pts.sort()
        n = len(pts)
        g = got[t]
        assert g.n_days == n
        if n == 1:
            assert g.k_stat is None and g.change_day is None
            continue
        xs = [x for _, x in pts]
        best_k, best_day = -1, None
        for ti in range(n - 1):
            u = sum(
                (xs[i] > xs[j]) - (xs[i] < xs[j])
                for i in range(ti + 1)
                for j in range(ti + 1, n)
            )
            if abs(u) > best_k:
                best_k, best_day = abs(u), pts[ti][0]
        assert g.k_stat == best_k
        assert g.change_day == best_day


def test_sprt_monitor_matches_python(spark):
    """Exact decimal recompute of the cumulative LLR and the frozen
    decision stream."""
    from decimal import Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        SPRT_A,
        SPRT_B,
        SPRT_L1,
        SPRT_L2,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    daily = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        d = r.ts.date()
        n, x = daily.get(d, (0, 0))
        daily[d] = (n + 1, x + (1 if r.event_type == "purchase" else 0))
    l1, l2 = Decimal(SPRT_L1), Decimal(SPRT_L2)
    a, b = Decimal(SPRT_A), Decimal(SPRT_B)
    llr = Decimal(0)
    expect = []
    h1_day = h0_day = None
    llrs = {}
    for d in sorted(daily):
        n, x = daily[d]
        llr += x * l1 + (n - x) * l2
        llrs[d] = llr
        if llr >= a and h1_day is None:
            h1_day = d
        if llr <= b and h0_day is None:
            h0_day = d
    if h1_day is not None and (h0_day is None or h1_day <= h0_day):
        stop, verdict = h1_day, "accept_h1"
    elif h0_day is not None:
        stop, verdict = h0_day, "accept_h0"
    else:
        stop, verdict = None, None
    rows = sorted(
        QUERIES["sprt_conversion_monitor"](spark, SF_SMOKE).collect(),
        key=lambda r: r.day,
    )
    assert [r.day for r in rows] == sorted(daily)
    for r in rows:
        n, x = daily[r.day]
        assert (r.n_events, r.n_purchases) == (n, x)
        assert r.llr == float(llrs[r.day])
        if stop is None or r.day < stop:
            assert r.state == "continue"
        else:
            assert r.state == verdict


def test_neyman_allocation_sums_to_budget(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        NEYMAN_BUDGET,
    )

    rows = QUERIES["neyman_allocation"](spark, SF_SMOKE).collect()
    assert sum(r.alloc for r in rows) == NEYMAN_BUDGET
    for r in rows:
        assert r.alloc >= 0
        assert r.sd_cents >= 0.0
    # Neyman dominance: weight ordering implies allocation ordering
    # (up to the single largest-remainder seat)
    by_w = sorted(rows, key=lambda r: r.weight_int)
    for a, b in zip(by_w, by_w[1:]):
        assert a.alloc <= b.alloc + 1


def test_bh_fdr_step_up_property(spark):
    """The rejected set is exactly ranks <= k* where k* is the largest
    rank whose p-value clears its own threshold; thresholds are
    monotone in rank."""
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        BH_Q,
    )

    rows = QUERIES["benjamini_hochberg_fdr"](spark, SF_SMOKE).collect()
    scored = [r for r in rows if r.p_value is not None]
    m = scored[0].m_tests if scored else 0
    assert all(r.m_tests == m for r in rows)
    assert sorted(r.p_rank for r in scored) == list(range(1, len(scored) + 1))
    kstar = max(
        (r.p_rank for r in scored if r.p_value <= BH_Q * r.p_rank / m),
        default=0,
    )
    for r in scored:
        assert r.bh_threshold == BH_Q * r.p_rank / m
        assert r.rejected == (r.p_rank <= kstar)
    for r in rows:
        if r.p_value is None:
            assert r.rejected is None and r.p_rank is None


def _daily_series(spark):
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

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
    for (t, d), x in daily.items():
        series.setdefault(t, {})[d] = x
    return series


def test_hodges_lehmann_matches_python(spark):
    """Median of all Walsh averages (i <= j), recomputed directly."""
    series = _daily_series(spark)
    got = {
        r.event_type: r
        for r in QUERIES["hodges_lehmann_center"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(series)
    for t, by_day in series.items():
        xs = list(by_day.values())
        n = len(xs)
        walsh = sorted(
            xs[i] + xs[j] for i in range(n) for j in range(i, n)
        )
        np_ = len(walsh)
        lo = walsh[(np_ + 1) // 2 - 1]
        hi = walsh[np_ // 2]
        g = got[t]
        assert g.n_days == n
        assert g.n_pairs == np_
        assert g.hl_center_cents == (lo + hi) / 4.0


def test_friedman_matches_python(spark):
    """Doubled-midrank Friedman statistic over complete day blocks."""
    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        CHI2_CRIT_95,
    )

    series = _daily_series(spark)
    types = sorted(series)
    k = len(types)
    days = sorted(
        d
        for d in {d for s in series.values() for d in s}
        if all(d in series[t] for t in types)
    )
    sum_m2_sq = 0
    s_j = dict.fromkeys(types, 0)
    for d in days:
        vals = [(series[t][d], t) for t in types]
        svals = sorted(v for v, _ in vals)
        for v, t in vals:
            m2 = 2 * (svals.index(v) + 1) + svals.count(v) - 1
            s_j[t] += m2
            sum_m2_sq += m2 * m2
    n = len(days)
    rows = {
        r.event_type: r
        for r in QUERIES["friedman_test"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(types)
    den = sum_m2_sq - n * k * (k + 1) * (k + 1)
    num = sum((s_j[t] - n * (k + 1)) ** 2 for t in types)
    for t in types:
        r = rows[t]
        assert r.n_complete_days == n
        assert r.rank_sum2 == s_j[t]
        if den > 0:
            q = (k - 1) * num / den
            assert r.q_stat == q
            assert r.significant == (q > CHI2_CRIT_95[k - 1])
        else:
            assert r.q_stat is None


def test_brown_forsythe_matches_python(spark):
    """Exact recompute of the median-centered Levene/Brown-Forsythe W
    via the same integer/fraction decomposition."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.statistics import (
        CHI2_CRIT_95,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    data = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "events").collect():
        c = int(
            Decimal(repr(r.value * 100)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        data[r.event_type].append(c)

    def sq15(x):
        return Decimal(repr(x)).quantize(
            Decimal("1e-15"), rounding=ROUND_HALF_UP
        )

    stats = {}
    for t, xs in data.items():
        xs.sort()
        n = len(xs)
        m2 = xs[(n + 1) // 2 - 1] + xs[n // 2]
        z = [abs(2 * x - m2) for x in xs]
        stats[t] = (n, m2, sum(z), sum(v * v for v in z))
    k = len(stats)
    N = sum(n for n, *_ in stats.values())
    T = sum(S for _, _, S, _ in stats.values())
    C = sum(Q for *_, Q in stats.values())
    a_int = sum(S * S // n for n, _, S, _ in stats.values())
    a_frac = sum(
        sq15((S * S % n) / n) for n, _, S, _ in stats.values()
    )
    t_int = T * T // N
    t_frac = sq15((T * T % N) / N)
    hi = 1 << 40

    def conv(x):
        return float(x // hi) * float(hi) + float(x % hi)

    between = conv(a_int - t_int) + float(a_frac - t_frac)
    within = conv(C - a_int) - float(a_frac)
    rows = {
        r.event_type: r
        for r in QUERIES["brown_forsythe_test"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(stats)
    for t, (n, m2, S, Q) in stats.items():
        r = rows[t]
        assert (r.n_events, r.m2_cents, r.z2_sum) == (n, m2, S)
        if within > 0 and k > 1:
            w = (N - k) / (k - 1) * max(between, 0.0) / within
            assert r.w_stat == w
            assert r.significant == ((k - 1) * w > CHI2_CRIT_95[k - 1])
        else:
            assert r.w_stat is None
