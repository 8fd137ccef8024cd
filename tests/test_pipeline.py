from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle


from mapreduce_on_google_cloud_platform_spark.operators.pipeline import (
    PIPELINE_QUERIES,
)

PIPELINE_NAMES = [name for name, _, oracle in PIPELINE_QUERIES if oracle]


@pytest.mark.parametrize("name", PIPELINE_NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", PIPELINE_NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_funnel_monotone(spark):
    rows = QUERIES["curation_pipeline"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_docs_in >= r.n_pass >= r.n_kept >= 0
        assert 0.0 <= r.kept_ratio <= 1.0
        if r.n_kept > 0:
            assert r.tokens_kept > 0


def test_data_quality_audit_detects_orphans(spark, tmp_path):
    """On a doctored drop (half the orders deleted, one customer removed)
    the audit must count the induced referential orphans — proving the
    checks detect, not just report zero on clean data."""
    import shutil

    from pyspark.sql import functions as F

    doctored = tmp_path / "doctored"
    doctored.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", doctored / f"{t}.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    kept = orders.filter(F.col("o_orderkey") % 2 == 0)
    kept.write.mode("overwrite").parquet(str(doctored / "orders.parquet"))
    out = {
        r.table_name: r
        for r in QUERIES["data_quality_audit"](spark, str(doctored)).collect()
    }
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    expect_orphans = (
        li.join(kept, li.l_orderkey == kept.o_orderkey, "left_anti").count()
    )
    assert out["lineitem"].orphans == expect_orphans > 0
    assert out["orders"].n_rows == kept.count()
    assert out["customer"].orphans == 0


def test_training_prep_funnel_monotone(spark):
    """docs_in >= n_gated >= n_kept_docs per source, and the pipeline
    actually drops near-dups (kept < gated somewhere)."""
    rows = QUERIES["training_data_prep"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.docs_in >= r.n_gated >= r.n_kept_docs >= 0
        assert abs(r.kept_ratio - r.n_kept_docs / r.docs_in) < 1e-12
    assert any(r.n_kept_docs < r.n_gated for r in rows)


def test_rollup_cascade_levels_conserve_totals(spark):
    """Lossless re-aggregation: every level must conserve per-type event
    counts and cents exactly."""
    from collections import defaultdict

    rows = QUERIES["event_rollup_cascade"](spark, SF_SMOKE).collect()
    assert rows
    totals = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in rows:
        t = totals[r.level][r.event_type]
        t[0] += r.n_events
        t[1] += r.value_cents
    assert set(totals) == {"hour", "day", "week"}
    assert totals["hour"] == totals["day"] == totals["week"]


def test_observed_curation_metrics_match_independent_counts(spark):
    """df.observe() counters must reconcile exactly with the kept output
    and with the declared funnel query -- same numbers, zero extra scans."""
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import (
        curated_docs_with_observation,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    kept, obs = curated_docs_with_observation(spark, SF_SMOKE)
    rows = kept.collect()  # materializes the job -> metrics available
    m = obs.get
    assert m["docs_kept"] == len(rows)
    assert m["tokens_kept"] == sum(r.n_tokens for r in rows)
    funnel = QUERIES["curation_pipeline"](spark, SF_SMOKE).collect()
    assert m["docs_in"] == sum(r.n_docs_in for r in funnel)
    assert m["docs_pass"] == sum(r.n_pass for r in funnel)
    assert m["docs_kept"] == sum(r.n_kept for r in funnel)
    # content_hash dedup really happened in the kept corpus
    assert len({r.content_hash for r in rows}) == len(rows)


def test_sampling_weights_flatten_the_distribution(spark):
    """alpha < 1 must compress shares toward uniform: the dominant
    language's temperature share shrinks, the rarest grows, factors
    are >1 exactly for below-uniform languages; both share columns
    are probability vectors."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["language_sampling_weights"](spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-3
    top = max(rows, key=lambda r: r.raw_share)
    low = min(rows, key=lambda r: r.raw_share)
    assert top.temp_share < top.raw_share
    assert low.temp_share > low.raw_share
    uniform = 1.0 / len(rows)
    for r in rows:
        if abs(r.raw_share - uniform) > 1e-6:
            assert (r.sample_factor > 1.0) == (r.raw_share < uniform)


def test_erasure_cascade_reconciles_with_direct_counts(spark):
    """The audit's cascade counts must match independently-computed
    DuckDB counts per segment, and unattached customers (no orders)
    still appear with zero cascade rows."""
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import (
        ERASURE_STRIDE,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = {r.c_mktsegment: r for r in QUERIES["erasure_cascade_audit"](spark, SF_SMOKE).collect()}
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    direct = con.execute(f"""
        SELECT c_mktsegment, count(DISTINCT c_custkey),
               count(DISTINCT o_orderkey), count(l_orderkey)
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        LEFT JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_custkey % {ERASURE_STRIDE} = 0
        GROUP BY 1
    """).fetchall()
    assert {seg for seg, *_ in direct} == set(rows)
    for seg, nc, no, nl in direct:
        r = rows[seg]
        assert (r.n_customers, r.n_orders, r.n_lineitems) == (nc, no, nl)
        if nl == 0:
            assert r.revenue_removed == 0.0
        else:
            assert r.revenue_removed > 0.0


def test_l_diversity_flags_homogeneous_cells(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import (
        L_DIVERSITY,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["l_diversity_report"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_sensitive_values <= r.n_rows
        assert r.l_diverse == (r.n_sensitive_values >= L_DIVERSITY)
        assert 0.0 < r.dominant_share <= 1.0
        # the dominant value's share can't fall below uniform
        assert r.dominant_share >= round(1.0 / r.n_sensitive_values, 6) - 1e-9


def test_weekly_wow_reconciles_with_itself(spark):
    """lag/delta/ratio are internally consistent and the first week of
    each type has no prior."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["weekly_value_wow"](spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for seq in by_type.values():
        assert seq[0].prev_value_cents is None
        for prev, cur in zip(seq, seq[1:]):
            assert cur.prev_value_cents == prev.value_cents
            assert cur.delta_cents == cur.value_cents - prev.value_cents
            assert cur.wow_ratio == round(cur.value_cents / prev.value_cents, 6)


def test_embedding_alignment_audit_is_consistent(spark):
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    (r,) = QUERIES["embedding_alignment_audit"](spark, SF_SMOKE).collect()
    assert r.n_matched == r.n_docs - r.docs_without_vec
    assert r.n_matched <= min(r.n_docs, r.n_vecs)
    assert r.aligned == (r.docs_without_vec == 0 and r.vecs_without_doc == 0)


def test_source_frequency_cap_invariants(spark):
    """Cap is exact: no source keeps more than SOURCE_CAP docs;
    kept + dropped partitions each source; a source under the cap
    keeps everything."""
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import SOURCE_CAP

    rows = QUERIES["source_frequency_cap"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_kept <= SOURCE_CAP
        assert r.n_kept + r.n_dropped == r.n_docs
        if r.n_docs <= SOURCE_CAP:
            assert r.n_kept == r.n_docs and r.kept_rate == 1.0


def test_lang_token_budget_selection_invariants(spark):
    """Kept token mass never exceeds the budget; adding the next
    (largest unkept) doc would always overflow it -- i.e. the selection
    is maximal under the longest-first order."""
    rows = QUERIES["lang_token_budget_selection"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.kept_tokens <= r.budget_tokens
        assert r.kept_docs <= r.n_docs
        assert r.budget_tokens == r.lang_tokens * 1 // 2


def test_corpus_source_lang_matrix_partitions(spark):
    """Cells partition the corpus; shares sum to 1 per source and
    overall."""
    from collections import defaultdict

    import duckdb

    rows = QUERIES["corpus_source_lang_matrix"](spark, SF_SMOKE).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    by_src = defaultdict(float)
    for r in rows:
        by_src[r.source] += r.share_of_source
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-3, src
    assert abs(sum(r.share_of_corpus for r in rows) - 1.0) < 1e-3


def test_source_quality_decision_restates_ratios(spark):
    """The decision column must agree with the integer thresholds
    recomputed from the emitted ratios' exact numerators."""
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import SOURCE_CAP

    rows = QUERIES["source_quality_decision"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        low = r.stop_ratio < 0.05 or r.alpha_ratio < 0.40
        if low:
            # ratios are rounded; the in-plan decision uses exact integers,
            # so only assert agreement away from the rounding seam
            if abs(r.stop_ratio - 0.05) > 1e-5 and abs(r.alpha_ratio - 0.4) > 1e-5:
                assert r.decision == "drop", r
        elif r.n_docs > SOURCE_CAP:
            assert r.decision == "downsample", r
        else:
            if abs(r.stop_ratio - 0.05) > 1e-5 and abs(r.alpha_ratio - 0.4) > 1e-5:
                assert r.decision in ("keep", "downsample"), r


def test_t_closeness_matches_direct_tvd(spark):
    """TVD recomputed directly from the joined rows (python, exact
    fractions) must equal the emitted value to its rounding, and the
    verdict must restate the 0.2 threshold."""
    from collections import Counter
    from fractions import Fraction

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    cust = {r.c_custkey: (r.c_mktsegment, r.c_nationkey)
            for r in load_table(spark, SF_SMOKE, "customer").collect()}
    nations = {r.n_nationkey: r.n_name
               for r in load_table(spark, SF_SMOKE, "nation").collect()}
    rows = []
    for o in load_table(spark, SF_SMOKE, "orders").collect():
        seg, nk = cust[o.o_custkey]
        rows.append((seg, nations[nk], o.o_orderpriority))
    glob = Counter(v for _, _, v in rows)
    n_total = len(rows)
    groups: dict[tuple, Counter] = {}
    for seg, nat, v in rows:
        groups.setdefault((seg, nat), Counter())[v] += 1
    got = QUERIES["t_closeness_report"](spark, SF_SMOKE).collect()
    assert len(got) == len(groups)
    for r in got:
        cnts = groups[(r.segment, r.nation)]
        n = sum(cnts.values())
        assert n == r.n_rows
        tvd = sum(
            abs(Fraction(cnts.get(v, 0), n) - Fraction(g, n_total))
            for v, g in glob.items()
        ) / 2
        assert abs(r.tvd - round(float(tvd), 6)) < 1e-9
        assert r.t_close == (tvd <= Fraction(1, 5))


def test_source_policy_apply_executes_decisions(spark):
    """Funnel must restate the decision semantics exactly: keep -> all,
    drop -> none, downsample -> min(SOURCE_CAP, docs_in)."""
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import SOURCE_CAP

    dec = {
        r.source: r.decision
        for r in QUERIES["source_quality_decision"](spark, SF_SMOKE).collect()
    }
    rows = QUERIES["source_policy_apply"](spark, SF_SMOKE).collect()
    assert {r.source for r in rows} == set(dec)
    for r in rows:
        assert r.decision == dec[r.source]
        if r.decision == "keep":
            assert r.docs_out == r.docs_in
        elif r.decision == "drop":
            assert r.docs_out == 0 and r.chars_out == 0
        else:
            assert r.docs_out == min(SOURCE_CAP, r.docs_in)


def test_mixture_curve_alpha1_is_identity_and_matches_weights(spark):
    """alpha=1 leaves the mixture unchanged (temp_share==raw_share,
    factor ~1); each alpha's shares sum to ~1; the SAMPLING_ALPHA slice
    reproduces language_sampling_weights exactly."""
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import (
        SAMPLING_ALPHA,
    )

    rows = QUERIES["mixture_temperature_curve"](spark, SF_SMOKE).collect()
    by_alpha: dict[float, list] = {}
    for r in rows:
        by_alpha.setdefault(r.alpha, []).append(r)
    for alpha, rs in by_alpha.items():
        assert abs(sum(r.temp_share for r in rs) - 1.0) < 1e-4
        if alpha == 1.0:
            for r in rs:
                assert abs(r.temp_share - r.raw_share) <= 2e-6
                assert abs(r.sample_factor - 1.0) < 1e-4
    weights = {
        r.lang: (r.temp_share, r.sample_factor)
        for r in QUERIES["language_sampling_weights"](spark, SF_SMOKE).collect()
    }
    for r in by_alpha[SAMPLING_ALPHA]:
        assert (r.temp_share, r.sample_factor) == weights[r.lang]
    # temperature flattens: lower alpha gives the rarest language a
    # strictly larger boost
    rare = min(by_alpha[1.0], key=lambda r: r.n_docs).lang
    factors = [
        next(r.sample_factor for r in rs if r.lang == rare)
        for a, rs in sorted(by_alpha.items())
    ]
    assert factors == sorted(factors, reverse=True)


def test_source_epochs_plan_conserves_budget(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import (
        EPOCHS_BUDGET_MULT,
        EPOCHS_CAP,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["source_epochs_plan"](spark, SF_SMOKE).collect()
    total = sum(r.source_tokens for r in rows)
    assert all(r.budget_tokens == EPOCHS_BUDGET_MULT * total for r in rows)
    # shares are normalized distributions (up to round(6) residue)
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    # the planned draws (epochs_s * tokens_s) re-assemble the budget
    drawn = sum(r.epochs * r.source_tokens for r in rows)
    assert abs(drawn - EPOCHS_BUDGET_MULT * total) / total < 1e-3
    for r in rows:
        assert r.epochs > 0
        assert r.over_cap == (r.epochs > EPOCHS_CAP)
    # Provable properties of temperature flattening (alpha < 1), not the
    # folk claim "upsampling only below the mean" (false for skewed share
    # vectors, e.g. p=(0.59,0.40,0.01) upsamples the 0.40 source):
    # 1. the LARGEST raw share is never upsampled (p_max^a / sum p_i^a
    #    <= p_max because sum (p_i/p_max)^a >= sum (p_i/p_max) = 1/p_max)
    by_raw = sorted(rows, key=lambda r: r.raw_share)
    assert by_raw[-1].temp_share <= by_raw[-1].raw_share + 1e-6
    # 2. ... and the SMALLEST is never downsampled (dual argument)
    assert by_raw[0].temp_share >= by_raw[0].raw_share - 1e-6
    # 3. temperature preserves the share ORDER while compressing ratios:
    #    p_i < p_j  =>  q_i <= q_j  and  q_i/q_j >= p_i/p_j
    for lo, hi in zip(by_raw, by_raw[1:]):
        assert lo.temp_share <= hi.temp_share + 1e-6
        if lo.raw_share > 0 and hi.temp_share > 0:
            assert (
                lo.temp_share / hi.temp_share
                >= lo.raw_share / hi.raw_share - 1e-6
            )


def test_dp_sensitivity_matches_python_recompute(spark):
    """Sensitivity bounds reproduce a direct Python rollup of the raw
    events, and the dominance share is consistent with them."""
    from collections import defaultdict

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from decimal import ROUND_HALF_UP, Decimal

    def _cents(v: float) -> int:  # F.round is HALF_UP; Python round is not
        return int(
            Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    per = defaultdict(lambda: defaultdict(lambda: defaultdict(int)))
    for r in load_table(spark, SF_SMOKE, "events").collect():
        per[r.event_type][r.user_id][r.ts.date()] += _cents(r.value)
    rows = {r.event_type: r for r in QUERIES["dp_sensitivity_audit"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(per)
    for et, users in per.items():
        totals = sorted(sum(d.values()) for d in users.values())
        max_day = max(c for d in users.values() for c in d.values())
        r = rows[et]
        assert r.n_users == len(users)
        assert r.max_user_day_cents == max_day
        assert r.max_user_total_cents == totals[-1]
        assert abs(r.top_user_share - totals[-1] / sum(totals)) < 1e-12
        # exact interpolated percentile (quantile_summary definition)
        idx = 0.95 * (len(totals) - 1)
        lo, hi = int(idx), min(int(idx) + 1, len(totals) - 1)
        p95 = totals[lo] + (idx - lo) * (totals[hi] - totals[lo])
        assert abs(r.p95_user_total_cents - p95) < 1e-6


def test_stump_gain_bounded_by_feature_mi(spark):
    """Information-theoretic coarsening inequality: the best binary
    split's information gain cannot exceed the mutual information of
    the full 16-bin partition (a stump is a coarsening of the bins),
    and both are non-negative; rates and ranks are well-formed."""
    stumps = {
        r.feature: r
        for r in QUERIES["decision_stump_learn"](spark, SF_SMOKE).collect()
    }
    mis = {
        r.feature: r
        for r in QUERIES["feature_label_mutual_info"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(stumps) == set(mis) == {
        "alpha_ratio",
        "avg_token_len",
        "distinct_ratio",
        "stop_ratio",
    }
    assert sorted(r.gain_rank for r in stumps.values()) == [1, 2, 3, 4]
    for feat, s in stumps.items():
        m = mis[feat]
        assert s.gain_nats >= 0.0
        assert m.mi_nats >= -1e-12
        # picogrid slack: both sides quantized to 1e-12
        assert s.gain_nats <= m.mi_nats + 1e-9
        assert 0.0 <= m.mi_nats <= m.h_label_nats + 1e-9
        assert s.n_left + s.n_right == m.n_docs
        assert 1 <= s.best_t <= 15
        for rate in (s.pos_rate_left, s.pos_rate_right):
            if rate is not None:
                assert 0.0 <= rate <= 1.0


def test_mi_label_matches_neardup_ground_truth(spark):
    """The stump/MI label must be exactly the set of docs participating
    in an exact n-gram Jaccard pair at the declared threshold."""
    from mapreduce_on_google_cloud_platform_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        jaccard_pairs_indexed,
    )

    pairs = (
        jaccard_pairs_indexed(spark, SF_SMOKE)
        .filter("jaccard >= {}".format(JACCARD_THRESHOLD))
        .collect()
    )
    dup_ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    m = QUERIES["feature_label_mutual_info"](spark, SF_SMOKE).collect()[0]
    assert m.n_dup == len(dup_ids)
    assert m.n_dup > 0, "fixture must carry near-dup signal"


def test_isotonic_fit_matches_pav_stack(spark):
    """The minimax-grid antitonic fit must equal the classic
    pool-adjacent-violators stack run in pure Python on the same
    histogram (weighted-L2 optimal antitonic fit is unique), and must
    be non-increasing."""
    rows = QUERIES["isotonic_dup_rate_fit"](spark, SF_SMOKE).collect()
    assert rows
    # non-increasing in bin
    rates = [r.antitonic_rate for r in sorted(rows, key=lambda r: r.bin)]
    for a, b in zip(rates, rates[1:]):
        assert a >= b - 1e-12
    # PAV on the REVERSED bins gives the isotonic fit, i.e. antitonic
    # in original order: merge adjacent violators with weighted means
    hist = [(r.bin, r.n_dup, r.n_docs) for r in sorted(rows, key=lambda r: r.bin)]
    blocks = []  # (pos_sum, tot_sum) over reversed order
    for _, pos, tot in reversed(hist):
        blocks.append([pos, tot])
        while len(blocks) >= 2:
            (p2, t2), (p1, t1) = blocks[-1], blocks[-2]
            if p2 / t2 < p1 / t1:  # violator in reversed (isotonic) order
                blocks.pop()
                blocks[-1] = [p1 + p2, t1 + t2]
            else:
                break
    # expand blocks back to per-bin values
    expanded = []
    i = 0
    for p, t in blocks:
        # count how many original bins the block covers by re-walking
        acc_t = 0
        covered = 0
        for _, _, tot in list(reversed(hist))[i:]:
            acc_t += tot
            covered += 1
            if acc_t == t:
                break
        expanded.extend([p / t] * covered)
        i += covered
    pav_antitonic = list(reversed(expanded))
    for got, want in zip(rates, pav_antitonic):
        assert abs(got - want) < 1e-12, (rates, pav_antitonic)


def test_loo_influence_identities(spark):
    """LOO influence closed-form identities: influences are consistent
    with per-source means (sum over sources of n_s*(mean_s -
    corpus_mean) = 0 on the picogrid), removing an above-average source
    has positive influence, and ranks are a permutation."""
    rows = QUERIES["source_loo_influence"](spark, SF_SMOKE).collect()
    assert rows
    n_all = sum(r.n_docs for r in rows)
    corpus_mean = sum(r.mean_quality * r.n_docs for r in rows) / n_all
    assert sorted(r.influence_rank for r in rows) == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        if r.influence is None:
            continue
        # influence sign matches whether the source is above the mean
        if r.mean_quality > corpus_mean + 1e-9:
            assert r.influence > 0
        if r.mean_quality < corpus_mean - 1e-9:
            assert r.influence < 0
        # closed form: influence = n_s*(mean_s - mean_all)/(N - n_s)
        want = (
            r.n_docs * (r.mean_quality - corpus_mean) / (n_all - r.n_docs)
        )
        assert abs(r.influence - want) < 1e-9
