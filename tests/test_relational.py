from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.relational import (
    RELATIONAL_QUERIES,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, o in RELATIONAL_QUERIES if o is not None]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_rfm_approx_tracks_exact_scoring(spark):
    """The sort-free sketch path must agree with the exact ntile path:
    every score within one quintile; the continuous metric (monetary,
    ties ~impossible) >=99% exactly equal; and any exact-score
    disagreement may occur ONLY at a tied metric value -- ntile splits
    equal values across bins by the c_custkey tie-break (an arbitrary
    distinction between identical customers), while the sketch bins ties
    consistently.  A broken bounds join would violate all three."""
    from collections import Counter

    from mapreduce_on_google_cloud_platform_spark.operators.relational import (
        _rfm_scores_approx,
    )

    exact = {
        r.c_custkey: (r.r_score, r.f_score, r.m_score)
        for r in QUERIES["customer_rfm_features"](spark, SF_ORACLE).collect()
    }
    rows = _rfm_scores_approx(spark, SF_ORACLE).collect()
    assert len(rows) == len(exact)
    tie_count = {
        m: Counter(getattr(r, m) for r in rows)
        for m in ("recency_days", "frequency", "monetary")
    }
    m_same = 0
    for r in rows:
        e = exact[r.c_custkey]
        approx = (r.r_score, r.f_score, r.m_score)
        for (a, b), metric in zip(
            zip(approx, e), ("recency_days", "frequency", "monetary")
        ):
            assert abs(a - b) <= 1, f"{r.c_custkey} {metric}: {a} vs {b}"
            if a != b:
                assert tie_count[metric][getattr(r, metric)] > 1, (
                    f"{r.c_custkey} {metric} disagrees on an untied value"
                )
        m_same += approx[2] == e[2]
    assert m_same / len(rows) >= 0.99


def test_skew_profile_shares_and_factor(spark):
    """Top keys are count-descending; shares/factors restate the integer
    ratios; max_cnt matches the first row's count."""
    rows = QUERIES["join_key_skew_profile"](spark, SF_SMOKE).collect()
    assert rows
    assert rows[0].cnt == rows[0].max_cnt
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert abs(r.share - round(r.cnt / r.total_rows, 6)) < 1e-9
        assert abs(r.skew_factor - round(r.cnt * r.n_keys / r.total_rows, 6)) < 1e-9


def test_copurchase_pairs_canonical_and_thresholded(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.relational import (
        MIN_COPURCHASE,
    )

    rows = QUERIES["copurchase_part_pairs"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_orders_together >= MIN_COPURCHASE


def test_negative_samples_never_interacted(spark):
    """Every emitted negative must be absent from the positive
    interaction set, with at most NEG_PER_CUSTOMER probes per customer."""
    from collections import Counter

    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.operators.relational import (
        NEG_PER_CUSTOMER,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    positives = {
        (r.custkey, r.partkey)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
        .collect()
    }
    rows = QUERIES["negative_sampling_pairs"](spark, SF_SMOKE).collect()
    assert rows
    per_cust = Counter()
    for r in rows:
        assert (r.custkey, r.partkey) not in positives
        per_cust[r.custkey] += 1
    assert max(per_cust.values()) <= NEG_PER_CUSTOMER


def test_order_backlog_sweep_reconciles(spark):
    """The +1/-1 sweep must conserve orders: total opened == total
    closed == order count (every order eventually ships fully in this
    schema), backlog is always >= 0, and the final boundary day drains
    the backlog to zero."""
    from .conftest import SF_SMOKE

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    rows = QUERIES["order_backlog_daily"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    # only orders WITH line items have a fulfillment lifecycle (the
    # synthetic data has a few lineitem-less orders, excluded by design)
    n_orders = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{SF_SMOKE}/orders.parquet') o
        SEMI JOIN read_parquet('{SF_SMOKE}/lineitem.parquet') l
        ON o.o_orderkey = l.l_orderkey""").fetchone()[0]
    assert sum(r.n_opened for r in rows) == n_orders
    assert sum(r.n_closed for r in rows) == n_orders
    for r in rows:
        assert r.backlog >= 0
    assert rows[-1].backlog == 0


def test_join_cardinality_estimate_is_exact(spark):
    """The estimate IS the actual join cardinality -- check both
    specimen joins by running them."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = {r.join_name: r for r in QUERIES["join_cardinality_estimate"](spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    events = load_table(spark, SF_SMOKE, "events")
    ol = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    assert rows["orders_lineitem"].join_rows == ol
    e2 = events.alias("a").join(events.alias("b"), "user_id").count()
    assert rows["events_self_user"].join_rows == e2


def test_copurchase_rules_restate_counts(spark):
    """Every directed rule's support/confidence/lift must restate the
    integer counts recomputed directly; both directions of each frequent
    pair appear."""
    from collections import Counter

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    items = {
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    }
    n_part = Counter(p for _, p in items)
    baskets = len({o for o, _ in items})
    pairs = {
        (r.part_a, r.part_b): r.n_orders_together
        for r in QUERIES["copurchase_part_pairs"](spark, SF_SMOKE).collect()
    }
    rows = QUERIES["copurchase_rules"](spark, SF_SMOKE).collect()
    assert len(rows) == 2 * len(pairs)
    for r in rows:
        key = (min(r.antecedent, r.consequent), max(r.antecedent, r.consequent))
        n_ab = pairs[key]
        assert r.n_ab == n_ab
        assert abs(r.support - round(n_ab / baskets, 6)) < 1e-9
        assert abs(r.confidence - round(n_ab / n_part[r.antecedent], 6)) < 1e-9
        assert abs(
            r.lift
            - round(
                n_ab * baskets / (n_part[r.antecedent] * n_part[r.consequent]),
                6,
            )
        ) < 1e-9


def test_gini_internal_consistency(spark):
    """Gini in [0,1); shares nested (top1 <= top10 <= 1, bottom50 <= 1);
    total reconciles with the raw order stream in cents."""
    from decimal import Decimal

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    r = QUERIES["customer_spend_gini"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert 0.0 < r.top1pct_share <= r.top10pct_share <= 1.0
    assert 0.0 <= r.bottom50pct_share <= 1.0
    # bottom half can never out-earn the top half
    assert r.bottom50pct_share <= 0.5 + 1e-9
    orders = load_table(spark, SF_SMOKE, "orders")
    total = orders.selectExpr(
        "cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)) as bigint) t"
    ).collect()[0].t
    assert r.total_cents == total
    n = orders.select("o_custkey").distinct().count()
    assert r.n_customers == n


def test_basket_profile_partitions_orders(spark):
    """Buckets partition the order set; revenue shares sum to ~1; the
    total item mass reconciles with the lineitem row count."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["order_basket_profile"](spark, SF_SMOKE).collect()
    li = load_table(spark, SF_SMOKE, "lineitem")
    assert sum(r.total_items for r in rows) == li.count()
    assert sum(r.n_orders for r in rows) == li.select("l_orderkey").distinct().count()
    assert abs(sum(r.order_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 2 ** r.bucket <= r.min_items <= r.max_items < 2 ** (r.bucket + 1)


def test_pareto_frontier_matches_dominance_bruteforce(spark):
    """The bin-decomposed skyline must equal the NOT-EXISTS dominance
    DEFINITION brute-forced in Python: p survives iff no q has
    spend >= AND orders >= with at least one strict."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    stats = {}
    for r in (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("s"))
        .collect()
    ):
        stats[r.o_custkey] = (r.s, r.n)
    pts = list(stats.values())
    expected = {
        c
        for c, (s, n) in stats.items()
        if not any(
            qs >= s and qn >= n and (qs > s or qn > n) for qs, qn in pts
        )
    }
    rows = QUERIES["pareto_frontier_customers"](spark, SF_SMOKE).collect()
    assert {r.c_custkey for r in rows} == expected
    for r in rows:
        assert (r.spend_cents, r.n_orders) == stats[r.c_custkey]
        assert r.total_spend == r.spend_cents / 100.0
    # frontier is an anti-chain: sorted by spend desc, orders strictly rise
    by_spend = sorted(rows, key=lambda r: (-r.spend_cents, r.n_orders))
    for a, b in zip(by_spend, by_spend[1:]):
        if a.spend_cents > b.spend_cents:
            assert b.n_orders > a.n_orders


def test_cofilter_matches_python_topk(spark):
    """Item-item CF: emitted neighbor lists are exactly the per-item
    top-k of the brute-force cosine table over customer incidence sets
    (ties by neighbor id), with exact co-counts."""
    import hashlib
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.relational import (
        COFILTER_CUST_CAP,
        COFILTER_TOPK,
        MIN_COFILTER_CO,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    raw = {
        (r.o_custkey, r.l_partkey)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    }
    # the per-customer incidence cap (VERDICT r11 item #1): keep the
    # COFILTER_CUST_CAP smallest parts by (md5("cust:part"), part)
    by_cust: dict[int, list] = {}
    for c, p in raw:
        by_cust.setdefault(c, []).append(p)
    inc = set()
    for c, parts_c in by_cust.items():
        parts_c.sort(
            key=lambda p: (
                hashlib.md5(f"{c}:{p}".encode()).hexdigest(),
                p,
            )
        )
        for p in parts_c[:COFILTER_CUST_CAP]:
            inc.add((c, p))
    custs: dict[int, set] = {}
    for c, p in inc:
        custs.setdefault(p, set()).add(c)
    scored: dict[int, list] = {}
    parts = sorted(custs)
    for i, pa in enumerate(parts):
        for pb in parts[i + 1 :]:
            co = len(custs[pa] & custs[pb])
            if co >= MIN_COFILTER_CO:
                cos = co / (math.sqrt(len(custs[pa])) * math.sqrt(len(custs[pb])))
                scored.setdefault(pa, []).append((cos, pb, co))
                scored.setdefault(pb, []).append((cos, pa, co))
    expected = {
        p: [(n, c) for _, n, c in sorted(lst, key=lambda t: (-t[0], t[1]))][
            :COFILTER_TOPK
        ]
        for p, lst in scored.items()
    }
    got: dict[int, list] = {}
    for r in QUERIES["item_item_cofilter_topk"](spark, SF_SMOKE).collect():
        got.setdefault(r.part, []).append((r.nbr_rank, r.neighbor, r.co))
    assert set(got) == set(expected)
    for p, rows in got.items():
        rows.sort()
        assert [(n, c) for _, n, c in rows] == expected[p], p


def test_audience_overlap_matches_python_recompute(spark):
    """Differential replay from raw events: user sets per type, all
    unordered pairs including zero-overlap ones."""
    from itertools import combinations

    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    users: dict[str, set] = {}
    for r in load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    ).collect():
        users.setdefault(r.event_type, set()).add(r.user_id)
    expected = {}
    for a, b in combinations(sorted(users), 2):
        both = len(users[a] & users[b])
        expected[(a, b)] = (len(users[a]), len(users[b]), both)
    rows = QUERIES["audience_overlap_matrix"](spark, SF_SMOKE).collect()
    assert {(r.type_a, r.type_b) for r in rows} == set(expected)
    for r in rows:
        na, nb, both = expected[(r.type_a, r.type_b)]
        assert (r.users_a, r.users_b, r.users_both) == (na, nb, both)
        assert r.jaccard == both / (na + nb - both)
        assert r.overlap_coef == both / min(na, nb)
        # set-theory invariants
        assert 0 <= r.users_both <= min(na, nb)
        assert r.jaccard <= r.overlap_coef
