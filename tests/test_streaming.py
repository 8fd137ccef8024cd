from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES
from mapreduce_on_google_cloud_platform_spark.streaming import STREAMING_QUERIES
from mapreduce_on_google_cloud_platform_spark.streaming.windows import (
    streaming_session_query,
    streaming_tumbling_query,
)

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, _ in STREAMING_QUERIES]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


@pytest.mark.slow
def test_streaming_tumbling_equals_batch(spark):
    """Run the REAL Structured Streaming pipeline (readStream -> watermark ->
    window agg -> memory sink) to completion and compare with the batch twin."""
    stream = streaming_tumbling_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_tumbling")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM stream_tumbling").collect()
        )
    finally:
        q.stop()
    want = sorted(
        tuple(r) for r in QUERIES["tumbling_window_events"](spark, SF_SMOKE).collect()
    )
    assert got == want


@pytest.mark.slow
def test_streaming_session_window_runs(spark):
    """Native session_window streaming plan: sessions must cover every event
    and respect the gap (compared against the batch lag+cumsum session count)."""
    stream = streaming_session_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, session_start_us, n_events FROM stream_sessions"
        ).collect()
    finally:
        q.stop()
    batch = QUERIES["session_windows_users"](spark, SF_SMOKE).collect()
    # identical session starts and sizes per user
    assert sorted((r.user_id, r.session_start_us, r.n_events) for r in got) == sorted(
        (r.user_id, r.session_start_us, r.n_events) for r in batch
    )


@pytest.mark.slow
def test_stateful_user_totals_matches_batch(spark):
    """Custom stateful operator (applyInPandasWithState): run the stream to
    completion; the FINAL state per user (update-mode memory sink keeps every
    emission; take the last per user) must equal the batch aggregation."""
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        batch_user_totals,
        streaming_user_totals_query,
    )

    stream = streaming_user_totals_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stream_user_totals").collect()
    finally:
        q.stop()
    # update mode re-emits a key each batch it's touched; the final emission
    # per key carries the complete state
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.total_value, r.last_us)
    want = {
        r.user_id: (r.n_events, r.total_value, r.last_us)
        for r in batch_user_totals(spark, SF_SMOKE).collect()
    }
    assert set(final) == set(want)
    for uid, (n, total, last) in want.items():
        gn, gtotal, glast = final[uid]
        assert gn == n and glast == last
        assert abs(gtotal - total) < 1e-6 * max(1.0, abs(total))


@pytest.mark.slow
def test_streaming_dedup_matches_batch_distinct(spark):
    """Streaming dropDuplicates must emit exactly the batch DISTINCT key
    set (each key once, no duplicates, none missing)."""
    from mapreduce_on_google_cloud_platform_spark.streaming.windows import (
        streaming_dedup_query,
    )

    stream = streaming_dedup_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r.user_id, r.event_type)
            for r in spark.sql("SELECT * FROM stream_dedup").collect()
        ]
    finally:
        q.stop()
    assert len(got) == len(set(got)), "streaming dedup emitted duplicates"
    want = {
        (r.user_id, r.event_type)
        for r in QUERIES["user_event_type_distinct"](spark, SF_SMOKE).collect()
    }
    assert set(got) == want


@pytest.mark.slow
def test_streaming_enrichment_matches_batch(spark):
    """Stream-static join: streaming result (complete mode) must equal
    the batch twin exactly."""
    from mapreduce_on_google_cloud_platform_spark.streaming.windows import (
        streaming_enrichment_query,
    )

    stream = streaming_enrichment_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_enrich")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM stream_enrich").collect()
        )
    finally:
        q.stop()
    want = sorted(
        tuple(r)
        for r in QUERIES["enriched_purchases_by_tier"](spark, SF_SMOKE).collect()
    )
    assert got == want and got


@pytest.mark.slow
def test_foreachbatch_snapshot_merge_converges(spark, tmp_path):
    """Stream the purchase events in 4 micro-batches through the
    foreachBatch MERGE; the final versioned snapshot must equal the batch
    latest-purchase-per-user twin, and multiple batches must actually
    have been folded (i.e. the merge ran incrementally, not once)."""
    from mapreduce_on_google_cloud_platform_spark.streaming.incremental import (
        purchase_snapshot_latest,
        run_snapshot_maintenance,
    )

    snap_dir, n_batches = run_snapshot_maintenance(
        spark, SF_SMOKE, str(tmp_path)
    )
    assert n_batches >= 2

    got = sorted(
        (r.user_id, r.event_id, r.ts, r.value)
        for r in spark.read.parquet(snap_dir).collect()
    )
    want = sorted(
        (r.user_id, r.event_id, r.ts, r.value)
        for r in purchase_snapshot_latest(spark, SF_SMOKE).collect()
    )
    assert got == want


@pytest.mark.slow
def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """The watermark contract itself: after the watermark advances, a row
    older than (watermark - window) must be DROPPED, while on-time
    windows finalize and append.  Drives two explicit micro-batches so
    the watermark position between them is deterministic."""
    import datetime as dt

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=m)) for i, m in rows],
            "event_id long, ts timestamp",
        )

    # batch 1: 10:00 .. 10:59 -> watermark after it: 10:59 - 5min = 10:54
    mk([(i, i) for i in range(60)]).coalesce(1).write.mode("append").parquet(in_dir)

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_drop_check")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one LATE row (9:00, window end 09:10 << watermark 10:54)
        # and one on-time row (11:30) that pushes the watermark forward so
        # every 10:xx window finalizes.
        mk([(1000, -60), (1001, 90)]).coalesce(1).write.mode("append").parquet(
            in_dir
        )
        q.processAllAvailable()
        mk([(2000, 180)]).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r.ws: r.n for r in spark.sql("SELECT * FROM late_drop_check").collect()}
    # the late 09:00 row must NOT have produced a window
    assert t0 - dt.timedelta(minutes=60) not in out
    # every on-time 10:xx window finalized with its full count
    for m in range(0, 60, 10):
        assert out[t0 + dt.timedelta(minutes=m)] == 10


@pytest.mark.slow
def test_stream_stream_interval_join_matches_batch(spark):
    """Drain the purchase x view stream-stream interval join and compare
    the emitted (purchase, view) pairs against the static inner join with
    the identical condition."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.joins import (
        streaming_purchase_view_join_query,
    )

    q = (
        streaming_purchase_view_join_query(spark, SF_SMOKE)
        .writeStream.format("memory")
        .queryName("ss_join_check")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.event_id, r.v_id)
        for r in spark.sql("SELECT * FROM ss_join_check").collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("ts"))
    )
    want = {
        (r.event_id, r.v_id) for r in p.join(v, cond, "inner").collect()
    }
    assert got == want and len(want) > 0


@pytest.mark.slow
def test_checkpoint_restart_resumes_without_reprocessing(spark, tmp_path):
    """Durability contract: stop a file-source query, add data, restart
    from the SAME checkpoint -- the new query must process only the new
    file (offsets resumed), and the union of outputs must cover all rows
    exactly once."""
    import datetime as dt

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i, t0 + dt.timedelta(seconds=i)) for i in range(lo, hi)],
            "event_id long, ts timestamp",
        )

    out_dir = str(tmp_path / "out")
    mk(0, 100).coalesce(1).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(in_dir)
            .select("event_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    first = {r.event_id for r in spark.read.parquet(out_dir).collect()}
    assert first == set(range(100))

    mk(100, 150).coalesce(1).write.mode("append").parquet(in_dir)
    run_once()
    rows = [r.event_id for r in spark.read.parquet(out_dir).collect()]
    # resumed from the checkpoint: every row exactly once, no replay of
    # the first file and no gap (the file sink's transaction log + the
    # source's committed offsets together give exactly-once)
    assert sorted(rows) == list(range(150))


@pytest.mark.slow
def test_stateful_decayed_value_matches_batch_twin(spark):
    """Incremental exp-decay state: discounting each user's final
    (acc, anchor) to the global watermark must reproduce the batch
    time_decayed_user_value (same tau, same per-event contributions --
    the re-anchor identity makes batch order irrelevant)."""
    import math

    from mapreduce_on_google_cloud_platform_spark.operators.temporal import (
        DECAY_TAU_US,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_decayed_value_query,
    )

    stream = streaming_decayed_value_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_decayed_value")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stream_decayed_value").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:  # update mode: last emission per key is complete
        final[r.user_id] = (r.decayed_at_anchor, r.anchor_us, r.n_events)
    assert final
    wm = max(anchor for _, anchor, _ in final.values())
    batch = {
        r.user_id: (r.decayed_value, r.n_events)
        for r in QUERIES["time_decayed_user_value"](spark, SF_SMOKE).collect()
    }
    assert set(final) == set(batch)
    for uid, (acc, anchor, n) in final.items():
        want_val, want_n = batch[uid]
        assert n == want_n
        got = acc * math.exp(-(wm - anchor) / DECAY_TAU_US)
        assert abs(got - want_val) < 1e-6 * max(1.0, abs(want_val))


def test_streaming_dedup_within_watermark_invariants(spark):
    """dropDuplicatesWithinWatermark brackets plain dedup: it can only
    re-emit a key AFTER its state expired, so (a) every distinct key
    appears at least once, (b) emits per key never exceed the key's
    event count, and (c) with this corpus's time span vs the 1h
    watermark, two emits of one key must be > 1h apart."""
    from mapreduce_on_google_cloud_platform_spark.streaming.windows import (
        streaming_dedup_within_watermark_query,
    )

    stream = streaming_dedup_within_watermark_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup_wm")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stream_dedup_wm").collect()
    finally:
        q.stop()
    assert rows
    from collections import defaultdict

    emits = defaultdict(list)
    for r in rows:
        emits[(r.user_id, r.event_type)].append(r.ts)
    want = {
        (r.user_id, r.event_type)
        for r in QUERIES["user_event_type_distinct"](spark, SF_SMOKE).collect()
    }
    assert set(emits) == want  # at least once per key, no invented keys
    for key, times in emits.items():
        times.sort()
        for a, b in zip(times, times[1:]):
            assert (b - a).total_seconds() > 3600, (key, a, b)


def test_streaming_source_cap_admission_counts(spark):
    """Continuous-ingest admission cap: the final admitted count per
    source must equal min(SOURCE_CAP, docs seen), the count the batch
    source_frequency_cap keeps; admitted never exceeds seen."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.operators.pipeline import SOURCE_CAP
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_source_cap_query,
    )

    stream = streaming_source_cap_query(spark, SF_SMOKE)
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_source_cap")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stream_source_cap").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:  # update mode: last emission per key wins
        final[r.source] = r.n_admitted
    per_source = {
        r.source: r.n_docs
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    }
    assert set(final) == set(per_source)
    for src, n in per_source.items():
        assert final[src] == min(SOURCE_CAP, n), src


@pytest.mark.slow
def test_streaming_ks_drift_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the drift monitor: stage the SAME
    time-midpoint split the batch ks_drift_test uses as two explicit
    micro-batches (baseline, then current); the final streamed ks_d per
    event type must equal the batch query's ks_d BIT-EXACTLY (at test
    scale every count is < 2^53, so the stream's one-shot rational
    division and the batch plan's decimal->double division round
    identically)."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_ks_drift_query,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lims = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid_us = int((lims.lo + lims.hi) / 2)
    in_dir = str(tmp_path / "ks_in")
    base = ev.filter(F.unix_micros("ts") <= mid_us)
    cur = ev.filter(F.unix_micros("ts") > mid_us)
    base.coalesce(1).write.mode("append").parquet(in_dir)

    stream = streaming_ks_drift_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("ks_drift_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        cur.coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ks_drift_stream").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: the last emission per key wins
        final[r.event_type] = r
    batch = {r.event_type: r for r in QUERIES["ks_drift_test"](spark, SF_SMOKE).collect()}
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert s.is_baseline == "n", et
        assert s.base_n == b.base_n and s.cur_n == b.cur_n, et
        assert s.ks_d == b.ks_d, et


def test_streaming_mean_shift_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the mean-shift monitor: stage the SAME
    time-midpoint split batch welch_t_test uses as two explicit
    micro-batches; the final streamed t per type must equal the batch
    t_stat bit-exactly (identical integer sufficient statistics +
    identical float op order; both sides unrounded since the round-8
    de-float, so no rounding-tie channel remains on t)."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_mean_shift_query,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lims = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid_us = int((lims.lo + lims.hi) / 2)
    in_dir = str(tmp_path / "welch_in")
    base = ev.filter(F.unix_micros("ts") <= mid_us)
    cur = ev.filter(F.unix_micros("ts") > mid_us)
    base.coalesce(1).write.mode("append").parquet(in_dir)

    stream = streaming_mean_shift_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("mean_shift_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        cur.coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM mean_shift_stream").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: last emission per key wins
        final[r.event_type] = r
    batch = {r.event_type: r for r in QUERIES["welch_t_test"](spark, SF_SMOKE).collect()}
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert s.is_baseline == "n", et
        assert (s.n_base, s.n_cur) == (b.n_b, b.n_c), et
        assert s.mean_base_cents == b.mean_base_cents, et
        assert s.mean_cur_cents == b.mean_cur_cents, et
        assert s.t_stat == b.t_stat, et
        assert (s.mean_shifted == "y") == b.mean_shifted, et


def test_streaming_heavy_hitters_exact_below_capacity(spark, tmp_path):
    """While a shard has seen fewer distinct words than its capacity,
    Space-Saving has evicted nothing and the table IS the exact word
    count: stage a small-vocabulary corpus as two micro-batches and the
    final streamed (word, est) set must equal the batch word count
    bit-for-bit, with every err = 0."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_heavy_hitters_query,
    )

    rows1 = [(1, "alpha beta gamma alpha"), (2, "beta beta delta")]
    rows2 = [(3, "gamma alpha epsilon"), (4, "zeta delta alpha beta")]
    in_dir = str(tmp_path / "hh_in")
    df1 = spark.createDataFrame(rows1, "doc_id bigint, text string")
    df2 = spark.createDataFrame(rows2, "doc_id bigint, text string")
    df1.coalesce(1).write.mode("append").parquet(in_dir)

    stream = streaming_heavy_hitters_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_stream_exact")
        .start()
    )
    try:
        q.processAllAvailable()
        df2.coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hh_stream_exact").collect()
    finally:
        q.stop()

    # update mode: per (shard, word) the LAST emission wins; a word's
    # shard never changes, and within a shard later n_tokens supersedes
    final = {}
    for r in rows:
        key = (r.shard, r.word)
        if key not in final or r.n_tokens >= final[key].n_tokens:
            final[key] = r
    got = {r.word: (r.est, r.err) for r in final.values()}
    batch = (
        tokens_df(df1.unionByName(df2))
        .groupBy("word")
        .count()
        .collect()
    )
    expect = {r.word: int(r["count"]) for r in batch}
    assert {w: c for w, (c, _) in got.items()} == expect
    assert all(e == 0 for _, e in got.values())


def test_streaming_heavy_hitters_contracts_above_capacity(spark, tmp_path):
    """Past capacity the sketch's two contracts must hold per shard:
    est - err <= true_count <= est for every tracked word, table size
    <= capacity, and every word with true shard count >
    n_tokens_shard / capacity is tracked (Space-Saving coverage
    guarantee).  Stream: one dominant word + a long tail of distinct
    words, staged as three micro-batches, capacity 4."""
    import collections

    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        SS_SHARDS,
        streaming_heavy_hitters_query,
    )

    cap = 4
    texts = []
    for b in range(3):
        tail = " ".join(f"tail{b}x{i}" for i in range(40))
        texts.append((b, f"{'hot ' * 25}{tail}"))
    in_dir = str(tmp_path / "hh_skew_in")
    dfs = [
        spark.createDataFrame([t], "doc_id bigint, text string") for t in texts
    ]
    dfs[0].coalesce(1).write.mode("append").parquet(in_dir)

    stream = streaming_heavy_hitters_query(
        spark, in_dir, spark.read.parquet(in_dir).schema, capacity=cap
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_stream_skew")
        .start()
    )
    try:
        q.processAllAvailable()
        for df in dfs[1:]:
            df.coalesce(1).write.mode("append").parquet(in_dir)
            q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hh_stream_skew").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:
        key = (r.shard, r.word)
        if key not in final or r.n_tokens >= final[key].n_tokens:
            final[key] = r
    # ground truth, sharded exactly like the stream
    all_docs = dfs[0]
    for df in dfs[1:]:
        all_docs = all_docs.unionByName(df)
    import pyspark.sql.functions as F

    truth_rows = (
        tokens_df(all_docs)
        .select(
            "word",
            (
                F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
                .cast("bigint") % SS_SHARDS
            ).alias("shard"),
        )
        .groupBy("shard", "word")
        .count()
        .collect()
    )
    truth = {(r.shard, r.word): int(r["count"]) for r in truth_rows}
    shard_tokens = collections.Counter()
    for (shard, _), c in truth.items():
        shard_tokens[shard] += c
    # rebuild each shard's LAST emission (same n_tokens as the shard max)
    by_shard_last = collections.defaultdict(dict)
    for (shard, word), r in final.items():
        by_shard_last[shard][word] = r
    for shard, table in by_shard_last.items():
        last_nt = max(r.n_tokens for r in table.values())
        live = {w: r for w, r in table.items() if r.n_tokens == last_nt}
        assert len(live) <= cap, f"shard {shard} exceeds capacity"
        for w, r in live.items():
            t = truth[(shard, w)]
            assert r.est - r.err <= t <= r.est, (shard, w)
        # coverage: heavy words of this shard must be tracked
        thresh = shard_tokens[shard] / cap
        for (s2, w), t in truth.items():
            if s2 == shard and t > thresh:
                assert w in live, f"heavy word {w} missing from shard {shard}"
        # sanity: the dominant word is globally heavy in its shard
    hot_shard = next(s for (s, w) in truth if w == "hot")
    hot_live = {
        w
        for w, r in by_shard_last[hot_shard].items()
        if r.n_tokens == max(x.n_tokens for x in by_shard_last[hot_shard].values())
    }
    assert "hot" in hot_live


def test_streaming_cusum_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the CUSUM changepoint monitor: stage
    the events table as two arbitrary micro-batches (time-midpoint
    split); after the full input the streamed per-day CUSUM table must
    equal the batch cusum_changepoint bit-exactly -- the day-total map
    merges commutatively, the n*P_t - t*T numerator is exact int
    arithmetic on both sides, and the single float division of exact
    ints is IEEE-identical."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_cusum_query,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lims = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid_us = int((lims.lo + lims.hi) / 2)
    in_dir = str(tmp_path / "cusum_in")
    ev.filter(F.unix_micros("ts") <= mid_us).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = streaming_cusum_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.unix_micros("ts") > mid_us).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cusum_stream").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: the last emission per (type, day) wins
        final[(r.event_type, r.day)] = r
    batch = {
        (r.event_type, r.day): r
        for r in QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    assert set(final) == set(batch)
    n_days_by_type = {}
    for et, _ in batch:
        n_days_by_type[et] = n_days_by_type.get(et, 0) + 1
    for k, b in batch.items():
        s = final[k]
        assert s.n_days == n_days_by_type[k[0]], k
        assert s.value_cents == b.value_cents, k
        assert s.cusum_cents == b.cusum_cents, k
        assert (s.is_peak == "y") == b.is_peak, k


def test_streaming_reservoir_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the A-ES weighted reservoir: stage the
    documents table as two arbitrary micro-batches (doc_id parity
    split); after the full input the latest streamed reservoir per
    source must equal the batch weighted_reservoir_sample BIT-exactly
    (top-K of a union is top-K of top-Ks, and the ranking key is the
    same md5-derived quantized expression on both sides)."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_weighted_reservoir_query,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    in_dir = str(tmp_path / "res_in")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = streaming_weighted_reservoir_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("res_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM res_stream").collect()
    finally:
        q.stop()

    # memory sink in update mode appends re-emissions: keep the LAST
    # full reservoir per source (later rows overwrite earlier ranks)
    final: dict[tuple, tuple] = {}
    for r in rows:
        final[(r.source, r.sample_rank)] = (r.doc_id, r.weight, r.key)
    batch = {
        (r.source, r.sample_rank): (r.doc_id, r.weight, r.key)
        for r in QUERIES["weighted_reservoir_sample"](spark, SF_SMOKE).collect()
    }
    assert final == batch


def test_streaming_ewma_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the EWMA control chart: stage the
    events table as two micro-batches (time-midpoint split); after the
    full input the streamed chart must equal the batch
    ewma_control_chart bit-exactly -- the day-total map merges
    commutatively, mu/sigma come from exact integer sufficient
    statistics through the identical IEEE chain, the z/(1-l)^2t
    recurrences are the same literal multiplication chains, and the
    6-decimal rounding replicates Spark's HALF_UP round."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_ewma_query,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lims = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid_us = int((lims.lo + lims.hi) / 2)
    in_dir = str(tmp_path / "ewma_in")
    ev.filter(F.unix_micros("ts") <= mid_us).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = streaming_ewma_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.unix_micros("ts") > mid_us).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ewma_stream").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: the last emission per (type, day) wins
        final[(r.event_type, r.day)] = r
    batch = {
        (r.event_type, r.day): r
        for r in QUERIES["ewma_control_chart"](spark, SF_SMOKE).collect()
    }
    assert set(final) == set(batch)
    for k, b in batch.items():
        s = final[k]
        assert s.n_days == b.n_days, k
        assert s.day_index == b.day_index, k
        assert s.cents == b.cents, k
        assert s.mu_cents == b.mu_cents, k
        assert s.sigma_cents == b.sigma_cents, k
        assert s.ewma_cents == b.ewma_cents, k
        assert s.ucl_cents == b.ucl_cents, k
        assert s.lcl_cents == b.lcl_cents, k
        expect = (
            ""
            if b.out_of_control is None
            else ("y" if b.out_of_control else "n")
        )
        assert s.out_of_control == expect, k


def test_streaming_bootstrap_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the one-pass Poisson bootstrap: the
    2*B+2 integer state merges commutatively across micro-batches, so
    after the full input the streamed CI must equal the batch
    poisson_bootstrap_ci bit-exactly."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_bootstrap_query,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lims = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid_us = int((lims.lo + lims.hi) / 2)
    in_dir = str(tmp_path / "boot_in")
    ev.filter(F.unix_micros("ts") <= mid_us).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = streaming_bootstrap_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("boot_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.unix_micros("ts") > mid_us).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM boot_stream").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: last emission per type wins
        final[r.event_type] = r
    batch = {
        r.event_type: r
        for r in QUERIES["poisson_bootstrap_ci"](spark, SF_SMOKE).collect()
    }
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert s.n_events == b.n_events, et
        assert s.mean_cents == b.mean_cents, et
        assert s.n_zero_replicates == b.n_zero_replicates, et
        assert s.boot_lo_cents == b.boot_lo_cents, et
        assert s.boot_hi_cents == b.boot_hi_cents, et
        assert s.boot_se_cents == b.boot_se_cents, et


def test_streaming_sprt_agrees_with_batch(spark, tmp_path):
    """Stream/batch agreement for the Wald SPRT monitor: stage the
    events table as two arbitrary micro-batches (time-midpoint split);
    after the full input the streamed per-day LLR/decision stream must
    equal the batch sprt_conversion_monitor bit-exactly -- the day map
    merges commutatively and both sides run the same exact-decimal
    arithmetic on the same pinned log literals."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from mapreduce_on_google_cloud_platform_spark.streaming.stateful import (
        streaming_sprt_query,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    lims = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    mid_us = int((lims.lo + lims.hi) / 2)
    in_dir = str(tmp_path / "sprt_in")
    ev.filter(F.unix_micros("ts") <= mid_us).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    stream = streaming_sprt_query(
        spark, in_dir, spark.read.parquet(in_dir).schema
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("sprt_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        ev.filter(F.unix_micros("ts") > mid_us).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sprt_stream").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: the last emission per day wins
        final[r.day] = r
    batch = {
        r.day: r
        for r in QUERIES["sprt_conversion_monitor"](spark, SF_SMOKE).collect()
    }
    assert set(final) == set(batch)
    for d, b in batch.items():
        s = final[d]
        assert s.n_events == b.n_events, d
        assert s.n_purchases == b.n_purchases, d
        assert s.llr == b.llr, d
        assert s.state == b.state, d
