from __future__ import annotations

import pytest

from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
    TEXT_ANALYSIS_QUERIES,
)
from mapreduce_on_google_cloud_platform_spark.plans import ORACLES, QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle import assert_matches_oracle

NAMES = [name for name, _, o in TEXT_ANALYSIS_QUERIES if o is not None]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_smoke(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity_sf001(spark, name):
    assert_matches_oracle(QUERIES[name](spark, SF_ORACLE), ORACLES[name], SF_ORACLE)


def test_quality_bounds(spark):
    rows = QUERIES["text_quality_score"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 <= r.distinct_ratio <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0


def test_langid_covers_all_docs(spark):
    df = QUERIES["text_langid"](spark, SF_SMOKE)
    n_docs = df.count()
    assert n_docs > 0
    assert df.filter("lang_pred IS NULL").count() == 0


def test_tfidf_idf_monotone(spark):
    # a term appearing in every doc must score no higher than a rarer term
    # with the same tf (idf is monotone-decreasing in df)
    rows = QUERIES["text_tfidf"](spark, SF_SMOKE).collect()
    assert rows
    by_tf = {}
    for r in rows:
        by_tf.setdefault(r.tf, []).append(r)
    checked = 0
    for tf, grp in by_tf.items():
        grp = sorted(grp, key=lambda r: r.df_docs)
        for a, b in zip(grp, grp[1:]):
            if a.df_docs < b.df_docs:
                assert a.tfidf >= b.tfidf
                checked += 1
    assert checked > 0


def test_sentiment_label_sign(spark):
    for r in QUERIES["text_sentiment"](spark, SF_SMOKE).collect():
        if r.pos_hits > r.neg_hits:
            assert r.label == "positive"
        elif r.pos_hits < r.neg_hits:
            assert r.label == "negative"
        else:
            assert r.label == "neutral" and r.sentiment == 0.0


def test_bigrams_bounded_by_tokens(spark):
    # total bigram occurrences (incl. the count<2 tail it filters) can't
    # exceed token count; spot-check the declared output is non-empty and
    # every bigram is two cleaned tokens
    rows = QUERIES["text_bigrams"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows[:50]:
        w1, w2 = r.bigram.split(" ")
        assert w1 and w2
        assert r.occurrences >= 2 and 1 <= r.n_docs <= r.occurrences


def test_text_normalize_properties(spark):
    """clean_text must contain exactly n_kept tokens, no stopwords, and no
    adjacent repeats that were present pre-stopword-removal."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        EN_STOPS,
    )

    rows = QUERIES["text_normalize"](spark, SF_SMOKE).collect()
    assert rows
    assert any(r.n_repeats_removed > 0 for r in rows)
    for r in rows:
        toks = r.clean_text.split() if r.clean_text else []
        assert len(toks) == r.n_kept
        assert not set(toks) & set(EN_STOPS)
        assert r.n_kept + r.n_repeats_removed <= r.n_tokens


def test_repetition_filter_flags_crafted_docs(spark, tmp_path):
    """A doc that is one token repeated must be flagged; a doc of all
    distinct tokens must not; a 1-token doc survives with null gram
    stats (no inner-join drop)."""
    import pandas as pd

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        text_repetition_filter,
    )

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "spam " * 20,
                " ".join(f"w{i}" for i in range(40)),
                "one",
                "two words",
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [100, 200, 3, 9],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r for r in text_repetition_filter(spark, str(tmp_path)).collect()
    }
    assert rows[1].repetitive and rows[1].top_unigram_frac == 1.0
    assert not rows[2].repetitive and rows[2].dup_trigram_frac == 0.0
    assert rows[3].n_tokens == 1 and rows[3].n_bigrams is None
    # a 1-token doc IS 100% top-unigram: the filter reports that honestly;
    # minimum-length gating is the curation pipeline's job (MIN_TOKENS)
    assert rows[3].repetitive and rows[3].top_unigram_frac == 1.0
    # the flag is a REAL boolean even where gram terms are NULL (a doc
    # with no trigrams): false OR NULL would otherwise leak NULL, which
    # a downstream filter(~repetitive) silently drops
    assert all(r.repetitive is not None for r in rows.values())
    assert rows[4].n_trigrams is None and rows[4].repetitive is True


def test_dsir_weights_separate_target_from_source(spark):
    """Semantic check the oracle can't express: documents in the target
    slice (lang='en') must be selected at a strictly higher rate than
    out-of-domain documents -- the entire point of importance weighting."""
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["dsir_importance_weights"](spark, SF_SMOKE).collect()
    en = [r for r in rows if r.lang == "en"]
    other = [r for r in rows if r.lang != "en"]
    assert en and other
    en_rate = sum(r.selected for r in en) / len(en)
    other_rate = sum(r.selected for r in other) / len(other)
    assert en_rate > other_rate


def _py_bpe_reference(texts: list[str], k: int):
    """Independent pure-Python BPE on the same tokenizer spec: the
    differential oracle for bpe_learn_merges."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        for tok in t.split():
            w = re.sub(r"[^0-9a-z]", "", tok.lower())
            if w:
                wf[w] += 1
    words = {tuple(w): f for w, f in wf.items()}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        out = {}
        for syms, f in words.items():
            res, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == a and s == b:
                    res.append(a + b)
                    pend = None
                else:
                    res.append(pend)
                    pend = s
            if pend is not None:
                res.append(pend)
            out[tuple(res)] = out.get(tuple(res), 0) + f
        words = out
    return merges


def test_bpe_matches_pure_python_reference(spark):
    """The full learned merge sequence -- ranks, pairs, counts -- must be
    identical to an independent in-memory BPE over the same documents."""
    import duckdb

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        BPE_MERGES,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
    ]
    expected = _py_bpe_reference(texts, BPE_MERGES)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in QUERIES["bpe_learn_merges"](spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_bpe_encode_matches_pure_python_reference(spark):
    """Per-document BPE symbol counts under the learned merges must equal
    an independent in-memory greedy encode of every token."""
    import re

    import duckdb

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        BPE_MERGES,
    )
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    merges = _py_bpe_reference([t for _, t in rows], BPE_MERGES)

    def encode(word: str) -> int:
        syms = list(word)
        for _rank, a, b, m, _cnt in merges:
            res, pend = [], None
            for s in syms:
                if pend is None:
                    pend = s
                elif pend == a and s == b:
                    res.append(m)
                    pend = None
                else:
                    res.append(pend)
                    pend = s
            if pend is not None:
                res.append(pend)
            syms = res
        return len(syms)

    expected = {}
    for doc_id, text in rows:
        toks = [
            w
            for w in (
                re.sub(r"[^0-9a-z]", "", t.lower()) for t in text.split()
            )
            if w
        ]
        if toks:
            expected[doc_id] = (
                len(toks),
                sum(len(w) for w in toks),
                sum(encode(w) for w in toks),
            )

    got = {
        r.doc_id: (r.n_tokens, r.n_chars, r.n_bpe_tokens)
        for r in QUERIES["bpe_encode_documents"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_char_entropy_bounds(spark):
    """Entropy is bounded by log2(alphabet): tokens are [0-9a-z], so
    0 <= H <= log2(36); the flag must restate the rounded comparison."""
    import math

    rows = QUERIES["text_char_entropy"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.char_entropy <= math.log2(36) + 1e-9
        assert r.n_distinct_chars <= min(36, r.n_chars)
        assert r.low_entropy == (r.char_entropy < 3.0)


def test_heavy_hitters_support_floor(spark):
    """Every heavy hitter clears the 1/K support floor; supports are
    disjoint token shares so they must sum to <= 1."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        HEAVY_HITTER_K,
    )

    rows = QUERIES["heavy_hitter_words"](spark, SF_SMOKE).collect()
    assert rows
    assert len(rows) <= HEAVY_HITTER_K
    for r in rows:
        assert r.support >= 1.0 / HEAVY_HITTER_K - 1e-9
    assert sum(r.support for r in rows) <= 1.0 + 1e-6


def test_repeated_passages_bounds_and_symmetry(spark):
    """A duplicated passage requires >= 2 docs, so the count of docs
    with n_dup_windows > 0 is 0 or >= 2; ratios are valid fractions."""
    rows = QUERIES["repeated_passage_windows"](spark, SF_SMOKE).collect()
    assert rows
    flagged = [r for r in rows if r.n_dup_windows > 0]
    assert len(flagged) != 1
    for r in rows:
        assert 0 <= r.n_dup_windows <= r.n_windows
        assert abs(r.passage_dup_ratio - round(r.n_dup_windows / r.n_windows, 6)) < 1e-9


def test_c4_filter_flags_are_never_null_and_keep_is_conjunction(spark):
    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["c4_style_filter"](spark, SF_SMOKE).collect()
    assert rows
    flags = ["too_short", "bad_mean_len", "has_blocklist", "low_stopword",
             "non_target_lang", "keep"]
    for r in rows:
        for f in flags:
            assert getattr(r, f) is not None, (r.doc_id, f)
        assert r.keep == (not (r.too_short or r.bad_mean_len or r.has_blocklist
                               or r.low_stopword or r.non_target_lang))
    # the synthetic corpus has non-en docs; the lang rule must fire
    assert any(r.non_target_lang for r in rows)
    assert any(r.keep for r in rows)


def test_source_overlap_estimate_tracks_exact_jaccard(spark):
    """The 16-lane MinHash estimate is unbiased with std ~= sqrt(J(1-J)/16)
    <= 0.125; check every pair is within 4 sigma and the mean absolute
    error is small, against the exact vocab Jaccard from DuckDB."""
    import duckdb

    from mapreduce_on_google_cloud_platform_spark.plans import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["source_vocab_overlap"](spark, SF_SMOKE).collect()
    srcs = {r.source_a for r in rows} | {r.source_b for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2  # every pair once

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    # exact Jaccard per pair: |A & B| / |A | B|
    exact = {}
    for (pair, inter, na, nb) in con.execute("""
        WITH words AS (
            SELECT DISTINCT source,
                   regexp_replace(lower(t), '[^0-9a-z]', '', 'g') AS word
            FROM documents, unnest(regexp_split_to_array(text, '\\s+')) u(t)
            WHERE regexp_replace(lower(t), '[^0-9a-z]', '', 'g') <> ''
        ),
        sizes AS (SELECT source, count(*) AS n FROM words GROUP BY source),
        inter AS (
            SELECT a.source AS sa, b.source AS sb, count(*) AS i
            FROM words a JOIN words b ON a.source < b.source AND a.word = b.word
            GROUP BY 1, 2
        )
        SELECT sa || '|' || sb, i, x.n, y.n
        FROM inter JOIN sizes x ON x.source = sa JOIN sizes y ON y.source = sb
    """).fetchall():
        exact[pair] = inter / (na + nb - inter)

    errs = []
    for r in rows:
        j = exact.get(f"{r.source_a}|{r.source_b}", 0.0)
        sigma = max((j * (1 - j) / 16) ** 0.5, 1 / 16)
        assert abs(r.est_jaccard - j) <= 4 * sigma, (r.source_a, r.source_b, r.est_jaccard, j)
        errs.append(abs(r.est_jaccard - j))
    assert sum(errs) / len(errs) < 0.15


def test_fertility_covers_all_langs_and_is_positive(spark):
    rows = QUERIES["tokenizer_fertility_by_lang"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    n_langs, n_docs = duckdb.sql(
        f"SELECT count(DISTINCT lang), count(*) FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()
    assert len(rows) == n_langs
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0.0 < r.fertility <= 1.0  # a token needs >= 1 char
        assert r.avg_doc_tokens > 0


def test_length_buckets_partition_the_corpus(spark):
    rows = QUERIES["length_bucket_profile"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # bucket b holds lengths in [2^b, 2^(b+1) - 1] (bucket 0 also
        # admits 0-token docs: bin(0) has one digit too)
        lo = 0 if r.bucket == 0 else 2**r.bucket
        assert lo <= r.min_tokens <= r.max_tokens <= r.bucket_cap
        assert 0.0 <= r.pad_waste_ratio < 1.0


def test_exact_substring_dedup_crafted_spans(spark, tmp_path):
    """A 10-token run shared by two docs: the later doc's span is removed,
    the canonical first occurrence survives; an intra-doc repeat drops
    only the second occurrence; a no-dup doc retains everything."""
    import pandas as pd

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        exact_substring_dedup,
    )

    run = " ".join(f"s{i}" for i in range(10))            # the shared span
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))  # noqa: E731
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{run} {uniq('a', 10)}",                  # canonical holder
                f"{uniq('b', 5)} {run} {uniq('c', 5)}",    # cross-doc dup
                f"{run} {uniq('d', 2)} {run}",             # also dup (2 spans)
                uniq("e", 20),                             # clean
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [1, 1, 1, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {r.doc_id: r for r in exact_substring_dedup(spark, str(tmp_path)).collect()}
    assert rows[1].n_dup_positions == 0 and rows[1].retained_ratio == 1.0
    # doc 2: exactly the 10 span positions are covered
    assert rows[2].n_tokens == 20 and rows[2].n_dup_positions == 10
    # doc 3 holds occurrences 2 and 3 of the span fingerprint: both of its
    # spans are non-canonical (doc 1 is first), so both 10-token spans drop
    assert rows[3].n_tokens == 22 and rows[3].n_dup_positions == 20
    assert rows[4].n_dup_positions == 0
    for r in rows.values():
        assert r.retained_tokens == r.n_tokens - r.n_dup_positions


def test_sequence_pack_covers_stream_exactly(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        SEQ_LEN,
    )

    rows = QUERIES["sequence_pack_tokens"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    total = duckdb.sql(f"""
        WITH toks AS (
          SELECT list_filter(list_transform(
                     regexp_split_to_array(text, '\\s+'),
                     t -> regexp_replace(lower(t), '[^0-9a-z]', '', 'g')),
                 x -> x <> '') AS ts
          FROM read_parquet('{SF_SMOKE}/documents.parquet')
        ) SELECT sum(len(ts)) FROM toks""").fetchone()[0]
    # contiguous ids, exact SEQ_LEN everywhere but the tail, total coverage
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    assert all(r.n_tokens == SEQ_LEN for r in rows[:-1])
    assert 1 <= rows[-1].n_tokens <= SEQ_LEN
    assert sum(r.n_tokens for r in rows) == total
    for r in rows:
        assert 1 <= r.n_docs and r.first_doc <= r.last_doc
        assert len(r.seq_md5) == 32


def test_term_pmi_pairs_bounds(spark):
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        PMI_TOP_TERMS,
    )

    rows = QUERIES["term_pmi_pairs"](spark, SF_SMOKE).collect()
    assert rows
    assert len(rows) <= PMI_TOP_TERMS * (PMI_TOP_TERMS - 1) // 2
    terms = {r.term_a for r in rows} | {r.term_b for r in rows}
    assert len(terms) <= PMI_TOP_TERMS
    for r in rows:
        assert r.term_a < r.term_b
        assert 1 <= r.n_ab <= min(r.df_a, r.df_b)
    # co-occurrence among frequent terms should show both attraction and
    # repulsion on a natural-ish corpus
    assert any(r.pmi > 0 for r in rows) and any(r.pmi < 0 for r in rows)


def test_vocab_coverage_curve_is_monotone(spark):
    rows = QUERIES["vocab_coverage_curve"](spark, SF_SMOKE).collect()
    assert [r.k for r in rows] == [100, 500, 2000]
    for a, b in zip(rows, rows[1:]):
        assert a.tokens_covered <= b.tokens_covered
        assert a.n_types_in_budget <= b.n_types_in_budget
        assert a.coverage <= b.coverage
    for r in rows:
        assert r.n_types_in_budget <= r.total_types
        assert 0.0 < r.coverage <= 1.0
    # the full vocab covers everything; the largest budget should too if
    # it exceeds the type count
    last = rows[-1]
    if last.n_types_in_budget == last.total_types:
        assert last.coverage == 1.0


def test_langid_confusion_partitions_and_diagonal(spark):
    """Cell counts partition the corpus; per-actual shares sum to 1;
    the diagonal dominates for languages whose stopwords are distinct."""
    rows = QUERIES["langid_confusion"](spark, SF_SMOKE).collect()
    assert rows
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n for r in rows) == n_docs
    from collections import defaultdict

    shares = defaultdict(float)
    for r in rows:
        shares[r.lang] += r.share_of_actual
        assert r.is_correct == (r.lang == r.lang_pred)
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-3, lang
    assert any(r.is_correct for r in rows)


def test_bpe_pair_counts_first_row_is_first_merge(spark):
    """The oracle-checked round-1 pair table's top row must BE the
    iterative learner's first merge -- pinning the learn loop's
    distributed kernel to the SQL-checkable twin."""
    top = QUERIES["bpe_pair_counts"](spark, SF_SMOKE).limit(1).collect()[0]
    m1 = QUERIES["bpe_learn_merges"](spark, SF_SMOKE).limit(1).collect()[0]
    assert (top.a, top.b, top.pair_count) == (m1.left, m1.right, m1.pair_count)
    assert top.rnk == 1


def test_training_shard_manifest_consistent_with_packing(spark):
    """The manifest is token_budget_packing's assignment + checksums:
    shard/doc/token columns must agree row-for-row."""
    man = {r.shard: r for r in QUERIES["training_shard_manifest"](spark, SF_SMOKE).collect()}
    pack = {r.shard: r for r in QUERIES["token_budget_packing"](spark, SF_SMOKE).collect()}
    assert set(man) == set(pack)
    for s, p in pack.items():
        m = man[s]
        assert (m.n_docs, m.shard_tokens, m.first_doc, m.last_doc) == (
            p.n_docs, p.shard_tokens, p.first_doc, p.last_doc)
        assert len(m.doc_list_md5) == 32


def test_quality_gate_stack_funnel_invariants(spark):
    """Remaining is non-increasing, drops partition the corpus, the
    kept row closes the funnel, and first-fire attribution never
    exceeds the raw fire count."""
    rows = QUERIES["quality_gate_stack"](spark, SF_SMOKE).collect()
    assert [r.stage_order for r in rows] == list(range(1, 9))
    n_docs = rows[0].n_dropped_here + rows[0].n_remaining
    prev = n_docs
    total_dropped = 0
    for r in rows[:-1]:
        assert r.n_dropped_here <= r.n_flagged
        assert r.n_remaining == prev - r.n_dropped_here
        prev = r.n_remaining
        total_dropped += r.n_dropped_here
    kept = rows[-1]
    assert kept.stage == "kept"
    assert kept.n_remaining == n_docs - total_dropped
    assert kept.n_flagged == kept.n_remaining


def test_perplexity_buckets_shares_sum_to_one(spark):
    from collections import defaultdict

    rows = QUERIES["perplexity_quality_buckets"](spark, SF_SMOKE).collect()
    assert rows
    shares = defaultdict(float)
    for r in rows:
        shares[r.lang] += r.share_of_lang
        assert r.n_docs > 0
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-3, lang


def test_kn_continuation_invariants(spark):
    """Continuation counts never exceed raw frequency's vocabulary
    bound; probabilities sum to ~1 over the vocabulary (every bigram
    type contributes exactly one continuation)."""
    rows = QUERIES["kn_continuation_probs"](spark, SF_SMOKE).collect()
    assert rows
    total_p = sum(r.p_continuation for r in rows)
    assert abs(total_p - 1.0) < 1e-3
    for r in rows[:200]:
        assert r.cont_count >= 0 and r.freq >= 1


def test_tfidf_topk_terms_agrees_with_tfidf(spark):
    """Ranks are 1..K per doc and each row's score matches the full
    tf-idf table; rank 1 is the doc's max score."""
    topk = QUERIES["tfidf_topk_terms"](spark, SF_SMOKE).collect()
    assert topk
    full = {}
    for r in QUERIES["text_tfidf"](spark, SF_SMOKE).collect():
        full.setdefault(r.doc_id, {})[r.word] = r.tfidf
    from collections import defaultdict

    ranks = defaultdict(list)
    for r in topk:
        ranks[r.doc_id].append(r.term_rank)
        assert full[r.doc_id][r.word] == r.tfidf
    for doc_id, rs in list(ranks.items())[:100]:
        assert sorted(rs) == list(range(1, len(rs) + 1))
        best = max(full[doc_id].values())
        top1 = next(r for r in topk if r.doc_id == doc_id and r.term_rank == 1)
        assert top1.tfidf == best


def test_decontam_funnel_reconciles_with_contamination_rates(spark):
    """The funnel's drop count must equal the number of train docs whose
    shingle-leak fraction (recomputed doc-by-doc from the same shingle
    streams) strictly exceeds one half; counts partition the corpus."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import shingles_df
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        EVAL_MOD,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = shingles_df(docs).collect()
    eval_sh = {r.sh for r in sh if r.doc_id % EVAL_MOD == 0}
    per_doc: dict[int, list[int]] = {}
    for r in sh:
        if r.doc_id % EVAL_MOD != 0:
            tot_hit = per_doc.setdefault(r.doc_id, [0, 0])
            tot_hit[0] += 1
            tot_hit[1] += r.sh in eval_sh
    n_train = docs.filter(f"doc_id % {EVAL_MOD} != 0").count()
    expect_drop = sum(1 for n, h in per_doc.values() if 2 * h > n)
    row = QUERIES["eval_decontam_funnel"](spark, SF_SMOKE).collect()[0]
    assert row.n_train_docs == n_train
    assert row.n_dropped == expect_drop
    assert row.n_kept + row.n_dropped == row.n_train_docs
    assert row.n_eval_docs == docs.filter(f"doc_id % {EVAL_MOD} = 0").count()


def test_novelty_curve_conservation(spark):
    """Batch 0 is all-novel by construction; each batch's novel pairs are
    exactly its new-shingle first occurrences plus same-batch repeats, so
    n_new_sh <= n_novel_pairs <= n_pairs; and the per-batch new-shingle
    counts partition the global distinct-shingle vocabulary."""
    from pyspark.sql import functions as F

    from mapreduce_on_google_cloud_platform_spark.functions.text import (
        shingles_df,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["ngram_novelty_curve"](spark, SF_SMOKE).collect()
    assert rows and rows[0].batch == 0
    assert rows[0].novelty_share == 1.0
    assert rows[0].n_novel_pairs == rows[0].n_pairs
    for r in rows:
        assert 0 < r.n_new_sh <= r.n_novel_pairs <= r.n_pairs
        assert r.n_distinct_sh <= r.n_pairs
    vocab = (
        shingles_df(load_table(spark, SF_SMOKE, "documents"))
        .select("sh")
        .distinct()
        .count()
    )
    assert sum(r.n_new_sh for r in rows) == vocab


def test_quality_auc_matches_local_rank_sum(spark):
    """Differential check: the distributed tie-aware U statistic equals a
    direct O(n log n) local Mann-Whitney computation over the same
    (score, label) pairs."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    scored = (
        QUERIES["text_quality_score"](spark, SF_SMOKE)
        .filter("n_tokens > 0 AND n_chars > 0")
        .join(
            load_table(spark, SF_SMOKE, "documents").selectExpr(
                "doc_id", "lang = 'en' AS is_pos"
            ),
            "doc_id",
        )
        .select("quality", "is_pos")
        .collect()
    )
    pairs = sorted((r.quality, r.is_pos) for r in scored)
    n_pos = sum(1 for _, p in pairs if p)
    n_neg = len(pairs) - n_pos
    u2 = 0
    neg_below = 0
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        pos_s = sum(1 for _, p in pairs[i:j] if p)
        neg_s = (j - i) - pos_s
        u2 += 2 * pos_s * neg_below + pos_s * neg_s
        neg_below += neg_s
        i = j
    row = QUERIES["quality_score_auc"](spark, SF_SMOKE).collect()[0]
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert int(row.u2) == u2
    assert row.auc == u2 / (2 * n_pos * n_neg)
    assert abs(row.gini - (2 * row.auc - 1)) < 1e-15


def test_logit_stats_consistency(spark):
    """Structural invariants tying the sufficient statistics together:
    g_00 counts the scored docs, grad2_0 is n_pos - n_neg (and both
    reconcile with quality_score_auc's counts), diagonals are
    nonnegative, and every off-diagonal obeys Cauchy-Schwarz."""
    rows = QUERIES["quality_logit_sufficient_stats"](spark, SF_SMOKE).collect()
    gram = {(r.j, r.k): int(r.v) for r in rows if r.stat == "gram"}
    grad = {r.j: int(r.v) for r in rows if r.stat == "grad2"}
    auc = QUERIES["quality_score_auc"](spark, SF_SMOKE).collect()[0]
    assert gram[(0, 0)] == auc.n_pos + auc.n_neg
    assert grad[0] == auc.n_pos - auc.n_neg
    for j in range(4):
        assert gram[(j, j)] >= 0
    for j in range(4):
        for k in range(j + 1, 4):
            assert gram[(j, k)] ** 2 <= gram[(j, j)] * gram[(k, k)]


def test_calibration_partitions_scored_docs(spark):
    """Bucket rows partition the rankable docs, reconcile with the AUC
    counts, and every bucket's lattice mean lies inside the bucket."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        CALIB_BUCKET_WIDTH,
    )

    rows = QUERIES["quality_score_calibration"](spark, SF_SMOKE).collect()
    auc = QUERIES["quality_score_auc"](spark, SF_SMOKE).collect()[0]
    assert sum(r.n_docs for r in rows) == auc.n_pos + auc.n_neg
    assert sum(r.n_pos for r in rows) == auc.n_pos
    for r in rows:
        assert 0.0 <= r.pos_rate <= 1.0
        assert r.bucket_lo == r.bucket * CALIB_BUCKET_WIDTH
        assert (
            r.bucket_lo - 1e-6
            <= r.mean_quality
            <= r.bucket_lo + CALIB_BUCKET_WIDTH + 1e-6
        )


def test_char_trigram_profile_shape(spark):
    """Per lang: contiguous ranks 1..K, counts nonincreasing in rank,
    trigrams are length-3 strings over the pinned [0-9a-z ] alphabet,
    shares positive and <= 1."""
    import re

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        TRIGRAM_TOP_K,
    )

    rows = QUERIES["char_trigram_lang_profile"](spark, SF_SMOKE).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
        assert len(r.trigram) == 3
        assert re.fullmatch(r"[0-9a-z ]{3}", r.trigram), r.trigram
        assert 0.0 < r.share <= 1.0
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TRIGRAM_TOP_K
        counts = [r.n_occurrences for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_pii_by_source_reconciles_with_per_doc_scan(spark):
    """Source rollup must re-aggregate pii_redaction's per-doc counts
    exactly; rates restate their integer inputs."""
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    per_doc = {
        r.doc_id: r for r in QUERIES["pii_redaction"](spark, SF_SMOKE).collect()
    }
    src_of = {
        r.doc_id: (r.source, len(r.text) if r.text is not None else 0)
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    agg: dict[str, list] = {}
    for doc_id, r in per_doc.items():
        source, n_chars = src_of[doc_id]
        a = agg.setdefault(source, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if (r.n_emails + r.n_digit_runs + r.n_sensitive) > 0 else 0
        a[2] += r.n_emails
        a[3] += r.n_digit_runs
        a[4] += r.n_sensitive
        a[5] += n_chars
    rows = QUERIES["pii_rate_by_source"](spark, SF_SMOKE).collect()
    assert {r.source for r in rows} == set(agg)
    for r in rows:
        n_docs, with_pii, e, d, t, chars = agg[r.source]
        assert (r.n_docs, r.docs_with_pii) == (n_docs, with_pii)
        assert (r.n_emails, r.n_digit_runs, r.n_sensitive) == (e, d, t)
        assert r.pii_doc_rate == round(with_pii / n_docs, 6)


def test_langid_mismatch_reconciles_with_confusion(spark):
    """Source rollup totals must re-aggregate the global confusion
    counts: sum of mismatches across sources equals the off-diagonal
    non-unknown mass of langid_confusion."""
    conf = QUERIES["langid_confusion"](spark, SF_SMOKE).collect()
    mism = QUERIES["langid_mismatch_by_source"](spark, SF_SMOKE).collect()
    total_docs = sum(r.n for r in conf)
    off_diag = sum(
        r.n
        for r in conf
        if r.lang_pred != "unknown" and r.lang_pred != r.lang
    )
    unknown = sum(r.n for r in conf if r.lang_pred == "unknown")
    assert sum(r.n_docs for r in mism) == total_docs
    assert sum(r.n_mismatch for r in mism) == off_diag
    assert sum(r.n_unknown for r in mism) == unknown
    for r in mism:
        assert r.mismatch_rate == round(r.n_mismatch / r.n_docs, 6)
        assert r.unknown_rate == round(r.n_unknown / r.n_docs, 6)


def test_oov_rate_reconciles_with_vocab_and_counts(spark):
    """Per-source token totals reconcile with token_count_stats' corpus
    totals; OOV tokens are exactly the occurrences of words ranked
    beyond the cap in vocab_table; type counts bound token counts."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        OOV_VOCAB_CAP,
    )

    rows = QUERIES["vocab_oov_rate_by_source"](spark, SF_SMOKE).collect()
    vocab = {
        r.word
        for r in QUERIES["vocab_table"](spark, SF_SMOKE).collect()
        if r.token_id <= OOV_VOCAB_CAP
    }
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = tokens_df(docs).join(docs.select("doc_id", "source"), "doc_id")
    expected: dict[str, list[int]] = {}
    for t in toks.collect():
        a = expected.setdefault(t.source, [0, 0])
        a[0] += 1
        a[1] += 0 if t.word in vocab else 1
    assert {r.source for r in rows} == set(expected)
    for r in rows:
        n_tokens, n_oov = expected[r.source]
        assert (r.n_tokens, r.n_oov_tokens) == (n_tokens, n_oov)
        assert r.n_oov_types <= r.n_types
        assert r.n_oov_tokens >= r.n_oov_types  # every type occurs >= once
        assert r.oov_token_rate == round(n_oov / n_tokens, 6)


def test_heavy_hitter_shard_plan_reconciles_with_token_stream(spark):
    """Shard totals partition the token stream exactly; the guarantee
    count respects Space-Saving's structural bounds (fewer than CAPACITY
    words can each exceed n_tokens/CAPACITY); err_bound is the integer
    floor of the shard mean over capacity."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        SS_AUDIT_CAPACITY,
        SS_AUDIT_SHARDS,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["heavy_hitter_shard_plan"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= SS_AUDIT_SHARDS
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = tokens_df(docs)
    assert sum(r.n_tokens for r in rows) == toks.count()
    assert sum(r.n_distinct for r in rows) == toks.select("word").distinct().count()
    for r in rows:
        assert r.err_bound == r.n_tokens // SS_AUDIT_CAPACITY
        assert r.n_guaranteed < SS_AUDIT_CAPACITY  # pigeonhole bound
        assert r.max_freq <= r.n_tokens
        assert r.exact_below_capacity == (r.n_distinct <= SS_AUDIT_CAPACITY)
        assert 0.0 < r.top_share <= 1.0
        if r.n_guaranteed > 0:
            assert r.max_freq * SS_AUDIT_CAPACITY > r.n_tokens


def test_quality_percentile_by_source_is_an_exact_rank(spark):
    """Per source: n_below/n_tied/n_source must reconcile with a local
    exact recount of the quantized scores, every doc appears exactly
    once, and the integer keep test matches its definition."""
    import collections

    rows = QUERIES["quality_percentile_by_source"](spark, SF_SMOKE).collect()
    assert len(rows) == len({r.doc_id for r in rows})
    by_source = collections.defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for source, rs in by_source.items():
        qs = sorted(r.q_quality for r in rs)
        n = len(qs)
        counts = collections.Counter(qs)
        below = {}
        acc = 0
        for q in sorted(counts):
            below[q] = acc
            acc += counts[q]
        for r in rs:
            assert r.n_source == n, source
            assert r.n_tied == counts[r.q_quality], (source, r.doc_id)
            assert r.n_below == below[r.q_quality], (source, r.doc_id)
            assert r.pct_below == r.n_below / r.n_source
            assert r.keep_top_half == (2 * r.n_below >= r.n_source)
    # roughly half the corpus keeps under a per-source median threshold
    kept = sum(1 for r in rows if r.keep_top_half)
    assert 0.25 * len(rows) <= kept <= 0.75 * len(rows)


def test_cms_width_curve_contracts(spark):
    """Count-Min contract invariants: one-sided error (est >= true, so
    every overestimate stat is non-negative), the audited vocabulary is
    width-independent, and a bound violation implies a non-exact word."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        CMS_WIDTHS,
    )

    from .conftest import SF_SMOKE

    rows = sorted(
        QUERIES["cms_width_error_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r.width,
    )
    assert [r.width for r in rows] == sorted(CMS_WIDTHS)
    vocab_sizes = {r.n_words for r in rows}
    assert len(vocab_sizes) == 1  # same exact vocabulary under every width
    for r in rows:
        assert 0 <= r.n_exact <= r.n_words
        assert r.max_overestimate >= 0
        assert r.sum_overestimate >= r.max_overestimate >= 0
        assert r.n_bound_violations <= r.n_words - r.n_exact
        if r.n_exact == r.n_words:
            assert r.sum_overestimate == 0


def test_bm25_matches_python_recompute_and_ranking(spark):
    """Differential check: every emitted BM25 score reproduces a direct
    Python recompute from the token stream (idf squashed to the same
    9-decimal quantum), the query terms are exactly the top-df head, and
    per-term doc ranks descend by score."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        BM25_B,
        BM25_K1,
        BM25_TOP_TERMS,
        BM25_TOPK_DOCS,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    toks = tokens_df(load_table(spark, SF_SMOKE, "documents")).collect()
    tf: Counter = Counter((r.doc_id, r.word) for r in toks)
    dl: Counter = Counter(r.doc_id for r in toks)
    df_docs: Counter = Counter(w for _, w in tf)
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    top_terms = sorted(df_docs.items(), key=lambda t: (-t[1], t[0]))[
        :BM25_TOP_TERMS
    ]
    rows = QUERIES["bm25_topk_docs"](spark, SF_SMOKE).collect()
    assert set(r.word for r in rows) == {w for w, _ in top_terms}
    per_term: dict[str, list] = {}
    for r in rows:
        per_term.setdefault(r.word, []).append(r)
        idf9 = float(
            Decimal(
                repr(math.log(1.0 + ((n_docs - r.df_docs) + 0.5) / (r.df_docs + 0.5)))
            ).quantize(Decimal("1.000000000"), rounding=ROUND_HALF_UP)
        )
        expect = (
            idf9
            * (tf[(r.doc_id, r.word)] * (BM25_K1 + 1.0))
            / (
                tf[(r.doc_id, r.word)]
                + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl[r.doc_id] / avgdl))
            )
        )
        assert r.tf == tf[(r.doc_id, r.word)] and r.dl == dl[r.doc_id]
        assert abs(r.bm25 - expect) < 1e-9, (r.word, r.doc_id)
    for word, group in per_term.items():
        group.sort(key=lambda r: r.doc_rank)
        assert [r.doc_rank for r in group] == list(range(1, len(group) + 1))
        assert len(group) <= BM25_TOPK_DOCS
        scores = [r.bm25 for r in group]
        assert scores == sorted(scores, reverse=True), word


def test_unigram_lm_matches_pure_python_em(spark):
    """The full hard-EM loop (candidates -> score -> Viterbi segment ->
    recount -> re-score, UNI_EM_ITERS rounds) must reproduce an
    independent pure-Python unigram-LM implementation: identical piece
    set, identical counts and ranks, logp within one fixed-point unit
    (the DECIMAL(18,9) quantize boundary)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        UNI_EM_ITERS,
        UNI_FP,
        UNI_LMAX,
        UNI_VOCAB_K,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    wf = Counter(
        r.word for r in tokens_df(load_table(spark, SF_SMOKE, "documents")).collect()
    )

    def score(counts: dict) -> dict:
        tot = sum(c + 1 for c in counts.values())
        out = {}
        for p, c in counts.items():
            ln9 = Decimal(repr(math.log((c + 1) / tot))).quantize(
                Decimal("1.000000000"), rounding=ROUND_HALF_UP
            )
            out[p] = int(ln9 * UNI_FP)
        return out

    cand: Counter = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, UNI_LMAX + 1):
                if i + l <= len(w):
                    cand[w[i : i + l]] += f
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:UNI_VOCAB_K]
    vocab = dict(multi) | {p: c for p, c in cand.items() if len(p) == 1}
    logp = score(vocab)

    def viterbi(word: str) -> list:
        dp = [(0, 0)] + [None] * len(word)
        for j in range(1, len(word) + 1):
            best = None
            for l in range(1, UNI_LMAX + 1):
                if l <= j:
                    p = word[j - l : j]
                    if p in logp:
                        s = dp[j - l][0] + logp[p]
                        if best is None or s >= best[0]:
                            best = (s, l)
            dp[j] = best
        ps, pos = [], len(word)
        while pos > 0:
            l = dp[pos][1]
            ps.append(word[pos - l : pos])
            pos -= l
        return ps

    for _ in range(UNI_EM_ITERS):
        used: Counter = Counter()
        for w, f in wf.items():
            for p in viterbi(w):
                used[p] += f
        vocab = {
            p: used.get(p, 0)
            for p in vocab
            if used.get(p, 0) > 0 or len(p) == 1
        }
        logp = score(vocab)

    rows = QUERIES["unigram_lm_learn"](spark, SF_SMOKE).collect()
    assert {r.piece for r in rows} == set(vocab)
    expected_rank = sorted(vocab.items(), key=lambda t: (-t[1], t[0]))
    for r in rows:
        assert r.wcnt == vocab[r.piece], r.piece
        assert r.piece_len == len(r.piece)
        assert abs(r.logp_fp - logp[r.piece]) <= 1, r.piece
        assert expected_rank[r.piece_rank - 1][0] == r.piece


def test_unigram_candidates_is_learn_round_zero(spark):
    """unigram_piece_candidates (the oracle-checked kernel) must be
    EXACTLY unigram_lm_learn's initial vocabulary: same pieces, same
    weighted counts, same initial scores."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        _uni_init_vocab,
        _uni_score,
    )
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from pyspark.sql import functions as F

    wf = (
        tokens_df(load_table(spark, SF_SMOKE, "documents"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    round0 = {
        (r.piece, r.wcnt, r.logp_fp)
        for r in _uni_score(_uni_init_vocab(wf)).collect()
    }
    got = {
        (r.piece, r.wcnt, r.logp_fp)
        for r in QUERIES["unigram_piece_candidates"](spark, SF_SMOKE).collect()
    }
    assert got == round0


def test_unigram_join_scoring_matches_map_literal(spark):
    """The broadcast-join Viterbi scoring stage (_uni_word_scores +
    array reads -- the documented 100 TB formulation) must segment every
    word identically to the production map-literal form: same DP arrays,
    so same pieces, so bit-identical EM replay either way."""
    from mapreduce_on_google_cloud_platform_spark.functions.text import tokens_df
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        UNI_LMAX,
        _uni_backtrace,
        _uni_forward_dp,
        _uni_init_vocab,
        _uni_score,
        _uni_word_scores,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table
    from pyspark.sql import functions as F

    wf = (
        tokens_df(load_table(spark, SF_SMOKE, "documents"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    vocab = _uni_score(_uni_init_vocab(wf))
    rows = vocab.select("piece", "logp_fp").collect()
    m = F.create_map(
        *[c for r in sorted(rows) for c in (F.lit(r.piece), F.lit(r.logp_fp))]
    )
    word = F.col("word")
    via_map = {
        r.word: r.ps
        for r in wf.withColumn(
            "_dp",
            _uni_forward_dp(
                word,
                lambda j, l: F.element_at(
                    m, word.substr(j - F.lit(l) + 1, F.lit(l))
                ),
            ),
        )
        .select("word", _uni_backtrace(word, F.col("_dp")).alias("ps"))
        .collect()
    }
    via_join = {
        r.word: r.ps
        for r in _uni_word_scores(wf, vocab)
        .withColumn(
            "_dp",
            _uni_forward_dp(
                word,
                lambda j, l, sc=F.col("_sc"): F.element_at(
                    sc, (j - F.lit(1)) * UNI_LMAX + F.lit(l)
                ),
            ),
        )
        .select("word", _uni_backtrace(word, F.col("_dp")).alias("ps"))
        .collect()
    }
    assert via_join == via_map and via_map


def test_kappa_matches_python_confusion(spark):
    """Kappa reproduces a direct Python recompute from the two gates'
    own outputs, and the integer-numerator identity holds exactly."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        KAPPA_QUALITY_T,
    )

    a = {r.doc_id: r.keep for r in QUERIES["c4_style_filter"](spark, SF_SMOKE).collect()}
    b = {
        r.doc_id: r.quality >= KAPPA_QUALITY_T
        for r in QUERIES["text_quality_score"](spark, SF_SMOKE).collect()
    }
    n11 = sum(1 for d in a if a[d] and b[d])
    n10 = sum(1 for d in a if a[d] and not b[d])
    n01 = sum(1 for d in a if not a[d] and b[d])
    n00 = sum(1 for d in a if not a[d] and not b[d])
    n = n11 + n10 + n01 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    row = QUERIES["gate_agreement_kappa"](spark, SF_SMOKE).collect()[0]
    assert (row.n11, row.n10, row.n01, row.n00) == (n11, n10, n01, n00)
    assert row.observed_agreement == (n11 + n00) / n
    assert row.expected_agreement == pe_num / (n * n)
    assert row.kappa == (n * (n11 + n00) - pe_num) / (n * n - pe_num)
    assert -1.0 <= row.kappa <= 1.0


def test_conformal_threshold_matches_python_recompute(spark):
    """Differential replay: same md5 split, same label, threshold =
    r-th smallest calibration quality with r = (n_cal + 1) // 10, and
    the per-source eval rejection counts recomputed directly."""
    import hashlib

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        CONFORMAL_ALPHA_DEN,
        text_quality_score,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    meta = {
        r.doc_id: (r.source, r.lang == "en")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    scored = [
        (r.doc_id, r.quality)
        for r in text_quality_score(spark, SF_SMOKE).collect()
        if r.n_tokens > 0 and r.n_chars > 0
    ]

    def is_cal(doc_id: int) -> bool:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 2 == 0

    cal = sorted(q for d, q in scored if is_cal(d) and meta[d][1])
    r0 = (len(cal) + 1) // CONFORMAL_ALPHA_DEN
    threshold = cal[r0 - 1] if r0 >= 1 else None

    exp: dict[str, list[int]] = {}
    for d, q in scored:
        if is_cal(d):
            continue
        src, pos = meta[d]
        e = exp.setdefault(src, [0, 0, 0, 0])
        rej = threshold is not None and q < threshold
        if pos:
            e[0] += 1
            e[1] += rej
        else:
            e[2] += 1
            e[3] += rej

    rows = QUERIES["conformal_quality_threshold"](spark, SF_SMOKE).collect()
    assert {r.source for r in rows} == set(exp)
    for r in rows:
        e = exp[r.source]
        assert (r.n_eval_pos, r.pos_rejected, r.n_eval_neg, r.neg_rejected) == tuple(e)
        assert r.n_cal == len(cal) and r.thresh_rank == r0
        assert r.threshold == threshold
        assert r.pos_reject_rate == e[1] / e[0]
        assert r.neg_reject_rate == e[3] / e[2]


def test_conformal_calibration_rank_guarantee(spark):
    """The threshold construction itself must satisfy the conformal rank
    bound ON THE CALIBRATION SET: exactly thresh_rank - 1 calibration
    positives (plus ties' latitude) lie strictly below the threshold,
    i.e. strictly-below count < thresh_rank <= at-or-below count."""
    import hashlib

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        text_quality_score,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    rows = QUERIES["conformal_quality_threshold"](spark, SF_SMOKE).collect()
    t = rows[0].threshold
    r0 = rows[0].thresh_rank
    if t is None:
        return  # vacuous regime: nothing to pin
    meta = {
        r.doc_id: r.lang == "en"
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    cal = [
        r.quality
        for r in text_quality_score(spark, SF_SMOKE).collect()
        if r.n_tokens > 0
        and r.n_chars > 0
        and meta[r.doc_id]
        and int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) % 2 == 0
    ]
    assert sum(1 for q in cal if q < t) < r0 <= sum(1 for q in cal if q <= t)


def test_dirichlet_ql_matches_python_recompute(spark):
    """Differential replay of the QL scorer: same heavy-term query set
    as bm25, same Dirichlet form, same DECIMAL(18,9) score squash; the
    served per-term ranking must be the Python argsort exactly."""
    import math
    import re as _re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        BM25_TOP_TERMS,
        BM25_TOPK_DOCS,
        QL_MU,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    tf: dict[tuple[int, str], int] = {}
    dl: dict[int, int] = {}
    for r in docs:
        toks = [
            t
            for t in (
                _re.sub("[^0-9a-z]", "", w.lower())
                for w in _re.split(r"\s+", r.text)
            )
            if t
        ]
        dl[r.doc_id] = len(toks)
        for w in toks:
            tf[(r.doc_id, w)] = tf.get((r.doc_id, w), 0) + 1
    dfreq = Counter(w for _, w in tf)
    cf = Counter()
    for (_, w), n in tf.items():
        cf[w] += n
    total = sum(dl.values())
    qset = sorted(dfreq, key=lambda w: (-dfreq[w], w))[:BM25_TOP_TERMS]

    def score(w: str, d: int) -> float:
        p_t = cf[w] / total
        v = math.log((tf[(d, w)] + QL_MU * p_t) / (dl[d] + QL_MU))
        return float(
            Decimal(repr(v)).quantize(
                Decimal("1.000000000"), rounding=ROUND_HALF_UP
            )
        )

    expected: dict[str, list[int]] = {}
    for w in qset:
        cand = [d for (d, w2) in tf if w2 == w]
        cand.sort(key=lambda d: (-score(w, d), d))
        expected[w] = cand[:BM25_TOPK_DOCS]

    got: dict[str, list[tuple[int, int, float]]] = {}
    for r in QUERIES["dirichlet_ql_topk_docs"](spark, SF_SMOKE).collect():
        got.setdefault(r.word, []).append((r.doc_rank, r.doc_id, r.ql))
    assert set(got) == set(expected)
    for w, rows in got.items():
        assert [d for _, d, _ in sorted(rows)] == expected[w], w
        for _, d, ql in rows:
            assert ql == score(w, d)


def test_dirichlet_ql_shrinks_toward_corpus(spark):
    """Structural sanity: scores are negative log-probabilities
    (documents are longer than one term), and within a term, served
    docs are rank-ordered by score."""
    rows = QUERIES["dirichlet_ql_topk_docs"](spark, SF_SMOKE).collect()
    assert rows
    by_w: dict[str, list] = {}
    for r in rows:
        assert r.ql < 0
        assert r.tf >= 1 and r.dl >= r.tf
        by_w.setdefault(r.word, []).append((r.doc_rank, r.ql))
    for w, rs in by_w.items():
        rs.sort()
        assert all(a[1] >= b[1] for a, b in zip(rs, rs[1:])), w


def _python_tokens(text: str) -> list[str]:
    import re

    toks = [re.sub(r"[^0-9a-z]", "", t.lower()) for t in re.split(r"\s+", text)]
    return [t for t in toks if t]


def test_js_divergence_matches_independent_python(spark):
    """Differential guard against formula errors the mirrored oracle
    cannot see: recompute JSD for every pair with a straightforward
    pure-Python Counter implementation (full outer over the union
    vocab, no shared/disjoint decomposition) and require agreement to
    1e-9."""
    import math
    from collections import Counter

    import duckdb

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    dist: dict[str, Counter] = {}
    for source, text in docs:
        dist.setdefault(source, Counter()).update(_python_tokens(text))

    def jsd(pa: Counter, pb: Counter) -> float:
        ta, tb = sum(pa.values()), sum(pb.values())
        s = 0.0
        for w in set(pa) | set(pb):
            p, q = pa[w] / ta, pb[w] / tb
            m = (p + q) / 2
            if p:
                s += 0.5 * p * math.log(p / m)
            if q:
                s += 0.5 * q * math.log(q / m)
        return s

    rows = QUERIES["js_divergence_sources"](spark, SF_SMOKE).collect()
    assert rows
    ln2 = math.log(2.0)
    for r in rows:
        expected = jsd(dist[r.source_a], dist[r.source_b])
        assert abs(r.jsd_nats - expected) < 1e-9, (r.source_a, r.source_b)
        assert -1e-12 <= r.jsd_nats <= ln2 + 1e-12
        assert abs(r.jsd_bits - r.jsd_nats / ln2) < 1e-12


def test_js_divergence_pair_count_and_bounds(spark):
    rows = QUERIES["js_divergence_sources"](spark, SF_SMOKE).collect()
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b  # upper triangle only
        assert r.shared_cnt_a <= r.tokens_a
        assert r.shared_cnt_b <= r.tokens_b


def test_heaps_fit_matches_independent_python(spark):
    """Differential guard: rebuild the bucket/checkpoint curve and the
    ln-ln OLS in pure Python from the parquet and require bit-level
    agreement on the curve and 1e-9 agreement on the fit."""
    import hashlib
    import math

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    btok = [0] * 256
    first: dict[str, int] = {}
    for doc_id, text in docs:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)
        toks = _python_tokens(text)
        btok[b] += len(toks)
        for w in toks:
            first[w] = min(first.get(w, 256), b)
    bvoc = [0] * 256
    for b in first.values():
        bvoc[b] += 1
    cum_t, cum_v, chk = 0, 0, []
    for b in range(256):
        cum_t += btok[b]
        cum_v += bvoc[b]
        if (b + 1) % 16 == 0:
            chk.append((cum_t, cum_v))
    pts = [(math.log(t), math.log(v)) for t, v in chk if t > 0 and v > 0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    beta = (n * sxy - sx * sy) / den

    rows = QUERIES["heaps_law_fit"](spark, SF_SMOKE).collect()
    assert len(rows) == 16
    assert [(r.cum_tokens, r.cum_vocab) for r in rows] == chk
    for r in rows:
        assert r.n_fit_points == n
        assert abs(r.heaps_beta - beta) < 1e-9


def test_rake_matches_independent_python(spark):
    """Differential check: recompute RAKE (segmentation, degree/freq
    word scores, ordered phrase folds, top-K) in pure Python from the
    raw documents and compare the full result bit-exactly."""
    import re as _re

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        EN_STOPS,
        RAKE_TOP_K,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    stops = set(EN_STOPS)
    phrases_per_occ = []  # list of word tuples
    for r in docs:
        cur = []
        for raw in _re.split(r"\s+", r.text):
            w = _re.sub(r"[^0-9a-z]", "", raw.lower())
            if not w:
                continue
            if w in stops:
                if cur:
                    phrases_per_occ.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases_per_occ.append(tuple(cur))
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for ph in phrases_per_occ:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            degree[w] = degree.get(w, 0) + len(ph)
    agg: dict[tuple, list] = {}
    for ph in phrases_per_occ:
        s = 0.0
        for w in ph:  # ordered fold, like the engines
            s += float(degree[w]) / float(freq[w])
        ent = agg.setdefault(ph, [0, s])
        ent[0] += 1
    ranked = sorted(
        ((" ".join(ph), len(ph), n, sc) for ph, (n, sc) in agg.items()),
        key=lambda t: (-t[3], t[0]),
    )[:RAKE_TOP_K]
    got = [
        (r.phrase, r.n_words, r.n_occurrences, r.score)
        for r in QUERIES["rake_keyphrases"](spark, SF_SMOKE).collect()
    ]
    assert got == ranked
    for phrase, n_words, _, score in got:
        assert not (set(phrase.split()) & stops)
        # wscore = degree/freq >= 1, so a phrase scores >= its length
        assert score >= float(n_words)


def test_mcnemar_consistent_with_kappa_cells(spark):
    """McNemar must read the SAME 2x2 confusion as gate_agreement_kappa
    (shared gates), and the continuity-corrected statistic must match
    the closed form recomputed from kappa's off-diagonal counts."""
    k = QUERIES["gate_agreement_kappa"](spark, SF_SMOKE).collect()[0]
    m = QUERIES["mcnemar_gate_test"](spark, SF_SMOKE).collect()[0]
    assert m.n10 == k.n10 and m.n01 == k.n01
    assert m.n_docs == k.n11 + k.n10 + k.n01 + k.n00
    disc = m.n10 + m.n01
    if disc > 0:
        d = abs(m.n10 - m.n01) - 1
        assert m.mcnemar_chi2 == float(d * d) / float(disc)
        assert m.asymmetric_disagreement == (m.mcnemar_chi2 > 3.841)


def test_rm3_expansion_properties(spark):
    """Expansion terms exclude the query term, ranks are dense from 1,
    weights are positive, descending within a query, and every weight
    is a convex-combination mass (<= 1)."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        RM3_EXP_TERMS,
    )

    rows = QUERIES["rm3_expansion_terms"](spark, SF_SMOKE).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.exp_word != r.q_word
        assert 0.0 < r.rm1_weight <= 1.0
        assert 1 <= r.n_fb_docs
        by_q.setdefault(r.q_word, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.exp_rank)
        assert [r.exp_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= RM3_EXP_TERMS
        for a, b in zip(rs, rs[1:]):
            assert a.rm1_weight >= b.rm1_weight


def test_nb_langid_confusion_matches_python(spark):
    """Independent Python recompute of the truncated-profile NB
    classifier (exact decimal scoring) and its confusion cells."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal
    import math
    import re

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        TRIGRAM_TOP_K,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    def toks(text):
        return [
            t
            for t in re.sub(r"[^0-9a-z]+", " ", text.lower()).split()
            if t
        ]

    def sq9(x):
        return Decimal(repr(x)).quantize(
            Decimal("1e-9"), rounding=ROUND_HALF_UP
        )

    docs = [
        (r.doc_id, r.lang, " ".join(toks(r.text)))
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]
    docs = [(i, l, s) for i, l, s in docs if len(s) >= 3]
    prof_counts = {}
    doc_tris = {}
    for i, l, s in docs:
        tris = [s[k : k + 3] for k in range(len(s) - 2)]
        doc_tris[i] = (l, Counter(tris))
        c = prof_counts.setdefault(l, Counter())
        c.update(tris)
    prof = {
        l: dict(
            sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:TRIGRAM_TOP_K]
        )
        for l, c in prof_counts.items()
    }
    vocab = {t for c in prof.values() for t in c}
    V = len(vocab)
    tot = {l: sum(c.values()) for l, c in prof.items()}
    langs = sorted(prof)
    pred_cells = Counter()
    actual_tot = Counter()
    for i, (l, tris) in doc_tris.items():
        best = None
        n_tri = sum(tris.values())
        for pl in langs:
            score = Decimal(0)
            matched = 0
            for t, c in tris.items():
                if t in prof[pl]:
                    score += c * sq9(
                        math.log((prof[pl][t] + 1) / (tot[pl] + V))
                    )
                    matched += c
            score += (n_tri - matched) * sq9(math.log(1.0 / (tot[pl] + V)))
            key = (-score, pl)
            if best is None or key < best:
                best = key
        pred_cells[(l, best[1])] += 1
        actual_tot[l] += 1
    got = QUERIES["nb_langid_confusion"](spark, SF_SMOKE).collect()
    assert {
        (r.lang_actual, r.lang_pred): r.n_docs for r in got
    } == dict(pred_cells)
    for r in got:
        assert r.share == r.n_docs / actual_tot[r.lang_actual]


def test_cochran_q_matches_python(spark):
    """Exact recompute of the 3-gate matched design from the three
    component queries."""
    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        COCHRAN_CHI2_CRIT,
        COCHRAN_K,
        KAPPA_QUALITY_T,
    )

    keep = {
        r.doc_id: r.keep
        for r in QUERIES["c4_style_filter"](spark, SF_SMOKE).collect()
    }
    qual = {
        r.doc_id: r.quality >= KAPPA_QUALITY_T
        for r in QUERIES["text_quality_score"](spark, SF_SMOKE).collect()
    }
    ent = {
        r.doc_id: not r.low_entropy
        for r in QUERIES["text_char_entropy"](spark, SF_SMOKE).collect()
    }
    ids = sorted(set(keep) & set(qual))
    x = [
        (int(keep[i]), int(qual[i]), int(ent.get(i, True))) for i in ids
    ]
    c = [sum(col) for col in zip(*x)]
    t = sum(c)
    sum_r2 = sum((a + b + d) ** 2 for a, b, d in x)
    row = QUERIES["cochran_q_test"](spark, SF_SMOKE).collect()[0]
    assert row.n_docs == len(ids)
    assert (row.pass_c4, row.pass_quality, row.pass_entropy) == tuple(c)
    assert row.sum_r2 == sum_r2
    den = COCHRAN_K * t - sum_r2
    if den > 0:
        q = (
            (COCHRAN_K - 1)
            * (COCHRAN_K * sum(ci * ci for ci in c) - t * t)
            / den
        )
        assert row.q_stat == q
        assert row.significant == (q > COCHRAN_CHI2_CRIT)
    else:
        assert row.q_stat is None


def test_good_turing_identities(spark):
    """GT table reconciles: sum over ALL r of r*N_r equals the token
    count; r* is (r+1)N_{r+1}/N_r; the r=1 row carries the unseen
    mass."""
    import re
    from collections import Counter

    from mapreduce_on_google_cloud_platform_spark.operators.text_analysis import (
        GT_MAX_R,
    )
    from mapreduce_on_google_cloud_platform_spark.sources import load_table

    wc = Counter()
    for r in load_table(spark, SF_SMOKE, "documents").collect():
        wc.update(
            t
            for t in re.sub(r"[^0-9a-z]+", " ", r.text.lower()).split()
            if t
        )
    freq = Counter(wc.values())
    n_tokens = sum(wc.values())
    rows = sorted(
        QUERIES["good_turing_smoothing"](spark, SF_SMOKE).collect(),
        key=lambda r: r.r,
    )
    assert [r.r for r in rows] == sorted(
        r for r in freq if r <= GT_MAX_R
    )
    for row in rows:
        assert row.n_types_r == freq[row.r]
        assert row.n_types_r_plus_1 == freq.get(row.r + 1, 0)
        assert row.r_star == (row.r + 1) * freq.get(row.r + 1, 0) / freq[row.r]
        assert row.n_tokens == n_tokens
        assert row.n_types == len(wc)
        assert row.raw_mass == freq[row.r] * row.r / n_tokens
