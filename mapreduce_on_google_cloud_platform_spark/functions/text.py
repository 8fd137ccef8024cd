"""Shared tokenizer column expressions.

Reference semantics (``/root/reference/master.py:58-62``):
  1. split on any whitespace (``str.split()``)
  2. lowercase
  3. delete every char matching ``[\\W_]+`` from the token -- punctuation is
     removed, NOT a split point (``Don't`` -> ``dont``, ``quick-brown`` ->
     ``quickbrown``); digits survive.

Two deliberate deviations, pinned here as the single source of truth:

* The character class is the explicit ASCII ``[^0-9a-z]`` (applied after
  lowercasing) rather than Python's unicode-aware ``\\W``.  Java regex,
  RE2 (DuckDB) and Python all agree on this class, so the Spark plan and
  the DuckDB oracle tokenize identically (SURVEY.md §7 risk (b)).
* Tokens that clean to the empty string are dropped.  The reference counts
  them but its streaming group-by restarts the group on every empty key
  (``MapReduce.py:147``, SURVEY.md §4 defect 6) -- the behavior was a bug,
  not a contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Applied AFTER lower(); deletes everything that is not [0-9a-z].
TOKEN_CLEAN_RE = "[^0-9a-z]"
# str.split() splits on any whitespace run.
TOKEN_SPLIT_RE = r"\s+"

# DuckDB fragments for the same pipeline, used by oracle SQL builders.
DUCKDB_TOKENIZE = (
    "regexp_replace(lower(__tok), '[^0-9a-z]', '', 'g')"
)


def clean_token(col: Column) -> Column:
    """lower + strip non-alphanumerics (reference O3+O4 as one expression)."""
    return F.regexp_replace(F.lower(col), TOKEN_CLEAN_RE, "")


def tokenize(text: Column) -> Column:
    """text -> array<string> of cleaned, non-empty tokens (O2-O4).

    Kept as the transform/filter lambda form DELIBERATELY (optimization
    round 12): an equivalent scalar chain (lower -> delete non-[0-9a-z\\s]
    -> trim -> collapse \\s+ -> split(' ')) was built, proven bit-equal
    on a 2,027-case adversarial differential AND the full-registry
    oracle sweep, and then MEASURED SLOWER -- 84.0 s vs 53.7 s summed
    over the 25 tokenize-consuming headline queries at sf0.1: three
    whole-document regexp passes per reference cost more than the
    per-token lambda interpretation they replace.  Rewrites that DID
    win (winnowing_fingerprints, shingles_df) drop the array form
    entirely for posexplode + scalar clean_token + lead windows; do
    that shape, not a tokenize() swap, when a consumer shows up hot."""
    return F.filter(
        F.transform(F.split(text, TOKEN_SPLIT_RE), clean_token),
        lambda w: w != F.lit(""),
    )


def tokens_df(documents: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents(doc, text) -> one row per token with lineage (O1-O5).

    The reference materializes this list on the master and chunks it by
    hand (``master.py:54-84``, dropping ``len % map_num`` trailing tokens);
    here it is a distributed project+explode that never touches the driver.

    Formulation: explode the raw whitespace split FIRST, then clean/filter
    the exploded column with scalar expressions.  Identical semantics to
    ``explode(tokenize(...))`` but the scalar form stays inside
    whole-stage codegen, while transform/filter lambdas run interpreted
    (SCALING.md pitfall 1) and cost ~4x on the first compile."""
    return (
        documents.select(
            F.col(doc_col),
            F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("_tok"),
        )
        .select(F.col(doc_col), clean_token(F.col("_tok")).alias("word"))
        .filter(F.col("word") != "")
    )


def tokens_with_pos(documents: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Like ``tokens_df`` but keeps each token's ORDER key: ``pos`` is the
    index in the raw whitespace split, so it is sparse where tokens
    cleaned to empty were dropped — callers must treat it as an ordering,
    not a dense 0..n-1 index (windows ordered by pos see exactly the
    cleaned token sequence).  Same scalar-after-posexplode formulation as
    tokens_df, for the same codegen reason."""
    return (
        documents.select(
            F.col(doc_col),
            F.posexplode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias(
                "pos", "_tok"
            ),
        )
        .select(F.col(doc_col), "pos", clean_token(F.col("_tok")).alias("word"))
        .filter(F.col("word") != "")
    )


def shingles(tokens: Column, n: int = 3) -> Column:
    """array of n-word shingles (overlapping token windows joined by ' ').

    Guarded so short docs yield an empty array -- Spark's ``sequence(1, k)``
    with k < 1 would generate a *descending* sequence, not an empty one.
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    win = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, win).otherwise(
        F.array().cast("array<string>")
    )


def shingles_df(documents: DataFrame, n: int = 3) -> DataFrame:
    """documents -> distinct (doc_id, sh) shingle rows.

    Relational formulation: posexplode tokens once, then lead() windows
    build each n-gram.  The array-expression form (explode(shingles(
    tokenize(text)))) inlines the tokenize chain into every element_at --
    Catalyst re-evaluates it per element, measured 26s for 5k docs vs ~2s
    for this plan.  One shuffle on doc_id; all expressions codegen."""
    from pyspark.sql import Window

    toks = tokens_with_pos(documents)
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("word")] + [F.lead("word", k).over(w) for k in range(1, n)]
    return (
        toks.select(
            "doc_id",
            *[lead.alias(f"_w{k}") for k, lead in enumerate(leads)],
        )
        .filter(F.col(f"_w{n-1}").isNotNull())
        .select("doc_id", F.concat_ws(" ", *[f"_w{k}" for k in range(n)]).alias("sh"))
        .distinct()
    )


# DuckDB CTEs producing the identical token-array / distinct-shingle stream.
DUCKDB_TOKS_CTE = """
    toks AS (
        SELECT doc_id,
               list_filter(
                   list_transform(regexp_split_to_array(text, '\\s+'),
                                  t -> regexp_replace(lower(t), '[^0-9a-z]', '', 'g')),
                   x -> x <> '') AS ts
        FROM documents
    )
"""

DUCKDB_SHINGLES_CTE = (
    DUCKDB_TOKS_CTE
    + """,
    shing AS (
        SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
        FROM toks, unnest(range(1, len(ts) - 1)) t(i)
    )
"""
)


def duckdb_tokens_sql(doc_col: str = "doc_id", text_col: str = "text", table: str = "documents") -> str:
    """DuckDB SQL producing the identical (doc, word) token stream."""
    return f"""
        SELECT {doc_col},
               regexp_replace(lower(tok), '[^0-9a-z]', '', 'g') AS word
        FROM (
            SELECT {doc_col}, unnest(regexp_split_to_array({text_col}, '\\s+')) AS tok
            FROM {table}
        )
        WHERE regexp_replace(lower(tok), '[^0-9a-z]', '', 'g') <> ''
    """
