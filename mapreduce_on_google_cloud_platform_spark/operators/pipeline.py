"""Composed curation pipeline: quality gate -> exact dedup -> source stats.

The end-to-end shape of a training-data curation pass, declared as ONE
plan so Catalyst optimizes across stage boundaries (the token count
feeds both the gate and the stats without recomputation; the scan is
shared).  Stages:

1. signal: token count per doc (tokenizer from functions/text.py);
2. gate: keep docs with >= MIN_TOKENS tokens;
3. dedup: among gated docs, one winner per exact content hash
   (md5 of whitespace-normalized lowercase text, min doc_id wins) --
   expressed as a window min over the hash, NOT a groupBy+join-back, so
   the pipeline stays a single pass over the gated set;
4. report: per-source funnel (docs in, gated, kept, tokens kept, kept
   ratio as a single exact-int division).

At 100 TB: one scan of documents, one shuffle on content hash (the
window), one combinable shuffle on source for the report.  Every number
is an integer sum until the final division, so any partitioning gives
identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..sources import load_table

MIN_TOKENS = 50


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation funnel over the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    base = docs.select(
        "doc_id",
        "source",
        F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.md5(norm).alias("content_hash"),
    ).withColumn("is_pass", F.col("n_tokens") >= MIN_TOKENS)
    w = Window.partitionBy("content_hash")
    flagged = base.withColumn(
        "keep_id",
        F.min(F.when(F.col("is_pass"), F.col("doc_id"))).over(w),
    ).withColumn(
        "is_kept", F.col("is_pass") & (F.col("doc_id") == F.col("keep_id"))
    )
    kept_i = F.col("is_kept").cast("bigint")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs_in"),
        F.sum(F.col("is_pass").cast("bigint")).alias("n_pass"),
        F.sum(kept_i).alias("n_kept"),
        F.sum(F.when(F.col("is_kept"), F.col("n_tokens")).otherwise(0)).alias(
            "tokens_kept"
        ),
        (
            F.sum(kept_i).cast("double") / F.count("*")
        ).alias("kept_ratio"),
    )


CURATION_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, source,
               CAST(len(list_filter(
                   list_transform(regexp_split_to_array(text, '\\s+'),
                                  t -> regexp_replace(lower(t), '[^0-9a-z]', '', 'g')),
                   x -> x <> '')) AS BIGINT) AS n_tokens,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash
        FROM documents
    ),
    flagged AS (
        SELECT *,
               n_tokens >= {MIN_TOKENS} AS is_pass,
               min(CASE WHEN n_tokens >= {MIN_TOKENS} THEN doc_id END)
                   OVER (PARTITION BY content_hash) AS keep_id
        FROM base
    ),
    kept AS (
        SELECT *, is_pass AND doc_id = keep_id AS is_kept FROM flagged
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs_in,
           CAST(sum(CASE WHEN is_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN is_kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
           CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS kept_ratio
    FROM kept
    GROUP BY source
"""


PIPELINE_QUERIES: list[tuple[str, object, str | None]] = [
    ("curation_pipeline", curation_pipeline, CURATION_ORACLE),
]
