"""Raw text-file source and formatted text sink (reference I/O parity).

The reference's only source is a list of UTF-8 text files read whole and
tokenized single-threaded on the master (``/root/reference/master.py:54-64``,
SURVEY.md §2 O1); its only sink is "<key> - <value>" lines appended to one
KV-store blob (``KeyValueStore.py:27-32``, O15/O16).  Here:

* the scan is ``spark.read.text(wholetext=True)`` -- Spark plans one task
  per file, so ingest fans out across executors instead of serializing
  through a driver loop, and ``input_file_name()`` supplies the lineage
  column the reference threads by hand;
* the sink is a distributed ``df.write.text`` of the formatted lines --
  every partition writes its own part file; nothing funnels through a
  single blob/process the way the reference's final.txt did.

Columns match the ``documents`` table contract (``doc``/``text``) so every
text operator (tokenizer, wordcount, dedup, quality) runs unchanged on
files or parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_documents(
    spark: SparkSession, paths: str | list[str], doc_col: str = "doc"
) -> DataFrame:
    """Whole-file text scan -> (doc, text); doc = basename, as in the
    reference's ``(word, file)`` lineage pairs (``master.py:62``)."""
    df = spark.read.text(paths, wholetext=True)
    return df.select(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.txt)?$", 1).alias(doc_col),
        F.col("value").alias("text"),
    )


DOCUMENTS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def read_documents_any(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """documents-shaped table from any columnar/row format Spark reads
    (parquet, csv, json, orc).  The explicit schema matters twice over at
    scale: csv/json infer-schema triggers a full extra pass over the
    data, and inferred types can drift per partition sample."""
    reader = spark.read.format(fmt).schema(DOCUMENTS_DDL)
    if fmt == "csv":
        reader = reader.option("header", "true").option("multiLine", "true").option(
            "escape", '"'
        )
    return reader.load(path)


def read_documents_json_tolerant(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE jsonl read with corrupt-record capture: malformed lines
    become rows with every data column null and the raw line preserved in
    ``_corrupt_record``, instead of failing the job.  The quarantine
    pattern for 100 TB ingest -- one bad line in a billion must not kill
    the batch, and the quarantined rows keep enough to debug/replay
    (filter ``_corrupt_record IS NOT NULL`` to a side table)."""
    schema = DOCUMENTS_DDL + ", _corrupt_record STRING"
    return (
        spark.read.format("json")
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .load(path)
    )


def write_reference_text(lines: DataFrame, path: str) -> None:
    """Write a one-string-column DataFrame as text part files (the Spark
    shape of the reference's final.txt collect, ``master.py:205-213``)."""
    cols = lines.columns
    lines.select(F.col(cols[0]).cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(path)
