"""PySpark-native analytics engine with the query surface of
manishask112/MapReduce-on-Google-Cloud-Platform, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a from-scratch MapReduce
framework: multi-file text scan -> tokenize -> hash-shuffle -> sort-based
group-by, with two shipped queries (word count, inverted document index).
Here every operator is re-expressed as a declarative DataFrame plan so that
Catalyst/Tungsten (pushdown, partial aggregation, whole-stage codegen, AQE)
provide the physical execution the reference hand-rolled over HTTP + a
pickle blob store.

Layout:
    session        -- tuned SparkSession builder
    sources        -- table loaders / schema registry for the testdata star schema
    functions      -- shared column expressions (tokenizer, portable hashing, vectors)
    operators      -- query builders: wordcount, relational, dedup, similarity,
                      text_analysis, multimodal
    streaming      -- event-time windowing (batch-first + Structured Streaming)
    plans          -- the declared query registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
