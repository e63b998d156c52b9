"""PySpark-native analytics engine with the data-processing capabilities of
Trendyol/go-pq-cdc-elasticsearch (reference studied at /root/reference).

The reference is a streaming CDC pipeline: Postgres WAL -> change messages ->
user transform -> deduplicated, micro-batched keyed upsert/delete writes to
Elasticsearch. This engine re-expresses those semantics Spark-first
(DataFrame / SQL / Structured Streaming, Catalyst-optimized) and extends them
with the relational + LLM-pipeline surface described in SURVEY.md §2.

Layout:
    session      SparkSession factory tuned for the target environment
    catalog      testdata table loader / view registrar
    model        CDC envelope schema + op constants (ref: message.go)
    routing      table -> index resolution (ref: connector.go:174-249)
    handlers     handler presets (ref: handler.go, examples)
    operators/   cdc apply/dedup, as-of join, dedup family, similarity, text
    sink/        action model, NDJSON bulk framing, materialized-view writer
    sources/     snapshot (partitioned batch) + file-replay stream sources
    streaming/   end-to-end CDC stream pipeline + window helpers
    sql/         declared-query registry (single source of truth for
                 __spark_entry__.queries() / oracle_sql())
"""

__version__ = "0.1.0"
