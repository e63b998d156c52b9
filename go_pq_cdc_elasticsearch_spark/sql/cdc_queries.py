"""CDC-core declared queries (SURVEY.md §2.2 Q-C1..Q-C10).

These express the reference's actual semantics — last-write-wins keyed
apply, in-batch dedup, scripted-update-as-merge, op metrics, snapshot chunk
coverage — over the replayable ``events`` change feed (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.cdc import (
    cdc_apply,
    cdc_dedup,
    op_index_metrics,
    scripted_update_merge,
)
from go_pq_cdc_elasticsearch_spark.sql.registry import query


@query(
    "q_c1_cdc_apply",
    oracle="""
        WITH ranked AS (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events
        )
        SELECT user_id, event_type, value
        FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    doc="Materialize current state == ES index content: last event per key "
    "wins; delete removes (reference bulk/bulk.go:141-157 + keyed sink). "
    "'error' plays the DELETE op (the synthetic feed has no literal "
    "'delete' rows), so keys whose last event is a delete are absent — "
    "this single entry exercises both the LWW and the live-delete paths "
    "(former q_c1b, folded for the driver's 50-entry window; the "
    "delete-free LWW path stays driver-checked via q_c3).",
)
def q_c1_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return cdc_apply(events, delete_op="error").select(
        "user_id", "event_type", "value"
    )


@query(
    "q_c2_cdc_dedup",
    oracle="""
        SELECT count(*) AS n_keys
        FROM (SELECT user_id, max(event_id) FROM events GROUP BY user_id)
    """,
    doc="In-batch last-write-wins count (reference bulk/bulk.go:141-157).",
)
def q_c2_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return cdc_dedup(events).agg(F.count(F.lit(1)).alias("n_keys"))


@query(
    "q_c3_replay_idempotence",
    oracle="""
        WITH ranked AS (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
            FROM events
        )
        SELECT user_id, event_type, value
        FROM ranked WHERE rn = 1 AND event_type <> 'delete'
    """,
    doc="Replay idempotence (reference at-least-once + idempotent upsert ⇒ "
    "exactly-once on the view): apply(events ∪ events) == apply(events).",
)
def q_c3_replay_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    replayed = events.unionAll(events)  # simulate redelivery of every event
    return cdc_apply(replayed).select("user_id", "event_type", "value")


@query(
    "q_c4_scripted_update",
    oracle="""
        SELECT user_id, count(*) AS version,
               -- CAST(... AS DOUBLE), NOT AS BIGINT: DuckDB's sum(BIGINT)
               -- widens to HUGEINT and the BIGINT cast errors out-of-range
               -- on exactly the per-user sums the Spark side's
               -- DECIMAL(38,0) accumulation survives (review r7); the
               -- double conversion is correctly rounded in both engines
               CAST(sum(CASE WHEN abs(value) < 9.0e14 THEN
                   CAST(floor(value * 10000.0 + 0.5) AS BIGINT) END) AS DOUBLE)
                   / 10000.0 AS stock
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    """,
    doc="Scripted-update-as-merge (reference elasticsearch/action.go:43-51, "
    "example/script-update/main.go): versioned counter + stock delta per key "
    "('purchase' plays the update op in the synthetic feed).",
)
def q_c4_scripted_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return scripted_update_merge(events, update_op="purchase")


@query(
    "q_c5_op_metrics",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    doc="Per-op counters (reference elasticsearch/bulk/metric.go:75-112).",
)
def q_c5_op_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return op_index_metrics(events)


@query(
    "q_c6_snapshot_coverage",
    oracle="""
        SELECT count(*) AS n_rows,
               count(DISTINCT l_orderkey * 10 + l_linenumber) AS n_distinct,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem
    """,
    doc="Snapshot chunk coverage (upstream U1): the partitioned read is "
    "complete and disjoint (reference README.md:21-47 snapshot modes).",
)
def q_c6_snapshot_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Read through the snapshot source (partitioned) rather than a plain
    # scan, so the query exercises the chunked-read path.
    from go_pq_cdc_elasticsearch_spark.sources.snapshot import snapshot_read

    li = snapshot_read(spark, sf_dir, "lineitem", chunk_size=8000)
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
            "n_distinct"
        ),
        # DECIMAL-accumulated, DOUBLE out (repo float policy): a raw
        # double sum is accumulation-order-sensitive between engines;
        # exactness today rests only on l_quantity being integer-valued,
        # which FIXTURES.md does not promise — only the double type
        F.sum(F.col("l_quantity").cast("decimal(30,10)"))
        .cast("double")
        .alias("sum_qty"),
    )


@query(
    "q_c7_chunk_split",
    oracle="SELECT ((count(*) - 1) // 8000) + 1 AS n_chunks FROM lineitem",
    doc="Chunk-split arithmetic (reference internal/slices/slices.go:3-16, "
    "default snapshot chunk size 8000 README.md:224).",
)
def q_c7_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # EMPTY-table convention (empty_rel variant): (0-1)/8000 truncates
    # toward zero in BOTH engines (Spark double->long cast, DuckDB's //),
    # so both answer 1. Python's // FLOORS (-1//8000 == -1), so porting
    # this expression to driver-side Python arithmetic would diverge;
    # the pure helper operators/chunks.py::chunk_count returns 0 for n=0
    # by its own documented contract — different convention, same family.
    return li.agg(
        (((F.count(F.lit(1)) - 1) / 8000).cast("long") + 1).alias("n_chunks")
    )


@query(
    "q_c9_envelope_filter",
    oracle="SELECT count(*) AS n FROM events WHERE event_type IN ('insert', 'update')",
    doc="Envelope op predicates (reference message.go:80-83) as pushable "
    "column filters.",
)
def q_c9_envelope_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").isin("insert", "update")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_c10_projection",
    oracle="""
        SELECT event_id, event_type AS operation, upper(event_type) AS op_u
        FROM events WHERE event_id <= 100
    """,
    doc="Projection/enrichment inside handlers (reference "
    "example/simple/main.go:122 adds msg.NewData['operation']).",
)
def q_c10_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") <= 100).select(
        "event_id",
        F.col("event_type").alias("operation"),
        F.upper("event_type").alias("op_u"),
    )
