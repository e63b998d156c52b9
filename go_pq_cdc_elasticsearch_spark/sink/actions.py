"""Sink action model (reference ``elasticsearch/action.go``).

An action is one keyed document operation: Index (upsert), Delete, or
ScriptUpdate, with optional routing and per-action index override
(``action.go:13-19``; constructors ``action.go:26-51``). In the engine an
action is a row of the write-plan DataFrame with columns
(action, doc_id, index, routing, source) — see FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ActionType constants — reference elasticsearch/action.go:5-11.
INDEX = "index"
DELETE = "delete"
SCRIPT_UPDATE = "script_update"

ACTION_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("index", T.StringType(), True),
        T.StructField("routing", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def actions_from_envelope(
    envelope: DataFrame,
    id_field: str = "id",
    delete_op: str = "DELETE",
    index_col: str = "index",
) -> DataFrame:
    """Default handler: envelope -> write-plan actions.

    Mirrors the reference's canonical simple handler
    (example/simple/main.go:109-130): insert/update/snapshot -> Index action
    with the (enriched) new image as the document; delete -> Delete action
    keyed by the old image's id. Keeps ``seq`` for in-batch dedup ordering.
    """
    if index_col == "index" and "index" not in envelope.columns:
        # same guard as script_update_handler: an UNROUTED envelope
        # (ENVELOPE_SCHEMA has no 'index' column until IndexRouter.route
        # attaches one) must produce NULL-index actions that the sink's
        # framing then rejects LOUDLY with doc context (frame_actions) —
        # not an opaque UNRESOLVED_COLUMN AnalysisException at plan time.
        # The three preset handlers share one contract (review r5).
        envelope = envelope.withColumn("index", F.lit(None).cast("string"))
    is_del = F.col("op") == F.lit(delete_op)
    payload = F.when(is_del, F.col("old_data")).otherwise(F.col("new_data"))
    # drop a pre-existing 'operation' key before the concat: the reference
    # OVERWRITES it (msg.NewData["operation"] = msg.Type is a Go map
    # assignment), whereas Spark's map_concat under the default
    # mapKeyDedupPolicy=EXCEPTION would crash-loop the stream on the first
    # table that has a real column of that name
    enriched = F.map_concat(
        F.map_filter(F.col("new_data"), lambda k, _v: k != F.lit("operation")),
        F.create_map(F.lit("operation"), F.col("op")),
    )
    return envelope.select(
        F.col("seq"),
        F.when(is_del, F.lit(DELETE)).otherwise(F.lit(INDEX)).alias("action"),
        payload.getItem(id_field).alias("doc_id"),
        # alias: ACTION_SCHEMA and the bulk writer address the column as
        # 'index' — a custom index_col crashed frame_actions otherwise
        F.col(index_col).alias("index"),
        F.lit(None).cast("string").alias("routing"),
        F.when(is_del, F.lit(None).cast("string"))
        .otherwise(F.to_json(enriched))
        .alias("source"),
    ).filter(F.col("doc_id").isNotNull())
