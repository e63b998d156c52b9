"""Handler presets + the general user-function escape hatch (reference R3-R5).

The reference's Handler is ``func(msg Message) []elasticsearch.Action``
(handler.go:7): a per-event flatMap — 0 actions filters the event (acked,
not written), 1..N actions fan out. The engine keeps the three canonical
handlers from the reference's tests/examples as *declarative* presets
(pure column algebra — Catalyst can push filters below them), and offers
``python_handler`` for arbitrary user logic (Arrow-batched, the sanctioned
slow path).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark import model
from go_pq_cdc_elasticsearch_spark.sink.actions import (
    ACTION_SCHEMA,
    SCRIPT_UPDATE,
    actions_from_envelope,
)


def simple_handler(envelope: DataFrame, id_field: str = "id") -> DataFrame:
    """The canonical simple handler (example/simple/main.go:109-130):
    insert/update/snapshot -> Index action with the new image enriched with
    an 'operation' field; delete -> Delete action keyed by the old image."""
    return actions_from_envelope(envelope, id_field=id_field)


def snapshot_handler(envelope: DataFrame, id_field: str = "id") -> DataFrame:
    """Snapshot-mode handler (integration_test/snapshot_test.go:312-376):
    only SNAPSHOT + INSERT events become documents; the op type is kept on
    the document so tests can assert arrival phase."""
    filtered = envelope.filter(
        model.is_snapshot() | model.is_insert()
    )
    return actions_from_envelope(filtered, id_field=id_field)


def script_update_handler(
    envelope: DataFrame,
    id_field: str = "id",
    script_source: str = "ctx._source.version += 1; ctx._source.stock += params.delta",
    delta_field: str = "value",
) -> DataFrame:
    """Scripted-update handler (example/script-update/main.go:110-187):
    update events -> script_update actions carrying a Painless script with
    params (passed through verbatim in live-ES mode; the materialized-view
    engine evaluates the equivalent merge expressions, Q-C4)."""
    upd = envelope.filter(model.is_update())
    # params.delta must serialize as a NUMBER: new_data is
    # map<string,string>, and a map-valued params emitted {"delta":"5.0"}
    # — Painless then executes `stock += "5.0"` (string concat /
    # ClassCastException) in live-ES passthrough. A typed struct with a
    # double cast makes to_json emit {"delta":5.0}, matching the numeric
    # param the reference example sends (example/script-update/main.go).
    script = F.to_json(
        F.struct(
            F.lit(script_source).alias("source"),
            F.struct(
                # try_cast, not cast: under the session's default ANSI
                # mode a malformed (non-numeric) delta string in one
                # envelope would otherwise kill the whole micro-batch
                # with CAST_INVALID_INPUT — degrade it to a NULL param
                # like the other ANSI guards, and let the sink's error
                # routing (R13) handle the document-level failure.
                F.col("new_data").getItem(delta_field).try_cast("double").alias("delta")
            ).alias("params"),
        )
    )
    return upd.select(
        F.col("seq"),
        F.lit(SCRIPT_UPDATE).alias("action"),
        F.col("new_data").getItem(id_field).alias("doc_id"),
        F.col("index") if "index" in upd.columns else F.lit(None).cast("string").alias("index"),
        F.lit(None).cast("string").alias("routing"),
        script.alias("source"),
    ).filter(F.col("doc_id").isNotNull())


def python_handler(
    fn: Callable[[dict], list[dict]],
) -> Callable[[DataFrame], DataFrame]:
    """Wrap a user function msg-dict -> list of action-dicts into a
    DataFrame transform (the general Handler contract, handler.go:7).

    Runs via mapInPandas (Arrow batches); returning [] filters the event —
    identical to the reference's empty-result ack-and-drop
    (connector.go:155-160). Action dicts need keys: action, doc_id, index;
    optional: routing, source. ``seq`` is propagated for dedup ordering.
    """

    def transform(envelope: DataFrame) -> DataFrame:
        # programmatic StructType, not simpleString() slicing: the string
        # surgery (':'->' ', ','->', ') only survives while every action
        # field is a bare primitive — a future map/struct field would be
        # silently corrupted into unparseable DDL (review r5)
        from pyspark.sql import types as T

        out_schema = T.StructType(
            [T.StructField("seq", T.LongType(), True), *ACTION_SCHEMA.fields]
        )

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                out = []
                for msg in pdf.to_dict("records"):
                    for act in fn(msg) or []:
                        if act.get("doc_id") is None:
                            # parity with the declarative handlers, which
                            # end in .filter(doc_id.isNotNull()): a keyless
                            # action is dropped, NOT stringified — str(None)
                            # used to emit doc_id "None", colliding every
                            # such row onto one literal document id
                            continue
                        out.append(
                            {
                                "seq": msg.get("seq"),
                                "action": act["action"],
                                "doc_id": str(act["doc_id"]),
                                "index": act.get("index"),
                                "routing": act.get("routing"),
                                "source": act.get("source")
                                if isinstance(act.get("source"), (str, type(None)))
                                else json.dumps(act.get("source")),
                            }
                        )
                yield pd.DataFrame(
                    out,
                    columns=["seq", "action", "doc_id", "index", "routing", "source"],
                )

        return envelope.mapInPandas(run, schema=out_schema)

    return transform
