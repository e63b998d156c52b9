"""CDC envelope model.

Reference: the ``Message`` struct (reference ``message.go:11-21``) carries
op type, event time, table identity and old/new row images; the four
constructors (``message.go:23-69``) normalize upstream insert/update/delete/
snapshot formats into that one envelope; op predicates at ``message.go:80-83``.

Spark-first design: the envelope is a fixed StructType; payloads are
``map<string,string>`` with JSON-encoded values (the reference's
``map[string]any`` analog) and an explicit ``seq`` column carrying the total
order the Go stream gets implicitly from arrival order (LSN). Everything
downstream (routing, handlers, dedup, apply) is pure column algebra so
Catalyst can push filters below it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Op constants — reference message.go:71-78.
INSERT = "INSERT"
UPDATE = "UPDATE"
DELETE = "DELETE"
SNAPSHOT = "SNAPSHOT"

OPS = (INSERT, UPDATE, DELETE, SNAPSHOT)

PAYLOAD_TYPE = T.MapType(T.StringType(), T.StringType())

# The engine's change-event envelope (FIXTURES.md §B).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        # NTZ, not instant: envelope_from_events emits the catalog's
        # TIMESTAMP_NTZ wall time — an instant here converts through the
        # session zone on every cast/union against real envelopes, the
        # exact DST-sensitivity class functions/time.py exists to prevent
        # (review r6)
        T.StructField("event_time", T.TimestampNTZType(), True),
        T.StructField("table_schema", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("old_data", PAYLOAD_TYPE, True),
        T.StructField("new_data", PAYLOAD_TYPE, True),
    ]
)


# Predicates — reference message.go:80-83 (IsInsert/IsUpdate/IsDelete/IsSnapshot).
def _op_col(col):
    """Accept a Column OR a column-name string (the usual PySpark
    convention). A bare string used to fall into Column.__eq__ reflection
    — lit('INSERT') == lit('op'), a constant-FALSE predicate that silently
    matched zero rows instead of referencing the column (review r5)."""
    if col is None:
        return F.col("op")
    return F.col(col) if isinstance(col, str) else col


def is_insert(col=None):
    return _op_col(col) == F.lit(INSERT)


def is_update(col=None):
    return _op_col(col) == F.lit(UPDATE)


def is_delete(col=None):
    return _op_col(col) == F.lit(DELETE)


def is_snapshot(col=None):
    return _op_col(col) == F.lit(SNAPSHOT)


def envelope_from_events(events: DataFrame, table: str = "public.events") -> DataFrame:
    """Normalize the testdata ``events`` table into the CDC envelope.

    ``events`` is the replayable change feed (FIXTURES.md): ``event_id`` is
    the total order (seq/LSN), ``user_id`` the upsert key, ``event_type`` the
    op, ``value``/``props`` the payload. Mirrors the reference's
    NewInsertMessage/... normalization (message.go:23-69): INSERT/UPDATE/
    SNAPSHOT carry new_data, DELETE carries old_data only (message.go:54).
    """
    schema_name, _, table_name = table.rpartition(".")
    payload = F.create_map(
        F.lit("id"), F.col("user_id").cast("string"),
        F.lit("value"), F.col("value").cast("string"),
        F.lit("props"), F.col("props"),
    )
    op = F.upper(F.col("event_type"))
    return events.select(
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.col("ts").alias("event_time"),
        F.lit(schema_name or "public").alias("table_schema"),
        F.lit(table_name).alias("table_name"),
        F.when(op == DELETE, payload).alias("old_data"),
        F.when(op != DELETE, payload).alias("new_data"),
    )


def remap_op_payloads(env: DataFrame, op_mapping) -> DataFrame:
    """Apply an op-label remap AND re-seat the payload columns to match
    the envelope contract (DELETE carries old_data only, everything else
    new_data only).

    The payload rewrite must be ONE select reading the ORIGINAL
    old_data/new_data: sequenced withColumns first nulls old_data for a
    row remapped DELETE->non-delete, so the second rewrite's
    coalesce("new_data", "old_data") — written exactly for that row —
    reads the already-nulled value and the row vanishes from the bulk
    with no error (the keyless-action doc_id filter drops it). This
    exact bug was fixed in run_es_pipeline and hand-mirrored into
    q_c11; one shared helper ends the divergence risk (review r8)."""
    env = env.withColumn("op", op_mapping(F.col("op")))
    return env.select(
        *[
            F.when(is_delete(), F.coalesce("old_data", "new_data")).alias(
                "old_data"
            )
            if c == "old_data"
            else F.when(~is_delete(), F.coalesce("new_data", "old_data")).alias(
                "new_data"
            )
            if c == "new_data"
            else c
            for c in env.columns
        ]
    )


def payload_field(df_col: str, field: str):
    """Extract one field from a map payload column (R5 key extraction,
    reference integration_test/connector_test.go:628-638)."""
    return F.col(df_col).getItem(field)
