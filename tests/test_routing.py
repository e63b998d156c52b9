"""Table->index routing (reference connector.go:174-249) — Q-C8."""

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.routing import IndexRouter

MAPPING = {
    "public.users": "users-idx",
    "public.orders": "orders-idx",
    "metrics.cpu": "cpu-idx",
}


def router():
    return IndexRouter(
        MAPPING,
        hypertable_parents={"_hyper_1_2_chunk": "public.cpu_metrics"},
    )


def test_exact_match():
    assert router().resolve("public", "users") == "users-idx"


def test_partition_parent_prefix_probe():
    # findParentTable (connector.go:239-246) probes PROPER prefixes
    # SHORTEST first: a_b_2024_01 -> probe a, a_b, a_b_2024. With
    # overlapping entries the SHORTER prefix wins.
    r = IndexRouter({"public.orders_eu": "eu-idx", "public.orders": "orders-idx"})
    assert r.resolve("public", "orders_eu_2024_01") == "orders-idx"  # 'orders' probed first
    assert r.resolve("public", "orders_2024") == "orders-idx"
    assert r.resolve("public", "orders") == "orders-idx"
    r2 = IndexRouter({"public.orders_eu": "eu-idx"})
    assert r2.resolve("public", "orders_eu_2024_01") == "eu-idx"
    # full name is never probed as its own prefix (exact match handles it)
    r3 = IndexRouter({"public.a_b": "ab-idx"})
    assert r3.resolve("public", "a_b") == "ab-idx"  # exact, not probe


def test_prefix_probe_column_path_matches_resolve(spark):
    # the column-expression probe must agree with the driver-side resolver,
    # including the overlapping-prefix order (ADVICE round 1)
    r = IndexRouter({"public.a": "a-idx", "public.a_b": "ab-idx"})
    cases = [("public", "a_b_2024"), ("public", "a_b"), ("public", "a_x")]
    df = spark.createDataFrame(cases, "table_schema string, table_name string")
    got = {
        (row["table_schema"], row["table_name"]): row["index"]
        for row in r.route(df, drop_unmapped=False).collect()
    }
    for s, t in cases:
        assert got[(s, t)] == r.resolve(s, t), (s, t)
    assert got[("public", "a_b_2024")] == "a-idx"  # shortest prefix wins
    assert got[("public", "a_b")] == "ab-idx"  # exact beats probe


def test_hypertable_parent():
    r = IndexRouter(
        {"public.cpu_metrics": "cpu-idx"},
        hypertable_parents={"_hyper_1_2_chunk": "cpu_metrics"},
    )
    assert r.resolve("public", "_hyper_1_2_chunk") == "cpu-idx"


def test_unmapped_returns_none():
    assert router().resolve("public", "unknown_table") is None


def test_route_column_path(spark):
    df = spark.createDataFrame(
        [
            ("public", "users", 1),
            ("public", "orders_2024_05", 2),
            ("public", "nope", 3),
            ("metrics", "cpu", 4),
        ],
        "table_schema string, table_name string, v int",
    )
    out = router().route(df).select("v", "index").collect()
    got = {r["v"]: r["index"] for r in out}
    # unmapped row 3 dropped (reference acks-and-drops, connector.go:147-152)
    assert got == {1: "users-idx", 2: "orders-idx", 4: "cpu-idx"}


def test_route_keep_unmapped(spark):
    df = spark.createDataFrame(
        [("public", "nope", 1)], "table_schema string, table_name string, v int"
    )
    out = router().route(df, drop_unmapped=False).collect()
    assert out[0]["index"] is None


def test_route_hypertable_chunk_under_real_schema(spark):
    # TimescaleDB puts chunk tables in _timescaledb_internal, NOT the
    # parent's schema: a name-only chunk key must match under any schema
    # in the COLUMN path too (resolve() already did via its name-only
    # fallback — the two paths diverged and every real chunk event was
    # silently dropped)
    r = IndexRouter(
        {"public.cpu_metrics": "cpu-idx"},
        hypertable_parents={"_hyper_1_2_chunk": "public.cpu_metrics"},
    )
    df = spark.createDataFrame(
        [("_timescaledb_internal", "_hyper_1_2_chunk", 1)],
        "table_schema string, table_name string, v int",
    )
    out = r.route(df).collect()
    assert out[0]["index"] == "cpu-idx"
    assert r.resolve("_timescaledb_internal", "_hyper_1_2_chunk") == "cpu-idx"


def test_route_prefix_probe_depth_matches_mapping(spark):
    # the probe depth derives from the longest mapping name's segment
    # count — a fixed cap dropped children of deeper mapping entries
    # while resolve() routed them
    r = IndexRouter({"public.a_b_c_d_e": "deep-idx"})
    df = spark.createDataFrame(
        [("public", "a_b_c_d_e_2024", 1)],
        "table_schema string, table_name string, v int",
    )
    out = r.route(df).collect()
    assert out[0]["index"] == "deep-idx"
    assert r.resolve("public", "a_b_c_d_e_2024") == "deep-idx"


def test_bare_hypertable_parent_agrees_between_paths(spark):
    # ADVICE r3: a BARE (schema-less) parent must normalize to public in
    # BOTH paths — _resolve() used to qualify it with the CHUNK's schema
    # (_timescaledb_internal.<parent>, a guaranteed miss) while route()
    # used public.<parent>, so the two paths disagreed on real chunks.
    r = IndexRouter(
        {"public.cpu_metrics": "cpu-idx"},
        hypertable_parents={"_hyper_1_2_chunk": "cpu_metrics"},
    )
    assert r.resolve("_timescaledb_internal", "_hyper_1_2_chunk") == "cpu-idx"
    df = spark.createDataFrame(
        [("_timescaledb_internal", "_hyper_1_2_chunk", 1)],
        "table_schema string, table_name string, v int",
    )
    assert r.route(df).collect()[0]["index"] == "cpu-idx"


def test_exact_mapping_beats_hypertable_parent_in_column_path(spark):
    """An exact mapping entry for a schema-qualified chunk must win over
    its hypertable parent in BOTH paths — route() used to overwrite the
    exact entry with the parent target, disagreeing with resolve()
    (review r5)."""
    r = IndexRouter(
        {"_timescaledb_internal._hyper_1_1_chunk": "chunk_override",
         "public.metrics": "metrics_idx"},
        hypertable_parents={"_timescaledb_internal._hyper_1_1_chunk": "metrics"},
    )
    assert r.resolve("_timescaledb_internal", "_hyper_1_1_chunk") == "chunk_override"
    df = spark.createDataFrame(
        [("_timescaledb_internal", "_hyper_1_1_chunk")],
        "table_schema string, table_name string",
    )
    got = r.route(df).select("index").first()[0]
    assert got == "chunk_override"


def test_prefix_probe_handles_empty_underscore_segments(spark):
    """Review r6: a mapping table name with EMPTY '_'-segments (a__b) was
    routed by the Python path and the Go reference's strings.Split probe
    but never by the column path's regex ([^_]+ requires non-empty
    segments) — drop_unmapped then silently discarded the event."""
    from go_pq_cdc_elasticsearch_spark.routing import IndexRouter

    r = IndexRouter({"public.a__b": "idx"})
    df = spark.createDataFrame(
        [("public", "a__b_2024"), ("public", "unrelated_t")],
        "table_schema string, table_name string",
    )
    got = {x["table_name"]: x["index"] for x in r.route(df, drop_unmapped=False).collect()}
    assert got["a__b_2024"] == "idx" == r.resolve("public", "a__b_2024")
    assert got["unrelated_t"] is None


def test_prefix_probe_ignores_chunk_entries_both_paths(spark):
    """Review r7 (divergence proven live): the column path's prefix probe
    consulted the combined known-map (mapping + hypertable chunk entries)
    while resolve() and the Go findParentTable probe the config MAPPING
    only — a table merely sharing a prefix with a chunk NAME (q_r_2024 vs
    chunk public.q_r) was routed by route() and dropped by resolve().
    Both paths must drop it; real chunk rows and real partition children
    still route."""
    r = IndexRouter(
        {"public.a_b": "X"}, hypertable_parents={"public.q_r": "a_b"}
    )
    assert r.resolve("public", "q_r_2024") is None  # prefix of a CHUNK name
    assert r.resolve("public", "q_r") == "X"  # the chunk itself
    assert r.resolve("public", "a_b_2024") == "X"  # mapping prefix child
    df = spark.createDataFrame(
        [("public", "q_r_2024"), ("public", "q_r"), ("public", "a_b_2024")],
        "table_schema string, table_name string",
    )
    got = {
        rr["table_name"]: rr["index"]
        for rr in r.route(df, drop_unmapped=False).collect()
    }
    assert got == {"q_r_2024": None, "q_r": "X", "a_b_2024": "X"}


def test_unmapped_qualified_chunk_falls_back_to_name_entry(spark):
    """Review r8: a qualified hypertable entry whose parent resolves to NO
    mapping must not shadow a name-only entry whose parent IS mapped —
    the `or` short-circuit in resolve() did, while route()'s column path
    skipped the unmapped qualified entry and routed via the name map, so
    the two paths disagreed on the same row."""
    r = IndexRouter(
        {"public.metrics": "m-idx"},
        hypertable_parents={"s.chunk1": "orphan", "chunk1": "metrics"},
    )
    assert r.resolve("s", "chunk1") == "m-idx"
    df = spark.createDataFrame(
        [("s", "chunk1"), ("x", "chunk1"), ("s", "other")],
        "table_schema string, table_name string",
    )
    routed = {
        (row["table_schema"], row["table_name"]): row["index"]
        for row in r.route(df).collect()
    }
    assert routed == {("s", "chunk1"): "m-idx", ("x", "chunk1"): "m-idx"}
    # empty-string parent values count as missing on both paths
    r2 = IndexRouter(
        {"public.metrics": "m-idx"},
        hypertable_parents={"s.chunk1": "", "chunk1": "metrics"},
    )
    assert r2.resolve("s", "chunk1") == "m-idx"
