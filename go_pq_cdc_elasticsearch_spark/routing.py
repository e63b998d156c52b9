"""Table -> index routing (reference R6, ``connector.go:174-249``).

Resolution order (reference ``resolveTableToIndexName``):
1. exact match on ``schema.table`` in the mapping;
2. TimescaleDB hypertable: a chunk table resolves to its hypertable parent
   (``connector.go:184-189`` via timescaledb.HyperTables) — modeled here as
   an explicit ``hypertable_parents`` dict;
3. ``_``-split partition-parent prefix probe (``connector.go:233-249``):
   for table ``a_b_2024_01`` probe ``a_b_2024``, ``a_b``, ``a`` until a
   mapping entry hits;
4. miss => unroutable; the event is dropped (with ack) —
   ``connector.go:147-152``.

Spark-first: the mapping is tiny (config-sized), so resolution is a pure
Python function applied to the *distinct* table names (driver-side, memoized
like the reference's sync.Map cache at connector.go:201-227) and joined back
as a broadcast map — the per-row work is a map lookup column expression, no
Python in the row path.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IndexRouter:
    def __init__(
        self,
        table_index_mapping: dict[str, str],
        hypertable_parents: dict[str, str] | None = None,
    ):
        """``table_index_mapping`` keys are ``schema.table`` (reference
        config.Config.TableIndexMapping, config/config.go:13)."""
        self.mapping = dict(table_index_mapping)
        self.hypertable_parents = dict(hypertable_parents or {})
        self._resolve_cached = lru_cache(maxsize=4096)(self._resolve)

    def resolve(self, table_schema: str, table_name: str) -> str | None:
        """Resolve one table to its target index, or None if unroutable."""
        return self._resolve_cached(table_schema, table_name)

    def _resolve(self, table_schema: str, table_name: str) -> str | None:
        full = f"{table_schema}.{table_name}"
        # 1. exact
        if full in self.mapping:
            return self.mapping[full]
        # 2. hypertable chunk -> parent. BOTH candidate entries are tried
        # (qualified first, then name-only): an `or` short-circuit on the
        # qualified entry let a parent that resolves to NO mapping shadow
        # a name-only entry whose parent IS mapped — route()'s column path
        # skips unmapped qualified entries and falls through to the
        # name-only map, so the two paths disagreed on the same row
        # (review r8; same divergence class as the r7 prefix-probe fix).
        # An empty-string parent value counts as missing on both paths.
        for parent in (
            self.hypertable_parents.get(full),
            self.hypertable_parents.get(table_name),
        ):
            if not parent:
                continue
            # A bare (schema-less) parent name defaults to public — the
            # SAME normalization route() applies. Qualifying with the
            # CHUNK's schema was wrong twice over: the chunk lives in
            # _timescaledb_internal, never the parent's schema, and the
            # two paths disagreed (route() found public.<parent>,
            # resolve() probed _timescaledb_internal.<parent> and missed).
            # Parents outside public must use a qualified mapping value.
            parent_full = parent if "." in parent else f"public.{parent}"
            if parent_full in self.mapping:
                return self.mapping[parent_full]
        # 3. partition-parent prefix probe (connector.go:233-249):
        # findParentTable probes PROPER prefixes SHORTEST-first
        # (parts[:1], parts[:2], ...), so with overlapping mapping entries
        # (public.a and public.a_b for table a_b_2024) the shorter wins.
        parts = table_name.split("_")
        for cut in range(1, len(parts)):
            candidate = f"{table_schema}.{'_'.join(parts[:cut])}"
            if candidate in self.mapping:
                return self.mapping[candidate]
        # 4. miss
        return None

    def route(
        self,
        df: DataFrame,
        schema_col: str = "table_schema",
        table_col: str = "table_name",
        out_col: str = "index",
        drop_unmapped: bool = True,
    ) -> DataFrame:
        """Attach the resolved index column; optionally drop unroutable rows
        (the reference acks-and-drops them, connector.go:147-152).

        The full resolution (exact + hypertable + prefix probe) runs
        driver-side over config keys only; per row it is a literal map
        lookup, so Catalyst keeps the filter pushable and the row path
        JVM-only.
        """
        # Enumerate every table name the mapping can possibly resolve:
        # mapping keys themselves plus hypertable chunk names we know about.
        known = {}
        for full in self.mapping:
            schema_name, _, name = full.rpartition(".")
            resolved = self._resolve(schema_name or "public", name)
            if resolved is not None:
                known[f"{schema_name or 'public'}.{name}"] = resolved
        # Hypertable chunks: a NAME-ONLY chunk key must match under ANY
        # schema — TimescaleDB puts chunks in _timescaledb_internal, not
        # the parent's schema, and pinning the lookup to 'public.<chunk>'
        # silently dropped every real chunk event in the column path while
        # resolve() (whose name-only fallback ignores the schema) routed
        # it. Schema-qualified chunk keys stay exact.
        ht_by_name = {}
        for chunk, parent in self.hypertable_parents.items():
            parent_full = parent if "." in parent else f"public.{parent}"
            target = self.mapping.get(parent_full)
            if target is None:
                continue
            if "." in chunk:
                # setdefault, not assignment: resolve() gives an EXACT
                # mapping entry for the same schema.table priority over the
                # hypertable parent (step 1 before step 2); overwriting
                # here made the column path disagree with the Python path
                known.setdefault(chunk, target)
            else:
                ht_by_name[chunk] = target
        # Unknown-at-config-time partition children (e.g. orders_2024_01)
        # can't be pre-enumerated; handle them with a chain of prefix
        # candidates evaluated as column expressions.
        mapping_items = [x for kv in known.items() for x in kv]
        map_col = F.create_map(*[F.lit(x) for x in mapping_items]) if mapping_items else None

        full_col = F.concat_ws(".", F.col(schema_col), F.col(table_col))
        candidates = []
        if map_col is not None:
            candidates.append(map_col.getItem(full_col))
        if ht_by_name:
            ht_items = [x for kv in ht_by_name.items() for x in kv]
            ht_map = F.create_map(*[F.lit(x) for x in ht_items])
            candidates.append(ht_map.getItem(F.col(table_col)))
        # The prefix probe consults ONLY mapping entries — NOT the
        # chunk-derived names in `known`: _resolve's step 3 (and the Go
        # findParentTable, connector.go:239-246) test candidates against
        # the config mapping, so a table that merely shares a prefix with
        # a hypertable CHUNK name (e.g. q_r_2024 vs chunk public.q_r) must
        # stay unroutable. Probing the combined map routed rows the Python
        # path and the reference drop (review r7, divergence proven live).
        probe_entries = {k: v for k, v in self.mapping.items() if "." in k}
        if probe_entries:
            probe_items = [x for kv in probe_entries.items() for x in kv]
            probe_map = F.create_map(*[F.lit(x) for x in probe_items])
            # prefix probe, SHORTEST proper prefix first to match
            # findParentTable (connector.go:239-246): extract the first i
            # _-segments, requiring a trailing '_' so only proper prefixes
            # match. Depth = the longest mapping table name's segment count
            # (a deeper probe can never hit) — a fixed cap silently dropped
            # children of mapping entries with more segments than the cap.
            max_depth = max(
                k.rpartition(".")[2].count("_") + 1 for k in self.mapping
            )
            for i in range(1, max_depth + 1):
                # [^_]* not [^_]+: segments may be EMPTY (a mapping name
                # like a__b has one) — the + form never matched them, so
                # the column path dropped events the Python path and the
                # Go reference's strings.Split probe route (review r6)
                probe = F.regexp_extract(
                    F.col(table_col), "^([^_]*" + "_[^_]*" * (i - 1) + ")_", 1
                )
                candidates.append(
                    probe_map.getItem(F.concat_ws(".", F.col(schema_col), probe))
                )
        resolved = (
            F.coalesce(*candidates) if candidates else F.lit(None).cast("string")
        )
        out = df.withColumn(out_col, resolved)
        if drop_unmapped:
            out = out.filter(F.col(out_col).isNotNull())
        return out
