"""Physical-layout robustness harness for the oracle gate.

The driver REGENERATES /root/testdata between rounds. Seed=42 keeps the
VALUES stable, but the physical parquet layout has already changed once
(round 1 shipped events.ts as TIMESTAMP(NANOS); round 2 as plain
timestamp[us]) — and layout is exactly what the engine must be invariant
to: row order feeds every top-k tie, window order, and "first" aggregate;
row-group size feeds the snapshot source's footer-based chunk sizing and
Spark's partition assignment; the timestamp physical unit feeds the
catalog.load_table ns/us branch.

This tool rewrites a testdata dir into perturbed variants under /tmp and
the gate is then run against each:

    python tools/variant_data.py /root/testdata/sf0.001
    python tools/check.py /tmp/spark_graft_variants/sf0.001/rowshuffle
    python tools/check.py /tmp/spark_graft_variants/sf0.001/rg_small
    python tools/check.py /tmp/spark_graft_variants/sf0.001/ts_ns

Variants (values identical to the source in every case):
- ``rowshuffle``: every table's rows shuffled with a fixed seed. Catches
  any result that silently depends on the generator's row order.
- ``rg_small``: row_group_size=2000. Catches footer-sizing and
  per-row-group statistics dependence.
- ``ts_ns``: events.ts written as TIMESTAMP(NANOS) (parquet 2.6), the
  round-1 physical type; other tables single-row-group. Exercises the
  nanosAsLong read branch end-to-end. NOTE: ns values are the us values
  scaled — DuckDB and catalog.load_table both truncate back to us, so
  oracle parity must hold bit-for-bit.
- ``nulls``: a NOT-value-identical variant — four crafted events rows
  appended with NULL user_id / NULL value / NULL props and a fractional
  props.k. Every nullable-typed column is contractually allowed to be
  NULL, and this variant is what exposed the round-4 NULL-divergence
  class (pandas_udf IntCastingNaNError, count(DISTINCT) vs
  dropDuplicates NULL asymmetry, str(None) staging, keyless-action drop
  asymmetry in q_c11): both engines run on the same variant data, so the
  gate still checks full parity.
- ``edge``: boundary-shape rows for the OTHER tables — documents with
  empty / whitespace-only / single-word / unicode / 5000-char-word text
  (exercises every text-operator zero-denominator and tokenizer guard)
  and a lineitem row with a FRACTIONAL l_quantity (exercises the
  DECIMAL-accumulated sum paths; integer-valued quantities were the
  only reason a raw double sum ever matched). Green on first run after
  the round-3/4 hardening — kept as the standing gate for the class.

/root/testdata itself is never touched.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_pq_cdc_elasticsearch_spark.catalog import TABLES, table_path  # noqa: E402

VARIANTS = (
    "rowshuffle",
    "rg_small",
    "ts_ns",
    "nulls",
    "edge",
    "empty_events",
    "nulls_rel",
    "unicode_rel",
    "dup_rel",
    "colperm",
    "empty_rel",
    "wide_rel",
    "combo_rel",
)


def _with_permuted_columns(table: pa.Table, seed: int) -> pa.Table:
    """Reversed-then-rotated column order (colperm variant): a driver
    regeneration is free to write parquet columns in any physical order,
    and every reader must address columns BY NAME — anything positional
    (schema index, struct field order, DESCRIBE-order assumptions)
    breaks here."""
    names = list(table.schema.names)
    if len(names) < 2:
        return table
    rot = seed % len(names)
    perm = list(reversed(names))
    perm = perm[rot:] + perm[:rot]
    return table.select(perm)


def _with_dup_rows(table: pa.Table, seed: int, frac: float = 0.02) -> pa.Table:
    """EXACT duplicates of ~frac of the rows appended (dup_rel variant):
    both engines compute on identical data, so every oracle must stay in
    parity on inputs where 'unique key' assumptions are violated — the
    duplicated rows are byte-identical, so even order-tied window picks
    are value-indistinguishable (a duplicate with DIFFERENT non-key values
    would be out-of-contract: seq ties have no defined winner)."""
    if table.num_rows == 0:
        return table
    n = max(1, int(table.num_rows * frac))
    idx = np.random.RandomState(seed).choice(table.num_rows, size=n, replace=False)
    dups = table.take(pa.array(np.sort(idx)))
    return pa.concat_tables([table, dups])


def _with_extra_columns(table: pa.Table, seed: int) -> pa.Table:
    """2-3 EXTRA trailing columns appended to every table (wide_rel
    variant): a driver regeneration is free to produce a schema
    SUPERSET, and both engines read the same files — so anything that
    selects columns by position, asserts exact column counts, packs
    `struct(*)` across a whole row, or fails to project before a
    schema-sensitive step breaks here while explicit-by-name projection
    sails through. Values are deterministic from the seed so reruns are
    stable."""
    rng = np.random.RandomState(seed * 31 + 7)
    n = table.num_rows
    extras = [
        ("zz_extra_note", pa.array(
            [f"x{seed}_{i}" for i in range(n)], type=pa.string())),
        ("zz_extra_flag", pa.array(rng.rand(n) < 0.5)),
    ]
    if seed % 2:  # 2 or 3 extras, varying per table
        extras.append(
            ("zz_extra_num", pa.array(np.round(rng.rand(n) * 100, 3))),
        )
    for name, col in extras:
        table = table.append_column(name, col)
    return table


def _shuffled(table: pa.Table, seed: int) -> pa.Table:
    idx = np.random.RandomState(seed).permutation(table.num_rows)
    return table.take(pa.array(idx))


def _events_with_nulls(table: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    max_id = pc.max(table.column("event_id")).as_py()
    ts0 = table.column("ts")[0].as_py()
    # rows 5-6 (review r8): NULL ts and NULL event_type were the two
    # nullable event columns this variant never exercised — a NULL ts
    # broke q_t1/q_t2 rowcount parity (Spark's TimeWindowing filters it,
    # a bare oracle GROUP BY kept a NULL group) and a NULL event_type on
    # a user's LATEST event broke q_t7 (engine plays INSERT, the oracle's
    # bare <> 'error' dropped it). Both proven by execution pre-fix.
    extra = {
        "event_id": [max_id + i for i in range(1, 7)],
        "ts": [ts0] * 4 + [None, ts0],
        "user_id": [None, 5, 7, None, 9, 11],
        "event_type": ["click", "purchase", "click", "error", "click", None],
        "value": [1.5, None, 2.5, None, 3.5, 4.5],
        "props": [None, '{"k": 62.5}', '{"k": 80}', "{}", "{}", "{}"],
    }
    et = pa.table(
        {c: pa.array(extra[c], table.schema.field(c).type) for c in table.schema.names}
    )
    return pa.concat_tables([table, et])


def _documents_with_edges(table: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mx = pc.max(table.column("doc_id")).as_py()
    extra = {
        "doc_id": [mx + 1, mx + 2, mx + 3, mx + 4, mx + 5],
        "text": ["", "   \n\t  ", "word", "café naïve — ☃ 雪だるま", "x" * 5000],
        "lang": ["en"] * 5,
        "source": ["edge"] * 5,
    }
    # n_chars derived, not a literal: the unicode row's hand-counted 23
    # didn't match len(text)=19 (review r5), silently breaking the
    # n_chars == length(text) convention the other edge rows follow
    extra["n_chars"] = [len(t) for t in extra["text"]]
    et = pa.table(
        {c: pa.array(extra[c], table.schema.field(c).type) for c in table.schema.names}
    )
    return pa.concat_tables([table, et])


def _lineitem_with_fractional(table: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mxo = pc.max(table.column("l_orderkey")).as_py()
    row = {c: [table.column(c)[0].as_py()] for c in table.schema.names}
    row["l_orderkey"] = [mxo + 1]
    row["l_quantity"] = [25.37]
    row["l_linenumber"] = [1]
    et = pa.table(
        {c: pa.array(row[c], table.schema.field(c).type) for c in table.schema.names}
    )
    return pa.concat_tables([table, et])


def _with_null_rows(table: pa.Table, key_col: str, name: str) -> pa.Table:
    """Append two adversarial rows: one ALL-NULL, one with a fresh key and
    every other column NULL. TESTDATA.md guarantees nothing about
    nullability and every physical column is nullable — the relational
    tables had never been probed with NULLs (the round-8 extension of the
    events-only nulls variant, which found three live divergences on its
    first run there)."""
    import pyarrow.compute as pc

    key_t = table.schema.field(key_col).type
    mx = pc.max(table.column(key_col)).as_py()
    fresh = (mx or 0) + 1 if pa.types.is_integer(key_t) else f"__null_probe_{name}"
    rows = {c: [None, None] for c in table.schema.names}
    rows[key_col] = [None, fresh]
    et = pa.table(
        {c: pa.array(rows[c], table.schema.field(c).type) for c in table.schema.names}
    )
    return pa.concat_tables([table, et])


def _embeddings_with_nulls(table: pa.Table) -> pa.Table:
    """NULL embedding, NULL vector ELEMENT, empty vector, NULL label —
    the shapes the r7 IVF hardening handles; every other vector operator
    (brute-force cosine, LSH, SQ8, semantic dedup) must survive them too."""
    import pyarrow.compute as pc

    mx = pc.max(table.column("vec_id")).as_py()
    dim = len(table.column("embedding")[0].as_py() or [])
    base = [0.25] * dim
    elem_null = list(base)
    if dim:
        elem_null[0] = None
    elem_nan = list(base)
    elem_inf = list(base)
    if dim:
        elem_nan[0] = float("nan")
        elem_inf[0] = float("inf")
    extra = {
        "vec_id": [mx + i for i in range(1, 7)],
        "embedding": [None, elem_null, [], base, elem_nan, elem_inf],
        "label": [None, 0, 0, None, 0, 0],
    }
    et = pa.table(
        {
            c: pa.array(extra[c], table.schema.field(c).type)
            for c in table.schema.names
        }
    )
    return pa.concat_tables([table, et])


# adversarial strings for unicode_rel: characters that collide with the
# repo's own canonical separators ('|' and 'ø' in the checksum concat_ws,
# '\x1f'/'\x00' in hash_bucket), unicode SpecialCasing scripts (final
# sigma), embedded newlines/tabs, leading/trailing whitespace, an empty
# string, and a 1000-char value — the relational string columns had only
# ever seen the generator's clean vocabulary (review r8; the documents
# edge variant covers only the documents table)
_ADVERSARIAL_STRINGS = (
    "pipe|and øslash",
    "ΟΔΟΣ café 雪",
    "line\nbreak\ttab\x0bvtab",
    "  padded  ",
    "",
    "Z" * 1000,
)


def _unicode_rel_rows(table: pa.Table, key_col: str) -> pa.Table:
    """Append len(_ADVERSARIAL_STRINGS) rows with fresh integer keys and
    every string column cycling through the adversarial vocabulary;
    non-string non-key columns copy row 0's values."""
    import pyarrow.compute as pc

    n = len(_ADVERSARIAL_STRINGS)
    mx = pc.max(table.column(key_col)).as_py() or 0
    rows: dict = {}
    for fld in table.schema:
        if fld.name == key_col:
            rows[fld.name] = [mx + 1 + i for i in range(n)]
        elif pa.types.is_string(fld.type) or pa.types.is_large_string(fld.type):
            rows[fld.name] = list(_ADVERSARIAL_STRINGS)
        else:
            rows[fld.name] = [table.column(fld.name)[0].as_py()] * n
    et = pa.table(
        {c: pa.array(rows[c], table.schema.field(c).type) for c in table.schema.names}
    )
    return pa.concat_tables([table, et])


_NULLS_REL_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "documents": "doc_id",
}


def _events_ns(table: pa.Table) -> pa.Table:
    i = table.schema.get_field_index("ts")
    if i < 0:
        return table
    col = table.column(i)
    if not pa.types.is_timestamp(col.type):
        return table
    return table.set_column(i, "ts", col.cast(pa.timestamp("ns", tz=col.type.tz)))


def generate(src_dir: str, out_root: str) -> list[str]:
    sf_name = os.path.basename(os.path.normpath(src_dir))
    out_dirs = []
    for variant in VARIANTS:
        out_dir = os.path.join(out_root, sf_name, variant)
        os.makedirs(out_dir, exist_ok=True)
        for seed, name in enumerate(TABLES, start=7):
            t = pq.read_table(table_path(src_dir, name))
            kw: dict = {}
            if variant == "rowshuffle":
                t = _shuffled(t, seed)
            elif variant == "rg_small":
                kw["row_group_size"] = 2000
            elif variant == "nulls" and name == "events":
                t = _events_with_nulls(t)
            elif variant == "edge" and name == "documents":
                t = _documents_with_edges(t)
            elif variant == "edge" and name == "lineitem":
                t = _lineitem_with_fractional(t)
            elif variant == "ts_ns" and name == "events":
                t = _events_ns(t)
                # parquet 2.6 is required for a real TIMESTAMP(NANOS)
                # physical annotation (1.0/2.4 would silently coerce to us)
                kw.update(version="2.6", coerce_timestamps=None)
            elif variant == "nulls_rel":
                if name in _NULLS_REL_KEYS:
                    t = _with_null_rows(t, _NULLS_REL_KEYS[name], name)
                elif name == "embeddings":
                    t = _embeddings_with_nulls(t)
                elif name == "events":
                    t = _events_with_nulls(t)
            elif variant == "unicode_rel" and name in _NULLS_REL_KEYS:
                t = _unicode_rel_rows(t, _NULLS_REL_KEYS[name])
            elif variant == "dup_rel" and name not in (
                "region", "nation", "embeddings"
            ):
                # region/nation stay unique: broadcast-dim queries assume
                # the TPC-H 1:N shape there and a duplicated dim row
                # changes results IDENTICALLY on both engines anyway —
                # excluded only to keep the variant's delta interpretable.
                # embeddings stays unique: q_lx1/q_lx4's bounded-claim
                # machinery (planted +1e6 ids, exact-top-k identity,
                # k-means training sets) has vec_id uniqueness as a stated
                # PRECONDITION of the claim design — duplicate ids change
                # what the approximate and exact twins each compute in
                # ways the claim was never defined over. The operators
                # themselves take dup-robustness from the defective-vector
                # contract (r8) and content-level duplicates are their
                # entire purpose (planted scaled copies, tested).
                t = _with_dup_rows(t, seed)
            elif variant == "colperm":
                t = _with_permuted_columns(t, seed)
            elif variant == "wide_rel":
                t = _with_extra_columns(t, seed)
            elif variant == "combo_rel":
                # INTERACTION variant (r9): stack every value-level and
                # layout-level perturbation the individual variants apply,
                # in a fixed order — null rows, then exact duplicates,
                # then extra wide columns, then permuted column order,
                # then a row shuffle. Each constituent is 111/111 alone;
                # this catches code whose guards hold one perturbation at
                # a time but interact (e.g. a NULL-keyed duplicated row
                # reaching a window tie through a positionally-read
                # column). Same per-table exclusions as the constituents.
                if name in _NULLS_REL_KEYS:
                    t = _with_null_rows(t, _NULLS_REL_KEYS[name], name)
                elif name == "embeddings":
                    t = _embeddings_with_nulls(t)
                elif name == "events":
                    t = _events_with_nulls(t)
                if name not in ("region", "nation", "embeddings"):
                    t = _with_dup_rows(t, seed)
                t = _with_extra_columns(t, seed)
                t = _with_permuted_columns(t, seed)
                t = _shuffled(t, seed)
            elif variant == "empty_rel":
                # a completely empty database, same schemas: every query
                # must return its oracle's answer (empty or a defined
                # zero/NULL aggregate row) instead of raising on an
                # uninitialized view / empty-sample / empty-centroid path
                t = t.slice(0, 0)
            elif variant == "empty_events" and name == "events":
                # zero-row feed, same schema: every streaming/CDC query
                # must return its oracle's empty result instead of raising
                # on an uninitialized view/state (this probe found q_c13
                # crashing in round 5)
                t = t.slice(0, 0)
            pq.write_table(t, table_path(out_dir, name), **kw)
        out_dirs.append(out_dir)
    return out_dirs


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_variants"
    for d in generate(src, out_root):
        print(d)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
