"""Deduplication operator family (LLM-pipeline extension).

Exact, MinHash+LSH, SimHash, n-gram Jaccard and embedding-cosine near-dup.
All hot paths are built-in column expressions (hashes via md5 — available
identically in the DuckDB oracle, so every stage is cross-checkable).

Scale notes (the point of each design):
- exact: one hash-aggregate on the normal form — the cheapest possible
  distributed dedup; at 100 TB group keys are the md5 fingerprint (16 bytes)
  rather than full texts, so shuffle volume is tiny.
- minhash LSH: per-row signature computation is embarrassingly parallel
  (no shuffle); candidate generation shuffles only (band_id, band_hash)
  pairs — never the cross product. Bucket-balanced by construction because
  hash values are uniform.
- simhash: single pass per row; near-dup probing by banding the bits.
- jaccard: exact verification on *candidates only* (the classic
  LSH-then-verify pipeline).
- embedding cosine: verification metric for ANN candidates; bounded-window
  variant for oracle-checkable determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.functions.text import (
    ascii_lower,
    normalize_text,
    words,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized text."""
    norm = normalize_text(F.col(text_col)).alias("__norm")
    return (
        df.select(F.col(id_col), norm)
        .groupBy("__norm")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__norm")
    )


def word_ngrams_from(w, n: int = 3) -> Column:
    """Array of word n-grams over an already-computed words-array column.

    The expression references ``w`` n+2 times (n slices + two size
    guards); pass a MATERIALIZED column (a bound reference from a prior
    projection), never the raw ``words(text)`` chain, when the caller
    controls a DataFrame — see ``word_ngrams`` for why.
    """
    g = F.size(w) - (n - 1)  # gram count when size >= n
    zipped = F.arrays_zip(*[F.slice(w, 1 + j, g).alias(str(j)) for j in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
    )
    # Guard: slice with non-positive length throws / zip misbehaves on short
    # texts, so short rows map to an empty array explicitly.
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(col, n: int = 3) -> Column:
    """Array of word n-grams of the normalized text (shingles).

    Formulated as ``arrays_zip`` over ``n`` shifted ``slice``s of the word
    array rather than ``transform(sequence(...), i -> element_at(w, i+j))``:
    higher-order functions are CodegenFallback (interpreted), and in the
    element_at form each lambda invocation re-evaluates the captured word
    array — i.e. the full lower/trim/regexp_replace/split chain — giving
    O(grams x n) regex evaluations per row (measured 5x slowdown on the
    winnowing query). The slice/zip form evaluates the word array a constant
    number of times per row and lets the lambda touch only materialized
    struct fields.

    Even so, this inline form still spells out the ``words(col)``
    tokenize chain n+2 times (n slices + two size guards), and because
    ``transform`` is CodegenFallback the interpreted evaluator re-runs
    the chain per reference — no subexpression elimination (r12,
    measured: a q_l21-shaped gram explosion at sf0.1 dropped 1.62 s →
    0.75 s with the chain materialized once). DataFrame-level callers
    should therefore project ``words(col)`` into its own column first
    and build grams with ``word_ngrams_from`` — CollapseProject keeps
    the staging projection intact (non-cheap expression referenced more
    than once), so the chain runs once per row. This Column form remains
    for expression-only contexts (pair scorers, tests).
    """
    return word_ngrams_from(words(col), n)


def _hash64(col) -> Column:
    """Deterministic 32-bit-range hash from md5 (first 8 hex chars) — chosen
    over xxhash64 because the oracle (DuckDB) computes the identical value:
    CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# k-permutation MinHash family: ONE md5 per shingle, then k universal-hash
# mixes h_j(x) = (a_j*h(x) + b_j) mod (2^31-1). The modulus must be SMALLER
# than the 32-bit base-hash range or the reduction never engages: an
# earlier 2^61-1 variant had a_j < 2^28, so a_j*h + b_j < 2^61-1 made every
# "permutation" a strictly monotone map of the base hash — all k slots
# picked the same argmin shingle and the signature carried one hash's worth
# of information. With p = 2^31-1 and a_j up to p-1, a_j*h wraps p many
# thousands of times (genuine mixing) while a_j*h + b_j < 2^63 stays
# BIGINT-exact in both engines. Slot collisions cost ~2^-31 per shingle
# pair — negligible at per-document shingle counts. One md5 per shingle
# (not k) keeps the 16x hashing saving that motivated the family form.
MERSENNE31 = (1 << 31) - 1


def family_coeffs(j: int) -> tuple[int, int]:
    """Deterministic (a_j, b_j) for the j-th minhash permutation — derived
    from md5 so Spark and the DuckDB oracle inline identical constants.
    a_j in [1, p-1], b_j in [0, p-1]."""
    import hashlib

    a = int(hashlib.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (MERSENNE31 - 1) + 1
    b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:8], 16) % MERSENNE31
    return a, b


def _family(j: int, h: Column) -> Column:
    a, b = family_coeffs(j)
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31)


def minhash_signature(col, k: int = 16) -> Column:
    """k-permutation MinHash signature of the shingle set: min over
    shingles of the j-th universal-hash permutation of the shingle hash."""
    grams = word_ngrams(col, 3)
    hashes = F.transform(grams, _hash64)

    def family(j: int):
        # factory closure: a plain 1-arg lambda (PySpark passes the array
        # element index to 2-arg lambdas, including default-arg ones)
        return lambda h: _family(j, h)

    sigs = [F.array_min(F.transform(hashes, family(j))) for j in range(k)]
    return F.array(*sigs)


def minhash_bands(sig_col, bands: int = 4, rows_per_band: int = 4) -> Column:
    """Array of (band hash) strings: md5 over each contiguous signature slice.
    Equal band hash => LSH candidate pair.

    A doc too short to carry any shingle has an all-NULL signature
    (array_min over an empty array); concat_ws drops NULLs, so every such
    doc's every band hashed md5('') — ALL short docs became mutual LSH
    candidates, the same N² degeneracy fixed in minhash_band_rows for
    bands>k (review r6). Short docs get an EMPTY band array instead,
    matching the exploded form (which emits no rows for them): a doc with
    no shingles has no LSH identity, it is not near-duplicate of every
    other empty doc.

    ``bands * rows_per_band`` must fit the signature built by
    ``minhash_signature(col, k)`` — the Column form can't see k at build
    time, so the size check rides the expression (assert_true): without
    it a mismatch died mid-job with a cryptic data-dependent
    INVALID_ARRAY_INDEX under ANSI — and only once a doc with a non-empty
    signature was reached (short-doc-only data passed) — while non-ANSI
    silently hashed partial slices, the md5('') degeneracy the row form's
    r5 guard exists to prevent (proven by execution, review r8)."""
    if bands <= 0 or rows_per_band <= 0:
        raise ValueError(
            f"minhash_bands: bands ({bands}) and rows_per_band "
            f"({rows_per_band}) must be positive"
        )
    needed = bands * rows_per_band
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig_col, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    size_ok = F.assert_true(
        F.size(sig_col) >= F.lit(needed),
        F.lit(
            f"minhash_bands: bands*rows_per_band = {needed} exceeds the "
            "signature size — pass bands/rows_per_band matching "
            "minhash_signature's k"
        ),
    )
    # assert_true yields NULL on success; the isNull() wrap just sequences
    # the check before the band hashing in one expression tree
    band_arr = F.when(size_ok.isNull(), band_arr)
    return F.when(sig_col.getItem(0).isNotNull(), band_arr).otherwise(
        F.array().cast("array<string>")
    )


def minhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    grams_df: DataFrame | None = None,
) -> DataFrame:
    """(id, band_idx, band_hash) rows.

    Shape matters here: shingles are EXPLODED to rows and the k hash
    families are plain per-row expressions + groupBy(id).min aggregates —
    everything stays in whole-stage codegen. The tempting alternative
    (array_min over a transform() lambda per family) runs md5 in Spark's
    *interpreted* higher-order-function evaluator: measured 45s vs ~3s on
    500 docs, and the gap widens with corpus size. Partial aggregation
    means the shuffle carries k longs per doc, not the shingles.
    """
    if bands <= 0 or k % bands != 0:
        # bands > k silently made rows_per_band 0 — every band hashed
        # md5('') for every doc, degenerating LSH into the full N^2 cross
        # product (confirmed by execution, review r5); a non-dividing k
        # silently dropped the trailing signature slots. Loud error.
        raise ValueError(
            f"minhash bands ({bands}) must divide the signature size k "
            f"({k}); rows_per_band = k/bands must be a positive integer"
        )
    rows_per_band = k // bands
    if grams_df is not None:
        # reuse a staged (id, grams) frame (doc_ngram_sets) — min over the
        # DISTINCT grams equals min over all grams, so signatures match
        exploded_grams = grams_df.select(
            F.col(id_col), F.explode("grams").alias("__gram")
        )
    else:
        # slice/zip gram form over a words array materialized in its own
        # projection (r12): the inline expression re-ran the tokenize
        # chain n+2 times per row under the interpreted HOF evaluator —
        # see word_ngrams's docstring
        exploded_grams = df.select(
            F.col(id_col), words(F.col(text_col)).alias("__words")
        ).select(
            F.col(id_col),
            F.explode(word_ngrams_from(F.col("__words"), 3)).alias("__gram"),
        )
    gram_hashed = exploded_grams.select(
        F.col(id_col), _hash64(F.col("__gram")).alias("__gh")
    )
    sig_df = gram_hashed.groupBy(id_col).agg(
        *[
            F.min(_family(j, F.col("__gh"))).alias(f"__h{j}")
            for j in range(k)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"__h{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    return sig_df.select(
        id_col, F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    grams_df: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs (id1 < id2): docs sharing at least one band bucket.
    Shuffle is on (band_idx, band_hash) only; the self-join happens within
    buckets (bounded by bucket size, uniform by hash construction)."""
    exploded = minhash_band_rows(df, text_col, id_col, k, bands, grams_df)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .distinct()
    )


def _cc_driver_labels(spark, edge_rows, numeric: bool) -> DataFrame:
    """Union-find (min-root) over a collected edge list — the small-graph
    fast path of ``connected_components``. Merging always keeps the SMALLER
    root, so inductively every tree's root is the minimum id it contains:
    labels equal the distributed loop's fixpoint exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    schema = "id long, component long" if numeric else "id string, component string"
    return spark.createDataFrame(
        [(x, find(x)) for x in parent], schema
    )


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    driver_gate_edges: int = 100_000,
) -> DataFrame:
    """(id, component) for every id appearing in the pair graph, where
    component = min id reachable — distributed min-label propagation.

    Each iteration: labels flow across edges (join) + keep the min per id
    (agg) + a pointer-jumping shortcut (label <- label[label]) that halves
    the remaining chain length, so convergence is O(log diameter), not
    O(diameter) — near-dup graphs are mostly small cliques (diameter
    ~2-3), but PATH-shaped components (successive document revisions, each
    similar only to its neighbor) are real, and edge-propagation alone
    silently exhausted the iteration cap on a 30-node chain, returning
    WRONG labels with no error (proven by execution, review r8). The loop
    stops early when an iteration changes nothing and RAISES if the cap is
    hit non-converged (with jumping, 20 rounds cover diameters beyond any
    physical graph — the raise is a corruption tripwire, not a tuning
    knob). In the distributed loop no driver-side graph state exists —
    only counts cross to the driver.

    Small graphs (r12, optimization guide §1.2/§5): the verified near-dup
    pair set is usually tiny next to the corpus, and the loop's per-round
    join+agg+probe cost is pure driver-latency overhead there (measured:
    ~28 Spark jobs / ~60% of q_l11's wall for a 5k-doc corpus whose edge
    set fits in one task). Below ``driver_gate_edges`` the edge list is
    collected — bounded O(gate) rows, the same boundedness class as a
    broadcast join's build side, probed with an early-exiting ``limit`` so
    the big path never materializes the full edge set here — and labeled
    by union-find on the driver in one job. Above the gate (the 100 TB
    regime) the distributed loop runs unchanged. ``driver_gate_edges=0``
    forces the distributed path (the convergence/cap tests pin it)."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    # ids are usually integral (the testdata's doc_id/vec_id), but the
    # deduper contract allows content-handle STRING ids (hash/URL-style);
    # an unconditional cast('long') raised CAST_INVALID_INPUT under the
    # session's ANSI mode for those — propagate min over the native type
    # instead, and pick the convergence probe per type below
    numeric = isinstance(
        pairs.schema["id1"].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    if numeric:
        edges = pairs.select(
            F.col("id1").cast("long").alias("a"),
            F.col("id2").cast("long").alias("b"),
        )
    else:
        edges = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    if driver_gate_edges > 0:
        probe = edges.limit(driver_gate_edges + 1).collect()
        if len(probe) <= driver_gate_edges and not any(
            r[0] is None or r[1] is None for r in probe
        ):
            # NULL ids (a data bug the join-built pair sets cannot produce)
            # fall through to the distributed loop so the two paths stay
            # row-identical in every reachable case
            return _cc_driver_labels(pairs.sparkSession, probe, numeric)
    # undirected: propagate both ways; persisted — every iteration joins it
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    # localCheckpoint per round truncates lineage — otherwise iteration k
    # re-derives all k-1 predecessors (measured 20s -> ~4s on a toy graph)
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        # lazy for the same one-job-per-step reason as the loop below:
        # the numeric path's prev_sum agg (or the first round's probe)
        # is always the first action and materializes it
        .localCheckpoint(eager=False)
    )
    # min-label propagation only ever DECREASES labels, so for numeric ids
    # sum(component) strictly decreases until the fixpoint: the convergence
    # check is one tiny agg over the label frame instead of a labels⋈labels
    # join+count per round (r2 perf item — two jobs per iteration down to
    # one-and-a-bit). decimal sum: a BIGINT sum overflows under ANSI mode
    # for realistic 64-bit ids (snowflake-scale ids crash on the FIRST agg;
    # non-ANSI would silently wrap and risk a false-equal early exit).
    # String ids have no order-preserving sum — count the labels that
    # actually changed (an extra self-join per round, generic-path only; a
    # hash-sum probe would risk a false-equal early exit on collision).
    _label_sum = F.sum(F.col("component").cast("decimal(38,0)"))
    converged = False
    try:
        if numeric:
            prev_sum = labels.agg(_label_sum).first()[0]
        for _ in range(max_iterations):
            # neighbor's current label, per edge
            prop = (
                sym.join(labels, sym.b == labels.id)
                .select(F.col("a").alias("id"), F.col("component"))
            )
            merged = (
                labels.unionByName(prop)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
            # pointer-jumping shortcut: component <- label[component].
            # Every component value is itself an id in the frame (labels
            # start as the ids and only min-reduce over them), so the
            # left join always hits; coalesce guards the self-row. This
            # is what turns chain convergence logarithmic.
            jump = merged.select(
                F.col("id").alias("__m"), F.col("component").alias("__mc")
            )
            # LAZY checkpoint (r12): the convergence probe right below is
            # always the frame's first action, so it materializes the
            # checkpoint AND computes the sum/changed-count in ONE job —
            # the eager form paid two driver-synced jobs per round (the
            # checkpoint job, then the probe job). Lineage truncation is
            # identical once materialized, which the probe guarantees
            # before the next round's join reuses the frame.
            new_labels = (
                merged.join(jump, merged.component == F.col("__m"), "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("__mc"), F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint(eager=False)
            )
            if numeric:
                new_sum = new_labels.agg(_label_sum).first()[0]
                converged = new_sum == prev_sum
                prev_sum = new_sum
            else:
                converged = (
                    new_labels.alias("n")
                    .join(labels.alias("p"), "id")
                    .filter(F.col("n.component") != F.col("p.component"))
                    .limit(1)
                    .count()
                    == 0
                )
            labels = new_labels
            if converged:
                break
    finally:
        # the convergence loop runs an eager job every round; an executor
        # failure there must not leak the cached edge frame (the same
        # try/finally class as process_batch r7 / merge_batch r6 — this
        # path runs once per micro-batch under IncrementalDeduper)
        sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations — with pointer jumping this means a component of "
            f"diameter > ~2^{max_iterations}; returning non-converged labels "
            "would silently under-dedup"
        )
    return labels


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Corpus near-dup REMOVAL (the end-to-end training-data pipeline):
    MinHash/LSH candidates -> exact Jaccard verification (>= threshold) ->
    connected components -> keep the min-id representative per component.

    Returns df minus non-representative near-duplicates. All stages are the
    scale-shaped operators above: candidate generation never materializes
    the cross product; verification touches candidates only; components
    converge in O(clique diameter) joins."""
    # ONE text pass: the distinct-gram sets feed BOTH the minhash
    # signatures (min over distinct grams == min over all grams) and the
    # Jaccard verification — recomputing normalize+split+ngrams for each
    # consumer doubled the dominant scan cost (r2 perf item)
    grams = doc_ngram_sets(df, text_col, id_col).persist()
    try:
        cands = minhash_lsh_candidates(
            df, text_col, id_col, k, bands, grams_df=grams
        )
        g1 = grams.select(F.col(id_col).alias("id1"), F.col("grams").alias("__g1"))
        g2 = grams.select(F.col(id_col).alias("id2"), F.col("grams").alias("__g2"))
        verified = (
            cands.join(g1, "id1")
            .join(g2, "id2")
            .filter(
                jaccard_from_sets(F.col("__g1"), F.col("__g2"))
                >= jaccard_threshold
            )
            .select("id1", "id2")
        )
        comp = connected_components(verified)
    finally:
        # comp is localCheckpoint-materialized (independent of grams'
        # lineage), so the cached gram sets — the heaviest intermediate —
        # can be released before the caller executes the final anti-join;
        # leaking them (also on a raise inside CC's eager loop — review
        # r8) accumulated executor storage across repeated calls
        grams.unpersist()
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


def simhash16(col) -> Column:
    """16-bit SimHash over word tokens: bit b is 1 iff the sum over tokens of
    (+1 if bit b of hash(token) else -1) is positive. 16 bits keeps the
    expression tree small while exercising the full algorithm; widen by
    raising BITS at no structural change.

    Single-traversal formulation: ONE ``aggregate`` over the token-hash
    array carries all 16 bit-sums in a struct accumulator, and the final
    bit-combine happens in the aggregate's ``finish`` lambda (where the
    accumulator is a bound variable — a cheap reference). The obvious
    per-bit version (16 separate ``aggregate`` calls over the same
    ``transform(words, md5)``) re-evaluates the token hashing 16x per row,
    because higher-order functions are interpreted with no common-
    subexpression elimination across captured expressions. Map-only either
    way — this keeps the operator shuffle-free at any scale.
    """
    toks = words(col)
    hashes = F.transform(toks, _hash64)
    zero = F.struct(
        *[F.lit(0).cast("long").alias(f"b{b}") for b in range(16)]
    )

    def merge(acc, h):
        return F.struct(
            *[
                (
                    acc[f"b{b}"]
                    + F.when(F.floor(h / F.lit(2**b)) % 2 == 1, F.lit(1)).otherwise(
                        F.lit(-1)
                    )
                ).alias(f"b{b}")
                for b in range(16)
            ]
        )

    def finish(acc):
        out = F.lit(0)
        for b in range(16):
            out = out + F.when(acc[f"b{b}"] > 0, F.lit(2**b)).otherwise(F.lit(0))
        return out.cast("long")

    return F.aggregate(hashes, zero, merge, finish)


def hamming16(a, b) -> Column:
    """Hamming distance between two 16-bit simhash values (popcount of XOR
    via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def jaccard_ngrams(col_a, col_b, n: int = 3) -> Column:
    """Exact Jaccard similarity of the distinct word n-gram sets (inline
    form — fine for small/test data; for corpus-scale pairs use
    doc_ngram_sets + jaccard_from_sets so grams are computed once per doc,
    not re-derived per pair)."""
    ga = F.array_distinct(word_ngrams(col_a, n))
    gb = F.array_distinct(word_ngrams(col_b, n))
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def doc_ngram_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, grams) with grams = DISTINCT word n-grams — one pass per doc.
    Staged so pair-level similarity never re-derives the text pipeline.
    Uses the slice/zip ``word_ngrams`` form: the earlier
    ``transform(sequence, i -> element_at(w, i+j))`` version re-ran the
    full tokenize chain per gram element after projection collapse —
    measured 5.6s -> 0.7s on the sf0.1 corpus for this one stage. The
    words array is additionally materialized in its own projection (r12)
    so the tokenize chain runs once per row, not n+2 times — see
    ``word_ngrams``'s docstring."""
    return df.select(
        F.col(id_col), words(F.col(text_col)).alias("__words")
    ).select(
        F.col(id_col),
        F.array_distinct(word_ngrams_from(F.col("__words"), n)).alias(
            "grams"
        ),
    )


def jaccard_from_sets(ga, gb) -> Column:
    """Jaccard from two precomputed distinct-gram array columns (codegen'd
    set ops only — no text re-processing)."""
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(F.array_union(ga, gb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def l2_norm(col) -> Column:
    """Per-row L2 norm with EXACTLY ``cosine``'s arithmetic (the same
    transform/aggregate expression tree). A pair operator that precomputes
    this once per ROW and combines via ``cosine_from_norms`` is
    bit-identical to calling ``cosine`` per pair — the norm does not
    depend on the pairing — while cutting the per-pair interpreted
    higher-order-function work from three array folds to one (the dot).
    Measured on semantic_dedup's 540-vector all-pairs leg: the pair join
    was ~3x dominated by the two redundant norm folds (r10 perf)."""
    return F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_from_norms(col_a, col_b, na, nb) -> Column:
    """Cosine similarity given the two vectors AND their precomputed
    ``l2_norm`` columns — the per-pair half of the factored form (see
    ``l2_norm``). Edge contract identical to ``cosine``: NULL (never NaN)
    for zero-norm/empty/ragged/NULL/NaN inputs."""
    dot = F.aggregate(
        F.zip_with(col_a, col_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # zero-norm/empty vectors: NULL, not a crash — Spark 4's default ANSI
    # mode raises DIVIDE_BY_ZERO on the bare division, while DuckDB's
    # x/0.0 is NULL. NULL elements and ragged pairs already fold to a NULL
    # dot; the final wrap extends the contract to NaN (a NaN element would
    # otherwise produce a NaN sim, which Spark's descending sort ranks
    # ABOVE every real similarity — a defective vector at rank 1 of every
    # top-k, review r8). Defective pairs have NO similarity: NULL, which
    # never ranks and never crosses a threshold — the oracle COS_SQL
    # carries the identical guard.
    denom = na * nb
    sim = F.when(denom != F.lit(0.0), dot / denom)
    return F.when(~F.isnan(sim), sim)


def cosine(col_a, col_b) -> Column:
    """Cosine similarity of two array<float/double> columns, accumulated in
    double (matches the oracle's list_zip + double-cast formulation)."""
    return cosine_from_norms(col_a, col_b, l2_norm(col_a), l2_norm(col_b))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    "Winnowing: Local Algorithms for Document Fingerprinting").

    Rolling-hash scheme over word ``n``-grams in document order: every
    window of ``w`` consecutive gram hashes contributes its minimum, and the
    fingerprint set is the distinct window minima. Guarantee: two documents
    sharing any run of ``w + n - 1`` words share at least one fingerprint
    (the window lying fully inside the shared run has the same minimum on
    both sides); expected density is 2/(w+1) of the gram count.

    Shape (100 TB): grams are exploded with positions (``posexplode`` keeps
    the hash in whole-stage codegen — no interpreted array lambdas in the
    per-gram path), hashed per row, then ONE shuffle (window partitioned by
    doc id, ordered by position) computes the sliding minima; the distinct
    on (id, fp) rides the same hash partitioning. Docs with fewer than
    ``w`` grams have no full window and yield no rows.

    Returns distinct ``(id_col, fp)`` rows — the document's fingerprint set.
    """
    # words materialized in their own projection (r12): grams AND the
    # arithmetic gram count both derive from the one bound reference, so
    # the tokenize chain runs once per row — see word_ngrams's docstring.
    staged = df.select(F.col(id_col), words(F.col(text_col)).alias("__words"))
    grams = word_ngrams_from(F.col("__words"), n)
    # Gram count derived arithmetically from the word count rather than as
    # size(grams): the latter lands in a Project ABOVE the Generate and
    # rebuilds the whole gram array once per exploded row (observed in the
    # physical plan; ~n_grams x cost). The formula is evaluated once per
    # document on the Generate's input side.
    n_g = F.greatest(F.size(F.col("__words")) - (n - 1), F.lit(0))
    e = staged.select(
        F.col(id_col),
        n_g.alias("__n_g"),
        F.posexplode(grams).alias("__pos", "__gram"),
    )
    win = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(
        Window.currentRow, w - 1
    )
    return (
        e.select(
            F.col(id_col),
            F.col("__pos"),
            F.col("__n_g"),
            F.min(_hash64(F.col("__gram"))).over(win).alias("fp"),
        )
        .filter(F.col("__pos") <= F.col("__n_g") - w)
        .select(id_col, "fp")
        .distinct()
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line/paragraph-level exact dedup (the C4 / RefinedWeb
    curation step): split every document on ``sep``, keep only the globally
    FIRST occurrence of each normalized (lower+trim) line — ordered by
    (doc id, position) — and reassemble documents from their surviving
    lines.

    Returns ``(id_col, n_lines, n_kept, text)`` per document that has at
    least one non-blank line; ``text`` is NULL when every line was a repeat
    of an earlier occurrence.

    Scale shape (reworked r10, VERDICT r9 item 3): the keep-first decision
    is an AGGREGATE, not a window. At corpus scale the line key is heavily
    skewed — the hottest boilerplate lines (cookie banners, license
    headers) appear in a large fraction of documents, and a
    ``row_number() over (partition by key)`` window funnels every copy of
    a hot key into ONE task with no map-side reduction. Here the winner
    per key is ``min(struct(doc_id, pos, line))`` over the line's md5
    (128-bit — a 32/64-bit key would silently merge distinct lines at
    corpus scale, and the grouping must be collision-free because it
    decides which text survives): partial aggregation collapses each map
    partition's copies of a hot key to one candidate BEFORE the shuffle,
    so the reduce side sees at most one row per (map task, key) no matter
    how hot the key is. ``(doc_id, pos)`` is unique per exploded line, so
    the struct min reproduces the window's (doc id, position) first-
    occurrence order exactly, and the winning line text rides inside the
    min struct — no join back onto the skewed key is needed at all.
    Reassembly is then a groupBy on the doc id over WINNERS ONLY (≤ one
    row per distinct line), plus a cheap per-doc line count joined on the
    doc id (never skewed: one row per doc on both sides). The
    first-occurrence rule (vs. reference-free "drop all copies") keeps
    exactly one copy of boilerplate, matching the keep-first convention
    of exact_dedup.
    """
    # F.split takes a Java regex; sep is a LITERAL separator (reassembly
    # below concatenates it literally), so quote it — a caller passing
    # '.' or '|' must not get per-character splitting
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_rx)).alias(
                "__pos", "__line"
            ),
        )
        .filter(F.trim(F.col("__line")) != "")
    )
    # ascii_lower, not lower(): Unicode case-fold diverges per engine
    # (functions/text.py::ascii_lower, review r7)
    key = F.md5(ascii_lower(F.trim(F.col("__line"))))
    # winner per normalized line = lexicographic min over (doc id, pos);
    # (doc_id, pos) is unique so the trailing __line never breaks a tie —
    # it rides along so the surviving RAW text (pre-normalization) comes
    # out of the aggregate without a join back onto the skewed key
    winners = (
        lines.groupBy(key.alias("__key"))
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("__wid"),
                    F.col("__pos").alias("__wpos"),
                    F.col("__line").alias("__wline"),
                )
            ).alias("__first")
        )
        .select(
            F.col("__first.__wid").alias(id_col),
            F.col("__first.__wpos").alias("__pos"),
            F.col("__first.__wline").alias("__line"),
        )
    )
    kept = winners.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda x: x.getField("__line"),
            ),
        ).alias("text"),
    )
    counts = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    # left join: a doc whose every line was a repeat has no winners row —
    # n_kept = 0, text = NULL (the documented contract)
    return counts.join(kept, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        "text",
    )
