"""Similarity search over the embedding column (LLM-pipeline extension).

Three paths:
- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, score every corpus vector, per-query top-k via window. This is the
  correctness baseline; cost O(|Q| * N * d) fully parallel, one shuffle for
  the top-k. Sane whenever |Q| is broadcast-sized.
- ``lsh_topk`` — a scale path: deterministic random-hyperplane LSH.
  Signatures are computed per-row with built-ins (hyperplane entries are
  ±1 derived from md5(plane,dim) — reproducible everywhere, no RNG state);
  candidates = vectors sharing a signature prefix bucket with the query;
  exact cosine re-rank within buckets. At 100 TB the bucket join replaces
  the N-way scan; recall tunable via n_planes / prefix bits / multi-probe.
- ``ivf_topk`` — the data-adaptive scale path (FAISS IVF-Flat shape):
  coarse k-means centroids trained on a bounded sample, every corpus
  vector assigned to its nearest centroid cell in ONE pass, queries probe
  only their ``n_probe`` nearest cells. Candidate volume ~ N * n_probe / k
  regardless of data distribution (LSH buckets can collapse when vectors
  are anisotropic); the corpus is never replicated.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.dedup import (
    _hash64,
    cosine,
    cosine_from_norms,
    l2_norm,
)


def _empty_topk_result(spark, id_col: str) -> DataFrame:
    """Empty (qid, vec_id, sim, rank) frame — the degenerate-input result
    shared by every top-k operator."""
    return spark.createDataFrame(
        [], f"qid long, {id_col} long, sim double, rank int"
    )


def _rank_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared global top-k epilogue: rank candidates per query under the
    SAME total order the local scorers use (sim desc, id asc) and keep k.
    One implementation (review r6): four copies had to stay in lockstep
    with the scorer's tie order — the drift class that motivated unifying
    the scorers themselves."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _local_topk_scorer(q_rows, k: int, id_col: str, mat_col: str):
    """The shared mapInPandas scoring closure behind ``brute_force_topk``
    and ``quantized_topk``: broadcast query matrix, one vectorized matmul
    per Arrow batch, local top-k per query under the global total order
    (sim desc, id asc). ONE implementation on purpose — the two previous
    near-verbatim copies drifted on the zero-norm guard.

    Zero-norm vectors (corpus or query side) score sim 0.0 to everything
    instead of NaN: an unguarded 0/0 turns into NaN, and Spark's
    descending sort orders NaN ABOVE every real double, so a single
    all-zero embedding would otherwise rank #1 for every query."""
    import numpy as np

    # NULL/empty query vectors carry no similarity order — drop them
    # (matching the declarative cosine, which scores them NULL); a RAGGED
    # remainder is a data bug worth a loud driver-side error rather than
    # an opaque "inhomogeneous shape" ValueError inside an Arrow worker
    q_rows = [r for r in q_rows if r[1] is not None and len(r[1]) > 0]
    if not q_rows:
        qids = np.array([], dtype=np.int64)
        qmat = np.zeros((0, 1), dtype=np.float64)
    else:
        dims = {len(r[1]) for r in q_rows}
        if len(dims) > 1:
            raise ValueError(
                f"query vectors have mixed dimensions {sorted(dims)}; "
                f"top-k needs a uniform embedding dim"
            )
        qids = np.array([r[0] for r in q_rows], dtype=np.int64)
        qmat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    dim = qmat.shape[1]
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0  # zero query vector: dot is 0, sim stays 0.0

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty or len(qids) == 0:
                continue
            # NULL/empty/wrong-dim/non-finite corpus vectors: excluded from
            # scoring (the declarative cosine yields NULL for them, which a
            # top-k never selects) — np.array over a ragged list otherwise
            # crashes the whole operator on one bad row (review r6), and a
            # NULL ELEMENT arrives here as NaN (Arrow->pandas), whose NaN
            # sims rank ABOVE every real similarity in the global window
            # even though the local lexsort puts them last — a defective
            # vector at rank 1 whenever a batch is smaller than k (proven
            # by the nulls_rel variant, review r8)
            vals = pdf[mat_col]
            keep = vals.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool)
            if not keep.all():
                pdf = pdf[keep]
                if pdf.empty:
                    continue
            mat = np.array(pdf[mat_col].tolist(), dtype=np.float64)
            # finiteness masked VECTORIZED on the built matrix (one
            # C-level pass), not per-row in the Python keep lambda —
            # this is the per-batch hot path
            finite = np.isfinite(mat).all(axis=1)
            if not finite.all():
                pdf = pdf[finite]
                if pdf.empty:
                    continue
                mat = mat[finite]
            ids = pdf[id_col].to_numpy()
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0  # zero corpus vector: sim 0.0, not NaN
            sims = (mat @ qmat.T) / (norms[:, None] * qnorm[None, :])
            frames = []
            for qi, qid in enumerate(qids):
                s = sims[:, qi]
                mask = ids != qid
                s_m, ids_m = s[mask], ids[mask]
                if len(ids_m) == 0:
                    continue
                order = np.lexsort((ids_m, -s_m))[:k]
                frames.append(
                    pd.DataFrame(
                        {"qid": qid, id_col: ids_m[order], "sim": s_m[order]}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return score


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of corpus vectors per query vector (self-matches
    excluded). Returns (qid, vec_id, sim, rank).

    Scale shape: the query set is small by contract — ship it to every
    partition as a numpy matrix and score each corpus partition with one
    vectorized matmul (Arrow-batched mapInPandas), keeping only the local
    top-k per query under the SAME total order as the global selection
    (sim desc, id asc — so the global top-k is provably a prefix of merged
    local top-ks). The final window sees #partitions * |Q| * k rows, not
    N * |Q|. This is the pattern that survives 100 TB; a per-pair cosine
    expression (interpreted HOF) does not."""

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        # an upstream filter matching nothing must yield an empty result,
        # not a driver AxisError from norm() over a shape-(0,) array
        return _empty_topk_result(queries.sparkSession, id_col)
    score = _local_topk_scorer(q_rows, k, id_col, vec_col)
    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"qid long, {id_col} long, sim double"
    )
    return _rank_topk(scored, k, id_col)


_SIGN_TABLE_DIMS = 1024


@lru_cache(maxsize=None)
def _plane_signs(p: int, n_dims: int = _SIGN_TABLE_DIMS) -> str:
    """The first ``n_dims`` hyperplane signs of plane ``p`` as a '+'/'-'
    string — the SAME md5 contract as the column expression in
    ``with_lsh_bucket`` (``_hash64`` = int(md5(x).hexdigest()[:8], 16)),
    precomputed driver-side. The table is O(planes x dims) — independent
    of corpus size, so at 100 TB it is still 8 KB riding the plan."""
    import hashlib

    return "".join(
        "+"
        if int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8], 16) % 2
        else "-"
        for d in range(n_dims)
    )


def with_lsh_bucket(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    out_col: str = "bucket",
) -> DataFrame:
    """Attach an n_planes-bit random-hyperplane signature (bucket key).

    Hyperplane entries are deterministic ±1 from md5(plane, dim) — no RNG
    state, reproducible on any engine. Shape: posexplode the vector to
    (id, dim, x) rows, compute all plane contributions as plain codegen'd
    column expressions, groupBy(id) with partial aggregation. The naive
    per-array lambda form runs in Spark's interpreted HOF evaluator
    (measured 29.5s -> ~2s on 5k x 64 vectors at sf0.1).

    The sign of plane p at dim d depends only on (p, d), so the md5s are
    precomputed driver-side into a ±-string literal per plane and looked
    up with substring (r12, guide §1.2 per-task work: the expression form
    re-computed n_planes md5+concat per exploded element — n_rows x dims
    x planes hashes of which only planes x dims are distinct). Dims past
    the table fall back to the original md5 expression lazily (CaseWhen
    only evaluates the taken branch), keeping any vector length correct;
    sign parity of the two forms across the boundary is pinned in
    tests/test_llm.py.
    """
    dims = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("__d", "__x")
    )
    md5_sign = lambda p: F.when(  # noqa: E731
        _hash64(F.concat(F.lit(f"{p},"), F.col("__d").cast("string"))) % 2 == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    sign = lambda p: F.when(  # noqa: E731
        F.col("__d") < F.lit(_SIGN_TABLE_DIMS),
        F.when(
            F.substring(
                F.lit(_plane_signs(p)), F.col("__d") + F.lit(1), F.lit(1)
            )
            == F.lit("+"),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    ).otherwise(md5_sign(p))
    proj = dims.groupBy(id_col).agg(
        *[
            F.sum(F.col("__x").cast("double") * sign(p)).alias(f"__p{p}")
            for p in range(n_planes)
        ]
    )
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket + F.when(F.col(f"__p{p}") > 0, F.lit(2**p)).otherwise(
            F.lit(0)
        ).cast("long")
    out = proj.select(F.col(id_col), bucket.alias(out_col))
    # LEFT join: posexplode emits no rows for NULL/empty vectors, and an
    # inner join silently DROPPED those rows from an "attach a column"
    # operator (review r6) — they keep a NULL bucket instead (never equal
    # to any probe bucket, so they are simply never candidates)
    return df.join(out, on=id_col, how="left")


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train coarse IVF centroids on a bounded deterministic sample.

    Sample = the ``sample`` corpus rows with the smallest md5-derived hash
    of their id (deterministic, engine-independent, and executed as a
    TakeOrdered — no full sort materialization). Lloyd's iterations run
    driver-side in numpy on the sample only; the corpus itself is never
    collected. This mirrors the IVF training contract (FAISS trains coarse
    quantizers on a bounded sample too): at 100 TB the sample is still a
    few thousand rows.

    Returns an (n_centroids, d) float64 numpy matrix of L2-normalized
    centroids (cosine assignment == max dot against these).
    """
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col)
        # malformed embeddings (NULL/empty) are excluded from TRAINING like
        # every scorer excludes them from results (review r6 there, r7
        # here): one NULL row in the sample crashed np.array on the driver
        # before the hardened scorers ever ran
        .filter(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
        .orderBy(_hash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample)
        .collect()
    )
    if not rows:
        # empty/fully-filtered corpus: no centroids (np.array([]) is 1-D
        # and norm(axis=1) would raise AxisError — the sibling of the
        # round-2 write_zordered empty-input bug); callers return empty
        # results for an empty centroid set
        return np.zeros((0, 0), dtype=np.float64)
    # ragged rows (wrong-dimension vectors) would still make np.array
    # raise: keep only the sample's dominant dimension, deterministically
    from collections import Counter

    dim = Counter(len(r[1]) for r in rows).most_common(1)[0][0]
    rows = [r for r in rows if len(r[1]) == dim]
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    # non-finite vectors (a NULL element arrives as NaN; NaN/Inf data) are
    # excluded from training like they are from every scorer's candidacy:
    # one NaN row poisons its centroid's mean and every later assignment
    # against it (review r8 — the nulls_rel NaN/Inf vectors fired numpy's
    # invalid-divide warning right here)
    finite = np.isfinite(mat).all(axis=1)
    if not finite.all():
        mat = mat[finite]
        if not len(mat):
            return np.zeros((0, 0), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    k = min(n_centroids, len(unit))
    # Deterministic init: the k sample points with the smallest id-hash
    # (the sample is already in that order).
    cents = unit[:k].copy()
    for _ in range(iters):
        assign = (unit @ cents.T).argmax(axis=1)
        for c in range(k):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def with_ivf_cell(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign every vector to its nearest (cosine) centroid cell.

    One Arrow-batched pass over the corpus: the centroid matrix rides into
    each task inside the closure (k * d doubles — broadcast-sized by
    construction), assignment is a single vectorized matmul + argmax per
    batch. No shuffle, no corpus replication; at 100 TB this is a map-only
    stage that can be persisted alongside the table as the "index".
    """
    import numpy as np

    cents = centroids.astype(np.float64)

    dim = cents.shape[1]

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            # NULL/empty/wrong-dim/non-finite vectors can't be assigned a
            # cell — emit them with a NULL cell instead of crashing the
            # Arrow worker on a ragged np.array (review r6); a NULL cell
            # never matches a probe's cell list, so they are never
            # candidates. Non-finite matters doubly here: a NULL ELEMENT
            # arrives as NaN (Arrow->pandas), argmax over its NaN sims
            # "assigned" it cell 0, and the probe join then scored it NaN —
            # rank 1 of every touching query (proven by the nulls_rel
            # variant, review r8)
            vals = pdf[vec_col]
            keep = vals.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool)
            pdf = pdf[[id_col, vec_col]].copy()
            pdf[out_col] = None
            good = pdf[keep]
            if not good.empty:
                mat = np.array(good[vec_col].tolist(), dtype=np.float64)
                # finiteness masked vectorized on the built matrix (one
                # C-level pass, not a per-row Python lambda); non-finite
                # rows keep the NULL cell like None/ragged ones
                finite = np.isfinite(mat).all(axis=1)
                cells = np.full(len(good), None, dtype=object)
                if finite.any():
                    fm = mat[finite]
                    norms = np.linalg.norm(fm, axis=1)
                    norms[norms == 0] = 1.0
                    cell = ((fm / norms[:, None]) @ cents.T).argmax(axis=1)
                    cells[finite] = cell.astype("int32")
                pdf.loc[keep, out_col] = cells
            yield pdf

    # schema mirrors the INPUT field types: a hardcoded array<float>
    # silently narrowed double embeddings, so semantic_dedup's cosine
    # threshold ran on float32-truncated copies — near-tau pairs flipped
    # across the threshold vs the original column (review r7)
    base = df.select(id_col, vec_col)
    in_types = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    return base.mapInPandas(
        assign,
        schema=(
            f"{id_col} {in_types[id_col]}, "
            f"{vec_col} {in_types[vec_col]}, {out_col} int"
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF-Flat: train coarse centroids, assign corpus cells
    in one pass, probe each query's ``n_probe`` nearest cells, exact cosine
    re-rank inside probed cells only.

    Scale shape: candidates per query ~ N * n_probe / n_centroids whatever
    the data distribution (unlike hyperplane LSH, whose buckets collapse on
    anisotropic embeddings). The probe fan-out lands on the tiny query side
    (|Q| * n_probe rows, broadcast); the corpus is scanned once for
    assignment and once for the probed-cell join — never replicated.
    ``n_probe == n_centroids`` degenerates to exact brute force (recall 1),
    which the test suite uses as the correctness anchor.

    Returns (qid, vec_id, sim, rank)."""
    import numpy as np

    cents = train_ivf_centroids(
        corpus, n_centroids, iters, sample, id_col, vec_col
    )
    if len(cents) == 0:
        # empty corpus -> no centroids: the per-query probe matmul below
        # would crash on a (0,0) matrix; the contract is an empty result
        return _empty_topk_result(corpus.sparkSession, id_col)
    c = with_ivf_cell(corpus, cents, id_col, vec_col)

    # NULL/empty/wrong-dim query vectors are SKIPPED like the other top-k
    # paths (brute force filters them, LSH gives them a NULL signature) —
    # one malformed query row crashed only the IVF operator (review r7)
    q_rows = (
        queries.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
        .collect()
    )
    spark = corpus.sparkSession
    probe_rows = []
    n_probe = min(n_probe, len(cents))
    for r in q_rows:
        if len(r[1]) != cents.shape[1]:
            continue
        qv = np.array(list(r[1]), dtype=np.float64)
        n = np.linalg.norm(qv)
        sims = (qv / (n if n > 0 else 1.0)) @ cents.T
        for cell in np.argsort(-sims)[:n_probe]:
            probe_rows.append((int(r[0]), list(r[1]), int(cell)))
    q = spark.createDataFrame(
        probe_rows, schema="qid long, q_vec array<float>, cell int"
    ).withColumn("__qn", l2_norm(F.col("q_vec")))
    # norms factored out of the pair expression (bit-identical — see
    # l2_norm): corpus norm once per row pre-join, query norm once per
    # probe row on the broadcast side; the in-cell re-rank pays one array
    # fold (the dot) per candidate instead of three
    scored = (
        c.withColumn("__cn", l2_norm(F.col(vec_col)))
        .join(F.broadcast(q), on="cell")
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn(
            "sim",
            cosine_from_norms(
                F.col("q_vec"), F.col(vec_col), F.col("__qn"), F.col("__cn")
            ),
        )
        .select("qid", id_col, "sim")
    )
    return _rank_topk(scored, k, id_col)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    multi_probe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket by hyperplane signature, exact re-rank in-bucket.

    Multi-probe (default): each query additionally probes every bucket at
    hamming distance 1 from its own signature (n_planes+1 probes) — the
    standard recall boost that costs probe-count fan-out on the tiny query
    side instead of more corpus replicas. Corpus rows are never duplicated,
    so at 100 TB the scan/bucketing stays single-pass.

    Returns (qid, vec_id, sim, rank). Recall < 1 by construction; measured
    against brute_force_topk in the test suite."""

    c = with_lsh_bucket(corpus, id_col, vec_col, n_planes)
    q = with_lsh_bucket(queries, id_col, vec_col, n_planes, out_col="__sig").select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("q_vec"),
        F.col("__sig"),
    )
    if multi_probe:
        probes = F.array(
            F.col("__sig"), *[F.col("__sig").bitwiseXOR(2**p) for p in range(n_planes)]
        )
        q = q.select("qid", "q_vec", F.explode(probes).alias("bucket"))
    else:
        q = q.select("qid", "q_vec", F.col("__sig").alias("bucket"))
    # norms factored out of the pair expression (bit-identical — see
    # l2_norm): one array fold per in-bucket candidate instead of three
    scored = (
        c.withColumn("__cn", l2_norm(F.col(vec_col)))
        .join(F.broadcast(q.withColumn("__qn", l2_norm(F.col("q_vec")))), on="bucket")
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn(
            "sim",
            cosine_from_norms(
                F.col("q_vec"), F.col(vec_col), F.col("__qn"), F.col("__cn")
            ),
        )
        .select("qid", id_col, "sim")
    )
    return _rank_topk(scored, k, id_col)


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.95,
    n_centroids: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level near-duplicate REMOVAL (the SemDeDup shape, Abbas et
    al. 2023: cluster, then deduplicate within clusters only).

    Pipeline: coarse k-means cells (bounded-sample training, map-only
    assignment — the IVF machinery reused) -> within-cell pairs with
    cosine >= ``tau`` (equi-join on cell, never a global cross product) ->
    connected components -> keep the min-id representative per component.

    Scale shape: the quadratic step is confined to cells; with
    ``n_centroids`` grown ~ N/const the per-cell pair cost stays bounded,
    which is exactly why SemDeDup clusters first. Trade-off stated: near-
    duplicates that land in different cells are missed (recall < 1 at cell
    boundaries) — the standard accepted approximation; ``n_centroids=1``
    degenerates to exact all-pairs dedup (the test anchor).

    Returns ``df`` minus dropped near-duplicates.
    """
    from go_pq_cdc_elasticsearch_spark.operators.dedup import (
        connected_components,
    )

    if n_centroids <= 1:
        # degenerate exact config (the q_lx4 test anchor): with ONE cell
        # every row's argmax is cell 0 no matter what the centroid is, so
        # the k-means train (a driver collect + Lloyd's run) and the
        # full-corpus assignment matmul (Arrow mapInPandas round-trip)
        # are pure waste — a literal column is semantically identical
        # and keeps this config entirely JVM-side (review r9 perf).
        # Defective vectors (NULL/ragged/non-finite) now reach the pair
        # join where with_ivf_cell gave them a NULL cell — equivalent,
        # because cosine() folds every defective pair to a NULL sim that
        # never crosses tau (nulls_rel-gated)
        cells = df.withColumn("cell", F.lit(0)).persist()
    else:
        cents = train_ivf_centroids(
            df, n_centroids, iters, sample, id_col, vec_col
        )
        # persist: cells feeds BOTH sides of the pair self-join —
        # unpersisted, the Arrow/mapInPandas cell-assignment pass
        # (full-corpus matmul + Python worker round-trip, the dominant
        # cost) executes twice (same double-evaluation dedup_corpus
        # persists its grams against)
        cells = with_ivf_cell(df, cents, id_col, vec_col).persist()
    # norms precomputed per ROW (O(n) folds), pair filter does only the
    # dot (one fold per pair instead of three) — bit-identical to the
    # per-pair cosine() since the norm is pairing-independent (see
    # operators/dedup.py::l2_norm; measured ~3x on the all-pairs leg, r10)
    nrm = l2_norm(F.col(vec_col))
    a = cells.select(
        F.col("cell"),
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("__v1"),
        nrm.alias("__n1"),
    )
    b = cells.select(
        F.col("cell"),
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("__v2"),
        nrm.alias("__n2"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id1") < F.col("id2"))
        .filter(
            cosine_from_norms(
                F.col("__v1"), F.col("__v2"), F.col("__n1"), F.col("__n2")
            )
            >= tau
        )
        .select("id1", "id2")
    )
    # connected_components executes eagerly (per-round convergence probes)
    # and localCheckpoints its labels, so cells is out of the returned
    # lineage by the time it returns — safe to release here
    comp = connected_components(pairs)
    cells.unpersist()
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_vec: str = "qvec",
    out_scale: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v| / 127``,
    ``q[i] = round(v[i] / scale)`` — the standard scalar-quantization
    compaction (FAISS SQ8 shape).

    Why it matters at 100 TB: embeddings dominate similarity-search storage
    and shuffle volume; int8 + one float scale is a 4x reduction (64-dim:
    256 B float32 -> 64 B + 4 B) with a bounded reconstruction error of
    ``scale/2`` per element. Store THIS as the search representation and
    keep full precision only for final re-rank if needed.

    Shape: pure column algebra (JVM whole-stage codegen, no Python, no
    shuffle). Rounding is an explicit ``floor(x + 0.5)`` (half-up) so the
    arithmetic is bit-reproducible in any engine — every step (abs, max,
    the two divisions, +0.5, floor) is an order-independent exact IEEE-754
    double op, which is what lets the q_lx3 DuckDB oracle recompute the
    identical int8 codes. Returns (id, qvec array<tinyint>, q_scale float).
    Zero vectors get scale 0 and an all-zero qvec (dequantizes to exactly
    zero).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    safe = F.when(scale == F.lit(0.0), F.lit(1.0)).otherwise(scale)
    q = F.transform(v, lambda x: F.floor(x / safe + F.lit(0.5)).cast("tinyint"))
    # non-finite vectors (NaN/Inf element) quantized to ALL-ZERO codes —
    # Spark's floor maps NaN/x-div-Inf to 0 — whose zero-norm guard then
    # scored a real 0.0: a defective vector INSIDE the top-k whenever a
    # query has fewer than k positive neighbors (review r8; the
    # defective-vector contract says NULL — never ranks). NULL-element
    # vectors already carry the NULL through floor.
    finite = ~F.exists(
        v,
        lambda x: F.isnan(x)
        | (x == F.lit(float("inf")))
        | (x == F.lit(float("-inf"))),
    )
    q = F.when(finite, q)
    scale = F.when(finite, scale)
    return df.select(
        F.col(id_col),
        q.alias(out_vec),
        scale.cast("float").alias(out_scale),
    )


def quantized_topk(
    qcorpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Exact-procedure cosine top-k computed directly on the int8-quantized
    corpus (same local-top-k-then-window shape as ``brute_force_topk`` —
    the corpus never travels at full precision). Scores are approximate
    only through the quantization error; cosine is scale-invariant per
    vector, so the per-vector scale cancels except for rounding.

    Returns (qid, vec_id, sim, rank)."""

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        # an upstream filter matching nothing must yield an empty result,
        # not a driver AxisError from norm() over a shape-(0,) array
        return _empty_topk_result(queries.sparkSession, id_col)
    # int8 matmul accumulated in float64; per-vector scale cancels in
    # cosine, so dequantization is just the int matrix itself
    score = _local_topk_scorer(q_rows, k, id_col, qvec_col)
    # scale_col is NOT shipped to the scorer: cosine is scale-invariant
    # (documented below), so the per-row scale was a dead column paid in
    # Arrow serialization for every corpus row (review r6)
    scored = qcorpus.select(id_col, qvec_col).mapInPandas(
        score, schema=f"qid long, {id_col} long, sim double"
    )
    return _rank_topk(scored, k, id_col)
