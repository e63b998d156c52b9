"""LLM-pipeline operators: planted near-duplicates are found; ANN recall
against the exact baseline; text functions match a pure-Python model."""

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.functions import text as TX
from go_pq_cdc_elasticsearch_spark.operators import dedup as DD
from go_pq_cdc_elasticsearch_spark.operators import similarity as SIM

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden of the old house"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("lazy", "sleepy")),  # near-dup of 1
        (4, "completely different text about spark query engines and shuffles "
            "partitions joins aggregations windows and columnar storage formats"),
        (5, "  The   QUICK brown fox jumps over the lazy dog while the cat watches "
            "from the warm windowsill and the birds sing in the garden of the old house  "),
        # normalization dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalization(spark):
    out = DD.exact_dedup(_docs(spark)).collect()
    reps = {r["doc_id"]: r["n_copies"] for r in out}
    assert reps[1] == 3  # docs 1, 2, 5 collapse
    assert reps[3] == 1 and reps[4] == 1


def test_minhash_lsh_finds_planted_neardups(spark):
    pairs = {
        (r["id1"], r["id2"])
        # 8 bands of 2 rows (the default): S-curve threshold ~0.35, so the
        # J~0.8 planted near-dup is found with near-certainty — the honest
        # calibration for the non-degenerate permutation family
        for r in DD.minhash_lsh_candidates(_docs(spark), k=16, bands=8).collect()
    }
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 5) in pairs  # normalization dup
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup shares most shingles
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_minhash_array_form_equals_exploded_form(spark):
    # dedup.minhash_signature (array expressions) and minhash_band_rows
    # (explode + partial agg — the scale path) must produce identical
    # signatures; guards both implementations against drift. Includes a
    # SHORT doc (< n words): the array form must give it an empty band
    # array like the exploded form emits no rows — previously every
    # short doc's every band hashed md5('') and all short docs became
    # mutual LSH candidates (review r6)
    d = _docs(spark)
    short = spark.createDataFrame(
        [(901, "two words"), (902, "one"), (903, "")],
        "doc_id long, text string",
    )
    bands_arr = {
        r["doc_id"]: list(r["bands"])
        for r in short.select(
            "doc_id",
            DD.minhash_bands(
                DD.minhash_signature(F.col("text"), k=8), bands=4,
                rows_per_band=2,
            ).alias("bands"),
        ).collect()
    }
    assert all(v == [] for v in bands_arr.values()), bands_arr
    assert DD.minhash_band_rows(short, k=8, bands=4).count() == 0
    sig_arr = {
        r["doc_id"]: list(r["sig"])
        for r in d.select(
            "doc_id", DD.minhash_signature(F.col("text"), k=8).alias("sig")
        ).collect()
    }
    rows = DD.minhash_band_rows(d, k=8, bands=8).collect()  # 1 hash per band
    sig_exp = {}
    for r in rows:
        sig_exp.setdefault(r["doc_id"], {})[r["band_idx"]] = r["band_hash"]
    import hashlib

    for doc_id, sig in sig_arr.items():
        for j, v in enumerate(sig):
            assert (
                hashlib.md5(str(v).encode()).hexdigest() == sig_exp[doc_id][j]
            ), (doc_id, j)


def test_jaccard_separates_dup_from_unrelated(spark):
    d = _docs(spark)
    a = d.select(F.col("doc_id").alias("id1"), F.col("text").alias("t1"))
    b = d.select(F.col("doc_id").alias("id2"), F.col("text").alias("t2"))
    pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    out = {
        (r["id1"], r["id2"]): r["jac"]
        for r in pairs.select(
            "id1", "id2", DD.jaccard_ngrams(F.col("t1"), F.col("t2")).alias("jac")
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 5)] == 1.0  # whitespace/case normalize
    assert 0.5 < out[(1, 3)] < 1.0
    assert out[(1, 4)] == 0.0


def test_dedup_corpus_removes_neardups_keeps_rest(spark):
    survivors = {
        r["doc_id"] for r in DD.dedup_corpus(_docs(spark), jaccard_threshold=0.6).collect()
    }
    # docs 1,2,3,5 form one near-dup component -> representative 1 survives;
    # unrelated doc 4 untouched
    assert survivors == {1, 4}


def test_connected_components_chain(spark):
    # chain 1-2, 2-3, 3-4 plus isolated pair 10-11: diameter > 1 forces
    # multiple propagation rounds
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id1 long, id2 long"
    )
    comp = {r["id"]: r["component"] for r in DD.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_snowflake_scale_ids(spark):
    # regression: the sum-based convergence witness overflowed BIGINT
    # under ANSI mode for realistic 64-bit ids (a handful of ~4e18 ids
    # crashed the FIRST labels agg); the witness now sums DECIMAL(38,0)
    B = 4_000_000_000_000_000_000
    pairs = spark.createDataFrame(
        [(B + 1, B + 2), (B + 2, B + 3), (B + 10, B + 11)],
        "id1 long, id2 long",
    )
    comp = {r["id"]: r["component"] for r in DD.connected_components(pairs).collect()}
    assert comp == {
        B + 1: B + 1, B + 2: B + 1, B + 3: B + 1,
        B + 10: B + 10, B + 11: B + 10,
    }


def test_simhash_hamming(spark):
    d = _docs(spark).select("doc_id", DD.simhash16(F.col("text")).alias("h"))
    h = {r["doc_id"]: r["h"] for r in d.collect()}
    assert h[1] == h[2] == h[5]
    assert bin(h[1] ^ h[3]).count("1") <= 4  # near-dup: small hamming dist
    assert bin(h[1] ^ h[4]).count("1") >= 4  # unrelated: larger


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, queries, k=5)
    approx = SIM.lsh_topk(emb, queries, k=5, n_planes=4)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # 4 planes + multi-probe over random vectors; recall is partial by design
    assert sum(recalls) / len(recalls) >= 0.25
    # and the approx sims must be genuine cosines: subset check on one query
    ex = {(r["qid"], r["vec_id"]): round(r["sim"], 9) for r in exact.collect()}
    ap = {(r["qid"], r["vec_id"]): round(r["sim"], 9) for r in approx.collect()}
    common = set(ex) & set(ap)
    assert common and all(ex[kv] == ap[kv] for kv in common)


def test_lsh_sign_table_matches_md5_expression(spark):
    """r12: with_lsh_bucket precomputes the hyperplane signs driver-side
    (a ±-string literal per plane) instead of evaluating md5(plane, dim)
    per exploded element. The table MUST reproduce the md5 expression
    exactly — including past the table boundary (_SIGN_TABLE_DIMS), where
    the expression fallback takes over — or buckets silently diverge from
    the DuckDB oracle's md5-derived hyperplanes."""
    import random

    from go_pq_cdc_elasticsearch_spark.operators.dedup import _hash64
    from go_pq_cdc_elasticsearch_spark.operators.similarity import (
        _SIGN_TABLE_DIMS,
        _plane_signs,
    )

    # 1. driver table vs the column expression, element by element, for a
    # window straddling the table boundary
    lo, hi = _SIGN_TABLE_DIMS - 8, _SIGN_TABLE_DIMS + 8
    dims_df = spark.range(hi).select(F.col("id").cast("int").alias("__d"))
    expr_signs = {
        r["__d"]: r["s"]
        for r in dims_df.select(
            "__d",
            *[
                F.when(
                    _hash64(
                        F.concat(F.lit(f"{p},"), F.col("__d").cast("string"))
                    )
                    % 2
                    == 1,
                    F.lit(1.0),
                )
                .otherwise(F.lit(-1.0))
                .alias(f"p{p}")
                for p in range(2)
            ],
        )
        .select(
            "__d", F.array(*[F.col(f"p{p}") for p in range(2)]).alias("s")
        )
        .collect()
    }
    for p in range(2):
        table = _plane_signs(p)
        for d in range(0, _SIGN_TABLE_DIMS, 37):
            want = 1.0 if table[d] == "+" else -1.0
            assert expr_signs[d][p] == want, (p, d)

    # 2. end-to-end: buckets of long vectors (crossing the fallback
    # boundary) are identical to brute-force recomputation of the md5
    # projection — proves the CaseWhen fallback stitches correctly
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(hi if i % 2 else 16)])
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["bucket"]
        for r in SIM.with_lsh_bucket(df, n_planes=4).collect()
    }
    import hashlib

    for i, vec in rows:
        bucket = 0
        for p in range(4):
            proj = sum(
                x
                * (
                    1.0
                    if int(
                        hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8], 16
                    )
                    % 2
                    else -1.0
                )
                for d, x in enumerate(vec)
            )
            if proj > 0:
                bucket += 2**p
        assert got[i] == bucket, i

    # 3. window probe of the expression across the boundary (lo..hi) — the
    # fallback region itself, not just sampled table dims
    for p in range(2):
        table = _plane_signs(p)
        for d in range(lo, _SIGN_TABLE_DIMS):
            want = 1.0 if table[d] == "+" else -1.0
            assert expr_signs[d][p] == want, (p, d)


def test_ivf_topk_full_probe_equals_bruteforce(spark, sf_dir):
    # n_probe == n_centroids scans every cell -> exact brute force.
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, queries, k=5)
    full = SIM.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8)
    ex = {(r["qid"], r["vec_id"]): round(r["sim"], 6) for r in exact.collect()}
    fu = {(r["qid"], r["vec_id"]): round(r["sim"], 6) for r in full.collect()}
    assert ex == fu


def test_ivf_topk_partial_probe_recall_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, queries, k=5)
    approx = SIM.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # random vectors are near-orthogonal (worst case for IVF); still, the
    # query's own cell is always probed, so recall stays well above chance
    assert sum(recalls) / len(recalls) >= 0.25
    # probed-cell sims are genuine cosines (match exact where they overlap)
    ex = {(r["qid"], r["vec_id"]): round(r["sim"], 9) for r in exact.collect()}
    ap = {(r["qid"], r["vec_id"]): round(r["sim"], 9) for r in approx.collect()}
    common = set(ex) & set(ap)
    assert common and all(ex[kv] == ap[kv] for kv in common)
    # deterministic end to end (hash-ordered sample + fixed init)
    again = SIM.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    assert sorted(map(tuple, approx.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_ivf_cell_assignment_partitions_corpus(spark, sf_dir):
    # Every corpus vector lands in exactly one cell; cells cover the corpus.
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SIM.train_ivf_centroids(emb, n_centroids=4, sample=256)
    assert cents.shape[0] == 4
    cells = SIM.with_ivf_cell(emb, cents)
    n = emb.count()
    assert cells.count() == n
    assert cells.select("vec_id").distinct().count() == n
    per_cell = {r["cell"]: r["n"] for r in cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(per_cell.values()) == n and len(per_cell) >= 2


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype="float64")
    ids = pdf["vec_id"].to_numpy()
    q = mat[ids < 3]
    sims = q @ mat.T / (
        np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(mat, axis=1)[None, :]
    )
    expected = {}
    for qi, qid in enumerate(ids[ids < 3]):
        order = [
            (ids[j], sims[qi, j]) for j in np.argsort(-sims[qi]) if ids[j] != qid
        ][:5]
        expected[qid] = [int(v) for v, _ in order]
    got = {}
    out = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    for r in sorted(out.collect(), key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["vec_id"])
    assert got == expected


def test_winnowing_guarantee_and_coverage(spark):
    # Schleimer et al. guarantee: two docs sharing a run of w + n - 1 = 6
    # words share at least one fingerprint (the all-shared window's min is
    # selected on both sides).
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{shared} unique1 tail tokens here now"),
        (2, f"lead other words go {shared} closing"),
        (3, "wholly unrelated content about storage engines and page caches"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = DD.winnow_fingerprints(df, n=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # coverage property: every window of w consecutive grams contains at
    # least one selected position — check via a pure-Python model
    import hashlib

    def model_fps(text, n=3, w=4):
        ws = " ".join(text.lower().split()).split(" ")
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    for doc_id, text in rows:
        assert by_doc.get(doc_id, set()) == model_fps(text)


def test_quantize_embeddings_error_bound_and_roundtrip(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    orig = {r.vec_id: np.array(list(r.embedding), dtype=np.float64)
            for r in emb.collect()}
    q = SIM.quantize_embeddings(emb).collect()
    assert len(q) == len(orig)
    for r in q:
        v = orig[r.vec_id]
        scale = float(r.q_scale)
        qv = np.array(list(r.qvec), dtype=np.float64)
        assert qv.min() >= -127 and qv.max() <= 127
        if scale == 0:
            assert np.all(v == 0) and np.all(qv == 0)
            continue
        # reconstruction error bounded by half a quantization step
        assert np.abs(qv * scale - v).max() <= scale / 2 + 1e-9


def test_quantized_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, queries, k=5).collect()
    qcorpus = SIM.quantize_embeddings(emb)
    approx = SIM.quantized_topk(qcorpus, queries, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.qid, set()).add(r.vec_id)
    assert set(approx_sets) == set(exact_sets)
    hits = sum(len(exact_sets[q] & approx_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_heavy_hitters_equals_naive_exact(spark, sf_dir):
    # the sketch only prunes; verified output must EQUAL the from-scratch
    # groupBy answer on real corpus tokens
    from go_pq_cdc_elasticsearch_spark.operators.frequent import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.words(F.col("text"))).alias("token"))
    got = {(r.token, r.cnt) for r in heavy_hitters(toks, "token", 1, 200).collect()}
    total = toks.count()
    naive = {
        (r.token, r.cnt)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 200 >= total)
        .collect()
    }
    assert got == naive and len(got) > 0


def test_heavy_hitters_skew_and_nulls(spark):
    # one dominant key, a mid key straddling the threshold, nulls ignored
    from go_pq_cdc_elasticsearch_spark.operators.frequent import heavy_hitters

    rows = (
        [("hot",)] * 600
        + [("warm",)] * 10
        + [("cold_%d" % i,) for i in range(390)]
        + [(None,)] * 50
    )
    df = spark.createDataFrame(rows, "k string")
    got = {(r.k, r.cnt) for r in heavy_hitters(df, "k", 1, 100).collect()}
    # total non-null = 1000; threshold cnt*100 >= 1000 => cnt >= 10
    assert got == {("hot", 600), ("warm", 10)}


def test_heavy_hitters_empty_and_validation(spark):
    import pytest

    from go_pq_cdc_elasticsearch_spark.operators.frequent import heavy_hitters

    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", 1, 10).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(empty, "k", 0, 10)
    with pytest.raises(ValueError):
        heavy_hitters(empty, "k", 1, 100000)


def test_minhash_family_permutations_are_diverse():
    # regression: with a modulus larger than the a*h+b range the reduction
    # never engages and every "permutation" is monotone in the base hash —
    # all k slots pick the SAME argmin shingle. The family must genuinely
    # reorder: across k slots the argmin over a fixed shingle set should
    # hit many different shingles, and slot rankings must disagree.
    import hashlib

    from go_pq_cdc_elasticsearch_spark.operators.dedup import (
        MERSENNE31,
        family_coeffs,
    )

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    shingles = [f"tok{i} tok{i+1} tok{i+2}" for i in range(200)]
    hs = [h64(s) for s in shingles]
    argmins = []
    for j in range(16):
        a, b = family_coeffs(j)
        vals = [(a * h + b) % MERSENNE31 for h in hs]
        argmins.append(vals.index(min(vals)))
    # 16 independent permutations over 200 elements: expected ~15 distinct
    # argmins; the degenerate family gives exactly 1
    assert len(set(argmins)) >= 8, argmins
    base_argmin = hs.index(min(hs))
    assert any(am != base_argmin for am in argmins)


def test_ivf_recall_drift_bounds_sf01(spark):
    """Drift canaries for the q_lx1 approximate config at sf0.1 (VERDICT r3
    item 4): quantitative floors so a silent recall collapse (centroid
    training bug, cell-assignment regression) fails loudly. The testdata
    embeddings are RANDOM, i.e. near-orthogonal — IVF's worst case — so
    the floors are measured-minus-margin (declared n_probe=3/8 measured
    0.60; n_probe=6/8 measured 0.92 on 2026-08 data), not the >=0.9 a
    clustered real-world corpus would give the declared config."""
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact_sets = {}
    for r in SIM.brute_force_topk(emb, queries, k=5).collect():
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])

    def recall(n_probe):
        got = {}
        for r in SIM.ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=n_probe
        ).collect():
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        rs = [
            len(exact_sets[q] & got.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        return sum(rs) / len(rs)

    assert recall(3) >= 0.35  # declared q_lx1 config
    assert recall(6) >= 0.75  # scale path: recall climbs with probes


def test_semantic_dedup_recall_drift_on_planted_dups_sf01(spark):
    """q_lx4 drift bound (VERDICT r3 item 4): the raw sf0.1 table has NO
    pairs above tau=0.99 (random vectors), so the zero-vs-zero agreement
    was vacuous. Plant exact-direction duplicates (scaled copies — cell
    argmax is scale-invariant, cosine == 1) and require the
    cluster-approximate config to find >= 0.9 of what the n_centroids=1
    exact anchor drops."""
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    base = emb.filter(F.col("vec_id") < 40)
    dups = base.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x * F.lit(1.0001)
        ).alias("embedding"),
        "label",
    )
    planted = emb.unionByName(dups)
    all_ids = {r["vec_id"] for r in planted.select("vec_id").collect()}
    kept_exact = {
        r["vec_id"]
        for r in SIM.semantic_dedup(planted, tau=0.99, n_centroids=1)
        .select("vec_id")
        .collect()
    }
    kept_approx = {
        r["vec_id"]
        for r in SIM.semantic_dedup(planted, tau=0.99, n_centroids=8)
        .select("vec_id")
        .collect()
    }
    dropped_exact = all_ids - kept_exact
    dropped_approx = all_ids - kept_approx
    assert len(dropped_exact) >= 40  # the planted copies are found
    assert len(dropped_approx & dropped_exact) / len(dropped_exact) >= 0.9


def test_connected_components_string_ids(spark):
    """Content-handle string ids (review r5): the unconditional
    cast('long') raised CAST_INVALID_INPUT under ANSI mode. Min-label
    propagation works on the native type; component = lexicographic min."""
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id1 string, id2 string"
    )
    comp = {r["id"]: r["component"] for r in DD.connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_minhash_bands_must_divide_k(spark):
    """bands > k silently made rows_per_band 0 — every band hashed md5('')
    and LSH degenerated into the full N^2 cross product (confirmed by
    execution, review r5); non-dividing k dropped signature slots."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="must divide"):
        DD.minhash_band_rows(docs, k=4, bands=8)
    with pytest.raises(ValueError, match="must divide"):
        DD.minhash_band_rows(docs, k=16, bands=5)


def test_connected_components_long_chain_converges(spark):
    """Review r8: edge-propagation alone needed O(diameter) rounds, so a
    30-node path (successive document revisions) silently exhausted the
    default 20-iteration cap and returned WRONG labels with no error —
    9 of 30 ids kept non-min components. Pointer jumping makes chain
    convergence logarithmic; the exhausted cap now raises."""
    # driver_gate_edges=0 pins the DISTRIBUTED loop (the r12 small-graph
    # gate would otherwise label this chain on the driver)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id1 long, id2 long"
    )
    labels = DD.connected_components(pairs, driver_gate_edges=0)
    assert {r["component"] for r in labels.collect()} == {1}

    # string-id path takes the generic convergence probe: same contract
    spairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(1, 30)],
        "id1 string, id2 string",
    )
    slabels = DD.connected_components(spairs, driver_gate_edges=0)
    assert {r["component"] for r in slabels.collect()} == {"d01"}


def test_connected_components_raises_when_cap_exhausted(spark):
    """Review r8: a non-converged exit must be LOUD — returning partial
    labels silently under-dedups (the corpus keeps several 'representatives'
    of one component)."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id1 long, id2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(pairs, max_iterations=1, driver_gate_edges=0)


def test_connected_components_driver_gate_parity(spark):
    """r12 small-graph fast path: below the gate the edge list is labeled
    by driver-side union-find; labels must equal the distributed loop's
    fixpoint exactly — on cliques, chains, isolated pairs and a mixed
    graph, for numeric and string ids, and just above/below the gate."""
    import random

    rng = random.Random(12)
    edges = [(i, i + 1) for i in range(1, 15)]  # chain
    edges += [(100 + a, 100 + b) for a in range(8) for b in range(a + 1, 8)]
    edges += [(500, 501), (600, 601)]  # isolated pairs
    edges += [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(40)]
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    fast = {
        (r["id"], r["component"])
        for r in DD.connected_components(pairs).collect()
    }
    slow = {
        (r["id"], r["component"])
        for r in DD.connected_components(pairs, driver_gate_edges=0).collect()
    }
    assert fast == slow

    # gate boundary: len(edges) above the gate must take the distributed
    # path (same labels), exactly at the gate the driver path
    at_gate = {
        (r["id"], r["component"])
        for r in DD.connected_components(
            pairs, driver_gate_edges=len(edges)
        ).collect()
    }
    above_gate = {
        (r["id"], r["component"])
        for r in DD.connected_components(
            pairs, driver_gate_edges=len(edges) - 1
        ).collect()
    }
    assert at_gate == slow and above_gate == slow

    spairs = spark.createDataFrame(
        [(f"k{a:03d}", f"k{b:03d}") for a, b in edges],
        "id1 string, id2 string",
    )
    sfast = {
        (r["id"], r["component"])
        for r in DD.connected_components(spairs).collect()
    }
    sslow = {
        (r["id"], r["component"])
        for r in DD.connected_components(spairs, driver_gate_edges=0).collect()
    }
    assert sfast == sslow


def test_minhash_bands_size_guard(spark):
    """Review r8: the Column form can't see minhash_signature's k at build
    time — a bands*rows_per_band overrun died mid-job with a cryptic
    data-dependent INVALID_ARRAY_INDEX (ANSI) or silently hashed partial
    slices (non-ANSI, the md5('') N^2 degeneracy). Loud, named error now;
    non-positive params rejected at build time."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="exceeds the signature size"):
        docs.select(
            DD.minhash_bands(
                DD.minhash_signature(F.col("text"), k=8), bands=4, rows_per_band=4
            ).alias("b")
        ).collect()
    with pytest.raises(ValueError, match="must be positive"):
        DD.minhash_bands(F.col("sig"), bands=0)
    # the matched config still works and short docs still band to empty
    ok = docs.select(
        DD.minhash_bands(
            DD.minhash_signature(F.col("text"), k=16), bands=4, rows_per_band=4
        ).alias("b")
    ).first()
    assert len(ok["b"]) == 4


def test_defective_vectors_have_no_similarity(spark, sf_dir):
    """Review r8 (nulls_rel variant findings): a vector with a NULL or NaN
    element, an empty vector, or a ragged pair has NO similarity — NULL,
    never a rank. Pre-fix, a NULL element reached pandas as NaN: IVF's
    argmax 'assigned' it cell 0 and its NaN sims ranked it #1 of every
    touching query (Spark sorts NaN above all reals), and the brute-force
    scorer leaked NaN rows whenever a batch was smaller than k. DuckDB's
    list_sum meanwhile SKIPPED the NULL element (partial dot), so the
    oracle disagreed three ways."""
    import glob
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_pq_cdc_elasticsearch_spark.operators import similarity as SIM
    from go_pq_cdc_elasticsearch_spark.operators.dedup import cosine
    from go_pq_cdc_elasticsearch_spark.sql import EXT_REGISTRY
    from go_pq_cdc_elasticsearch_spark.testing_utils import compare, duckdb_con

    # unit level: fold cosine NULLs every defective shape
    base = [0.25] * 4
    rows = [
        ("elem_null", [None, 0.25, 0.25, 0.25], base),
        ("elem_nan", [float("nan"), 0.25, 0.25, 0.25], base),
        ("empty", [], base),
        ("ragged", [0.25, 0.25], base),
        ("clean", base, base),
    ]
    df = spark.createDataFrame(rows, "name string, a array<float>, b array<float>")
    sims = {r["name"]: r["sim"] for r in df.select(
        "name", cosine(F.col("a"), F.col("b")).alias("sim")).collect()}
    assert sims["clean"] is not None and abs(sims["clean"] - 1.0) < 1e-9
    for name in ("elem_null", "elem_nan", "empty", "ragged"):
        assert sims[name] is None, f"{name}: {sims[name]}"

    # operator level on a crafted corpus (small batches force the leak):
    # defective vectors never appear in any top-k
    work = tempfile.mkdtemp(prefix="defvec_")
    dst = os.path.join(work, "sf")
    os.makedirs(dst)
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)
        if name != "embeddings.parquet":
            shutil.copy(f, os.path.join(dst, name))
            continue
        t = pq.read_table(f)
        dim = len(t.column("embedding")[0].as_py())
        elem_null = [None] + [0.25] * (dim - 1)
        mx = max(v for v in t.column("vec_id").to_pylist() if v is not None)
        extra = pa.table({
            "vec_id": pa.array([mx + 1, mx + 2, mx + 3], type=t.schema.field("vec_id").type),
            "embedding": pa.array([None, elem_null, []], type=t.schema.field("embedding").type),
            "label": pa.array([None, 0, 0], type=t.schema.field("label").type),
        })
        pq.write_table(pa.concat_tables([t, extra]), os.path.join(dst, name))

    emb = load_table(spark, dst, "embeddings").repartition(32)  # tiny batches
    q = emb.filter(F.col("vec_id") < 8)
    bf = SIM.brute_force_topk(emb, q, k=20)
    assert bf.filter(F.col("vec_id") > mx).count() == 0
    ivf = SIM.ivf_topk(emb, q, k=5, n_centroids=4, n_probe=4)
    assert ivf.filter(F.col("vec_id") > mx).count() == 0

    # oracle parity of the embedding-facing driver queries on this corpus
    con = duckdb_con(dst)
    for qid in ("q_l6_embedding_neardup", "q_lx1b_ivf_anchor"):
        qq = EXT_REGISTRY[qid]
        problems = compare(qq.spark(spark, dst), con, qq.oracle)
        assert not problems, f"{qid}: {problems}"
