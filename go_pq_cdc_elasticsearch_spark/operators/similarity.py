"""Similarity search over the embedding column (LLM-pipeline extension).

Two paths:
- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, score every corpus vector, per-query top-k via window. This is the
  correctness baseline; cost O(|Q| * N * d) fully parallel, one shuffle for
  the top-k. Sane whenever |Q| is broadcast-sized.
- ``lsh_topk`` — the scale path: deterministic random-hyperplane LSH.
  Signatures are computed per-row with built-ins (hyperplane entries are
  ±1 derived from md5(plane,dim) — reproducible everywhere, no RNG state);
  candidates = vectors sharing a signature prefix bucket with the query;
  exact cosine re-rank within buckets. At 100 TB the bucket join replaces
  the N-way scan; recall tunable via n_planes / prefix bits / multi-probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.operators.dedup import _hash64, cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of corpus vectors per query vector (self-matches
    excluded). Returns (qid, vec_id, sim, rank)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col(vec_col)))
        .select("qid", id_col, "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sign(vec_col, plane: int) -> "F.Column":
    """Sign bit of <v, h_plane> where h_plane has deterministic ±1 entries:
    entry d = +1 iff md5('{plane},{d}') is odd. Computed as a single
    aggregate over the array — no UDF, no stored plane matrix."""
    proj = F.aggregate(
        F.zip_with(
            vec_col,
            F.transform(
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda d: F.when(
                    _hash64(F.concat(F.lit(f"{plane},"), d.cast("string"))) % 2 == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            lambda x, s: x.cast("double") * s,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))


def lsh_signature(vec_col, n_planes: int = 8) -> "F.Column":
    """n_planes-bit random-hyperplane signature as a long (bucket key)."""
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        out = out + hyperplane_sign(vec_col, p).cast("long") * F.lit(2**p)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: bucket by hyperplane signature, exact re-rank in-bucket.
    Returns (qid, vec_id, sim, rank). Recall < 1 by construction; the test
    suite measures it against brute_force_topk."""
    from pyspark.sql import Window

    sig = lsh_signature(F.col(vec_col), n_planes)
    c = corpus.withColumn("bucket", sig)
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("q_vec"),
        sig.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col(vec_col)))
        .select("qid", id_col, "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
