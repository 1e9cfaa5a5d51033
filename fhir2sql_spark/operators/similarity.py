"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) query set against the candidate corpus — a map-side nested
loop with per-partition top-k, no shuffle of the corpus. The dot
product is a JVM-side zip_with/aggregate fold (sequential, so the
float accumulation order is deterministic — required for oracle
parity).

Scale path: LSH bucketing via random hyperplanes (cosine LSH). Each
vector maps to a bit-signature; candidates are vectors sharing a
bucket in >=1 table. Turns all-pairs into an equi-join on
(table, bucket) — the same banding trick as MinHash, 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixture embedding dimensionality. Operators take dim explicitly;
# this is only the default.
DIM = 64


def _dot(a: str | F.Column, b: str | F.Column, dim: int | None = None) -> F.Column:
    """Dot product as a zip_with/aggregate fold: sequential
    left-to-right accumulation — the same order as DuckDB's
    list_dot_product, so results are bit-identical (oracle parity).

    Measured (500k pairs x 64 dims, local[32]): this fold runs 2-3x
    FASTER than an explicit 64-term element_at/getItem sum — the giant
    expression tree defeats whole-stage codegen while the higher-order
    functions use a specialized evaluator. Keep the fold; precompute
    norms per VECTOR (not per pair) and barrier them with
    localCheckpoint so Catalyst's projection collapse can't inline the
    norm expression into the per-pair projection (``dim`` is accepted
    for signature stability; the fold doesn't need it)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str | F.Column, dim: int | None = None) -> F.Column:
    return F.sqrt(_dot(a, a, dim))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = DIM,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded), ties broken by candidate id ascending."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    q = q.withColumn("q_norm", _norm("q_vec", dim))
    c = c.withColumn("c_norm", _norm("c_vec", dim))
    pairs = F.broadcast(q).crossJoin(c).where(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id",
        "c_id",
        (
            _dot("q_vec", "c_vec", dim) / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("cosine", 4).alias("cosine"), "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_signatures(
    vectors: DataFrame,
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (cosine) LSH: sign-bit signature per vector.

    The hyperplanes are generated driver-side from a seed (tiny —
    n_planes x dim floats) and folded into the plan as literals, so the
    executor-side work is pure column arithmetic on the JVM.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for p_i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bits.append(
            F.when(_dot(F.col(vec_col), lit_plane) >= 0, F.lit(1)).otherwise(
                F.lit(0)
            ).alias(f"bit{p_i}")
        )
    sig = vectors.select(F.col(id_col), F.col(vec_col), *bits)
    bucket = F.concat_ws("", *[F.col(f"bit{i}") for i in range(n_planes)])
    return sig.select(
        F.col(id_col), F.col(vec_col), bucket.alias("bucket")
    )


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to same-
    bucket candidates. Recall vs cosine_topk is measured in tests
    (probabilistic operator — rows-only driver check)."""
    qs = lsh_bucket_signatures(queries, dim, n_planes, seed, id_col, vec_col)
    cs = lsh_bucket_signatures(corpus, dim, n_planes, seed, id_col, vec_col)
    q = qs.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("bucket"),
    )
    c = cs.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("bucket").alias("bucket_c"),
    )
    pairs = F.broadcast(q).join(
        c, (F.col("bucket") == F.col("bucket_c")) & (F.col("q_id") != F.col("c_id"))
    )
    scored = pairs.select(
        "q_id",
        "c_id",
        (_dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec"))).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("cosine", 4).alias("cosine"), "rn")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus against
    a small centroid codebook (here: the first n_centroids corpus
    vectors — a deterministic stand-in for trained k-means centroids),
    then search only the n_probe closest cells per query.

    The cell assignment is an equi-joinable integer, so the search is
    a (query-cell x corpus-cell) equi-join — corpus shuffles once on
    cell id, queries broadcast; candidate count ~ corpus x n_probe /
    n_centroids. Swapping the codebook for real k-means centroids
    (pyspark.ml KMeans on a sample) changes recall, not the plan."""
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
    )
    b_cents = F.broadcast(cents)

    def assign(df: DataFrame, id_out: str, vec_out: str, n: int) -> DataFrame:
        """Attach the n nearest centroid ids."""
        scored = df.crossJoin(b_cents).select(
            F.col(id_col).alias(id_out),
            F.col(vec_col).alias(vec_out),
            "cent_id",
            (_dot(vec_col, "cent_vec")
             / (_norm(vec_col) * _norm("cent_vec"))).alias("cent_cos"),
        )
        w = Window.partitionBy(id_out).orderBy(
            F.col("cent_cos").desc(), F.col("cent_id")
        )
        return (
            scored.withColumn("crn", F.row_number().over(w))
            .where(F.col("crn") <= n)
            .select(id_out, vec_out, "cent_id")
        )

    c_assigned = assign(corpus, "c_id", "c_vec", 1)
    q_assigned = assign(queries, "q_id", "q_vec", n_probe)
    pairs = F.broadcast(q_assigned).join(c_assigned, "cent_id").where(
        F.col("q_id") != F.col("c_id")
    )
    scored = pairs.select(
        "q_id",
        "c_id",
        (_dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec"))).alias(
            "cosine"
        ),
    ).dropDuplicates(["q_id", "c_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "c_id", F.round("cosine", 4).alias("cosine"), "rn")
    )


def cosine_near_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine >= threshold. Exact all-pairs form (oracle contract);
    bucket with lsh_bucket_signatures first at scale. Norms are
    computed once per vector BEFORE the pair join (the naive per-pair
    form tripled the fold work)."""
    a = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        _norm(F.col(vec_col), dim).alias("norm_a"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        _norm(F.col(vec_col), dim).alias("norm_b"),
    )
    # lineage barrier: without it Catalyst collapses the norm
    # projection into the post-join projection and recomputes both
    # norms for every PAIR (measured 1.5x slower)
    a = a.localCheckpoint(eager=False)
    b = b.localCheckpoint(eager=False)
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            (_dot("vec_a", "vec_b", dim) / (F.col("norm_a") * F.col("norm_b"))).alias(
                "cos_raw"
            ),
        )
        .where(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cosine"))
    )


def cosine_near_pairs_bulk(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bulk exact near-pairs via Arrow + numpy blocked matmul — the
    throughput path for corpora that fit a broadcast (up to ~10^6
    vectors x 64 dims = 256 MB). Each partition multiplies its block
    against the full normalized matrix with BLAS; emitted pairs are
    (a < b, cosine >= threshold). numpy's blocked accumulation differs
    from the sequential fold in final-ulp — use cosine_near_pairs when
    bit-parity with an oracle matters, this one for production scale.

    Beyond broadcast size, compose lsh_bucket_signatures /
    minhash-style banding upstream to shrink the candidate space
    first."""
    import numpy as np
    import pandas as pd

    rows = vectors.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    normed = mat / norms[:, None]
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast((ids, normed))

    def block(batches):
        b_ids, b_normed = bc.value
        for pdf in batches:
            idx = pdf["__idx"].to_numpy()
            sims = b_normed[idx] @ b_normed.T  # (block, corpus)
            out_a, out_b, out_c = [], [], []
            for row_pos, i in enumerate(idx):
                mask = (sims[row_pos] >= threshold) & (b_ids > b_ids[i])
                for j in np.nonzero(mask)[0]:
                    out_a.append(b_ids[i])
                    out_b.append(b_ids[j])
                    out_c.append(round(float(sims[row_pos, j]), 4))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    index_df = spark.range(len(rows)).selectExpr("CAST(id AS INT) AS __idx")
    return index_df.mapInPandas(block, "id_a long, id_b long, cosine double")
