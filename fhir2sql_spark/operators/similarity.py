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


def _dot(a: str | F.Column, b: str | F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str | F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded), ties broken by candidate id ascending."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = F.broadcast(q).crossJoin(c).where(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id",
        "c_id",
        (
            _dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec"))
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
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine >= threshold. Exact all-pairs form (oracle contract);
    bucket with lsh_bucket_signatures first at scale."""
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            (_dot("vec_a", "vec_b") / (_norm("vec_a") * _norm("vec_b"))).alias(
                "cos_raw"
            ),
        )
        .where(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cosine"))
    )
