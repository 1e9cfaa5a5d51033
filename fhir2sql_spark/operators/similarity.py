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
