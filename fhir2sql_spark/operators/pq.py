"""Product quantization (PQ) — the memory-bounded ANN scale path.

PQ (Jégou, Douze & Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) splits each d-dim vector into ``m``
subvectors and quantizes each against its own small codebook, so a
float vector compresses to ``m`` small integer codes. Search uses
Asymmetric Distance Computation (ADC): the query stays un-quantized,
a per-query lookup table holds its squared L2 distance to every
codeword, and a candidate's approximate distance is just ``m`` table
lookups summed — no vector math per candidate at all. This is the
representation that makes billion-vector ANN fit in RAM (FAISS's
IVF-PQ core), complementing the recall-oriented paths in
operators/similarity.py (hyperplane LSH, IVF flat).

Spark-first shape (all stages verified in tools/explain_audit.py):

  - the codebook is config-sized (m x n_codes x d/m doubles) and
    BROADCAST — by default the deterministic first-``n_codes`` corpus
    vectors (oracle-stable, the q_embed_ivf convention; real
    deployments train per-subspace k-means the same way
    similarity.kmeans_codebook trains the IVF coarse codebook);
  - encode + ADC scoring FUSE into one Arrow ``mapInPandas`` pass
    over the corpus: each batch encodes against the broadcast
    codebook (vectorized float64 BLAS argmin) and immediately scores
    every query from its LUT, emitting only the per-(query, batch)
    top-k — the corpus never shuffles, and the single exchange
    carries <= k x n_queries x n_batches rows into the final exact
    re-rank window;
  - the query side is collected to build the LUT (tiny by contract —
    same bounded-collect pattern as operators/kmv.py:78 and the IVF
    codebook collect, flagged in explain_audit's
    BUILDER_ACTION_QUERIES).

The reference (samply/fhir2sql, src/main.rs — a sync daemon) has no
vector surface; this extends SURVEY.md §2.4's similarity-search
inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_search(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: for each query vector, the ``k`` corpus vectors with
    the smallest PQ-approximated squared L2 distance (ties -> lowest
    candidate id; the query itself is excluded). Returns
    ``(q_id, c_id, adist double, rn int)``.

    All distance arithmetic is float64 with the explicit
    ``|x|^2 - 2<x,c> + |c|^2`` expansion, the same formula the SQL
    oracle computes from ``list_dot_product`` terms — the only
    engine freedom is dot-product accumulation order (~1e-13
    relative), absorbed by the caller's 4-dp rounding. ``np.argmin``
    takes the FIRST minimum, i.e. the lowest codeword id, matching
    the oracle's ``ORDER BY d2, cent_id`` tie rule."""
    import numpy as np
    import pandas as pd

    cb_rows = (
        corpus.orderBy(id_col)
        .limit(n_codes)
        .select(vec_col)
        .collect()
    )
    q_rows = queries.select(id_col, vec_col).collect()
    spark = corpus.sparkSession
    out_schema = "q_id long, c_id long, adist double"
    if not cb_rows or not q_rows:
        empty = spark.createDataFrame([], out_schema + ", rn int")
        return empty
    cb = np.array([r[vec_col] for r in cb_rows], dtype=np.float64)
    dim = cb.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # (m, n_codes, sub) codebook + per-subspace squared norms
    books = np.stack([cb[:, s * sub : (s + 1) * sub] for s in range(m)])
    book_n2 = (books**2).sum(axis=2)  # (m, n_codes)

    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qm = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    # LUT[qi, s, j] = |q_s|^2 - 2<q_s, c_sj> + |c_sj|^2
    lut = np.stack(
        [
            (qm[:, s * sub : (s + 1) * sub] ** 2).sum(axis=1)[:, None]
            - 2.0 * (qm[:, s * sub : (s + 1) * sub] @ books[s].T)
            + book_n2[s][None, :]
            for s in range(m)
        ],
        axis=1,
    )  # (n_q, m, n_codes)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                xs = X[:, s * sub : (s + 1) * sub]
                d2 = (
                    (xs**2).sum(axis=1)[:, None]
                    - 2.0 * (xs @ books[s].T)
                    + book_n2[s][None, :]
                )
                codes[:, s] = d2.argmin(axis=1)
            # ADC: adist[i, qi] = sum_s LUT[qi, s, codes[i, s]]
            adist = np.zeros((len(ids), len(q_ids)))
            for s in range(m):
                adist += lut[:, s, codes[:, s]].T  # (n, n_q)
            for qi, qid in enumerate(q_ids):
                col = adist[:, qi]
                mask = ids != qid
                cand_ids, cand_d = ids[mask], col[mask]
                if not len(cand_ids):
                    continue
                top = np.lexsort((cand_ids, cand_d))[:k]
                yield pd.DataFrame(
                    {
                        "q_id": np.full(len(top), qid, dtype=np.int64),
                        "c_id": cand_ids[top],
                        "adist": cand_d[top],
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(gen, out_schema)
    w = Window.partitionBy("q_id").orderBy("adist", "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "c_id", "adist", "rn")
    )
