"""Integer-lattice k-means: an engine-portable TRAINED codebook.

Round-6 graduation of the trained-codebook triple (q_embed_ivf_trained,
q_embed_pq_trained, q_dedup_semantic_trained) from rows-only to exact
DuckDB hash oracles. The float spherical/L2 trainers
(operators/similarity.py kmeans_codebook, operators/pq.py
pq_train_codebooks) remain the 100 TB scale path — their BLAS
accumulation order is engine-specific, so their codebooks can never be
replayed bit-exactly in SQL. This module trains on an INTEGER LATTICE
instead, which makes every step of Lloyd's algorithm exactly
computable by both engines:

- quantize: ``q_d = CAST(ROUND(e_d * scale) AS BIGINT)`` — float32 ->
  float64 promotion, one IEEE multiply and one half-away-from-zero
  round, identical in Spark and DuckDB;
- init: the ``k`` vectors with the smallest
  ``(md5(CAST(id AS VARCHAR)), id)`` — the md5-seeded portable-twin
  construction (q_dedup_minhash_portable, queries/llm.py) applied to
  centroid seeding: a deterministic pseudo-random draw both engines
  compute from the same hex strings;
- assign: squared L2 on int64 — every product and partial sum is an
  exact integer (bounded: dim * (scale*max|e|)^2 << 2^53, guarded at
  runtime), so even float64 BLAS matmul reproduces it bit-exactly in
  ANY accumulation order (all partial sums are integers below 2^53);
  ties break to the lowest centroid id on both engines;
- update: ``ROUND(SUM(q_d) / COUNT(*))`` per (cell, dim) — integer sum
  (exact), one IEEE double division, one half-away-from-zero round;
  empty cells keep their previous centroid.

Because each step is exact, R unrolled Lloyd rounds are replayable as
MATERIALIZED CTEs (the q_graph_pagerank unroll technique,
queries/training.py) and the full train -> search pipeline gets a
strict value-hash oracle. Quantization costs accuracy (~1e-3 relative
with scale=1000 on unit-range embeddings), which is irrelevant to the
coarse partitioning role a codebook plays — and the search distances
returned are EXACT integers, so no rounding tolerance is needed
anywhere downstream.

Scale shape (same as the float trainers): per round the codebook
(k rows) broadcasts, one mapInPandas corpus pass emits per-cell
integer PARTIAL sums (k x dim per Arrow batch — the only shuffle is
input-size-independent), means reassemble JVM-side. The corpus never
shuffles; assignment/search passes are fused Arrow/numpy like
operators/pq.py.

Reference: samply/fhir2sql (src/main.rs) has no vector surface; this
extends SURVEY.md §2.4's similarity-search family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# With scale=1000 and |e| <= ~0.6 (the fixture's unit-ish range),
# |q| <= ~600; products <= 3.6e5, 64-dim sums <= 2.4e7 — exact in
# int64 AND in float64 regardless of accumulation order. The guard
# below enforces the general bound.
_MAX_ABS_Q = 3_000_000  # dim * q^2 < 2^53 for dim <= 1024


def quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(vid, qv array<long>): the engine-portable integer lattice
    embedding. One interpreted HOF pass over the corpus (quantization
    happens once; every downstream pass is Arrow/numpy)."""
    return df.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * scale, 0).cast("long"),
        ).alias("qv"),
    )


def _seed_codebook(qv: DataFrame, k: int) -> list:
    """First ``k`` (md5(vid), vid)-ordered quantized vectors as
    [(cent_id, np.array)] — the bounded (k-row) driver materialization
    every trainer round shares (same budget as kmeans_codebook's
    k-row collect)."""
    import numpy as np

    rows = (
        qv.orderBy(F.md5(F.col("vid").cast("string")), "vid")
        .limit(k)
        .select("qv")
        .collect()
    )
    if not rows:
        raise ValueError("lattice trainer: no vectors to train on")
    return [(i, np.array(r["qv"], dtype=np.int64)) for i, r in enumerate(rows)]


def _check_domain(x) -> None:
    import numpy as np

    if len(x) and np.abs(x).max() > _MAX_ABS_Q:
        raise ValueError(
            "lattice: |quantized value| exceeds the exact-arithmetic "
            f"domain ({_MAX_ABS_Q}); lower the scale"
        )


def _d2_int(X, C):
    """Exact squared L2 between int64 rows of X and C, as int64.
    float64 BLAS is used for speed — every product and every partial
    sum is an integer below 2^53 (guarded), so the result is exact in
    any accumulation order."""
    import numpy as np

    Xf = X.astype(np.float64)
    Cf = C.astype(np.float64)
    d2 = (
        (Xf * Xf).sum(axis=1)[:, None]
        - 2.0 * (Xf @ Cf.T)
        + (Cf * Cf).sum(axis=1)[None, :]
    )
    return d2.astype(np.int64)


def lattice_kmeans(
    qv: DataFrame, k: int = 16, iters: int = 2
) -> DataFrame:
    """Deterministic PORTABLE Lloyd's k-means over the integer lattice.
    ``qv`` is quantize()'s output. Returns (cent_id int, cv
    array<long>). Exactly replayable as ``iters`` unrolled SQL rounds
    (see queries/llm.py _lattice_sql)."""
    import numpy as np
    import pandas as pd

    spark = qv.sparkSession
    sc = spark.sparkContext
    cents = _seed_codebook(qv, k)
    base = qv.localCheckpoint(eager=False)

    for _ in range(iters):
        cids = np.array([c for c, _ in cents], dtype=np.int64)
        code = np.stack([v for _, v in cents])
        bc = sc.broadcast((cids, code))

        # per-batch integer partial sums: the shuffle carries
        # k x batches x dim longs — input-size-independent, the same
        # partial-aggregate shape the float trainer plans
        def stats_batches(it, _bc=bc):
            b_cids, b_code = _bc.value
            k_now, dim_now = b_code.shape
            for pdf in it:
                if not len(pdf):
                    continue
                x = np.array(pdf["qv"].tolist(), dtype=np.int64)
                _check_domain(x)
                idx = np.argmin(_d2_int(x, b_code), axis=1)
                sums = np.zeros((k_now, dim_now), dtype=np.int64)
                np.add.at(sums, idx, x)
                counts = np.bincount(idx, minlength=k_now)
                nz = np.nonzero(counts)[0]
                yield pd.DataFrame(
                    {
                        "cell": b_cids[nz].astype("int32"),
                        "cnt": counts[nz].astype("int64"),
                        "vsum": [list(s) for s in sums[nz]],
                    }
                )

        stats = base.select("qv").mapInPandas(
            stats_batches, "cell int, cnt long, vsum array<long>"
        )
        comp = stats.select("cell", "cnt", F.posexplode("vsum").alias("pos", "val"))
        # ROUND(SUM/COUNT): integer sums are order-free, the division
        # is one IEEE op, the round is half-away-from-zero on both
        # engines — the new centroid is deterministic and portable
        means = (
            comp.groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.sum("cnt").alias("c"))
            .select(
                "cell",
                "pos",
                F.round(F.col("s").cast("double") / F.col("c"), 0)
                .cast("long")
                .alias("m"),
            )
        )
        new_rows = {
            r["cell"]: r["cv"]
            for r in means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.expr("transform(pm, x -> x.m)").alias("cv"))
            .collect()
        }
        cents = [
            (cid, np.array(new_rows[cid], dtype=np.int64))
            if cid in new_rows
            else (cid, vec)  # empty cell keeps its centroid
            for cid, vec in cents
        ]
        bc.unpersist(False)

    return spark.createDataFrame(
        [(int(c), [int(x) for x in v]) for c, v in cents],
        "cent_id int, cv array<long>",
    )


def lattice_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    cents: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search over the lattice: assign the corpus to its nearest
    trained centroid (exact int L2, ties -> lowest cent_id), probe the
    ``n_probe`` nearest cells per query, exact-rank candidates inside.
    ``queries``/``corpus`` are quantize() outputs; ``cents`` is
    lattice_kmeans' codebook. Returns (q_id, c_id, adist long, rn) —
    adist is the EXACT integer squared L2, so the oracle needs no
    rounding. Same plan as operators/similarity.py ivf_topk: map-side
    assignment vs the broadcast codebook, the tiny query side
    broadcasts into the cell equi-join — the corpus never shuffles."""
    import numpy as np
    import pandas as pd

    cent_rows = cents.orderBy("cent_id").collect()
    code = np.stack(
        [np.array(r["cv"], dtype=np.int64) for r in cent_rows]
    )
    cids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    q_rows = queries.select("vid", "qv").collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, c_id long, adist long, rn int"
        )
    q_ids = np.array([r["vid"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["qv"] for r in q_rows], dtype=np.int64)
    _check_domain(qm)
    qd = _d2_int(qm, code)
    # n_probe nearest cells per query (ties -> lowest cent_id via
    # stable lexsort, matching the oracle's ORDER BY d2, cent_id)
    probe_rows = []
    for qi in range(len(q_ids)):
        order = np.lexsort((cids, qd[qi]))[:n_probe]
        for c in order:
            probe_rows.append((int(q_ids[qi]), int(cids[c])))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "q_id long, cell int")

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(pdf["qv"].tolist(), dtype=np.int64)
            _check_domain(x)
            idx = np.argmin(_d2_int(x, code), axis=1)
            yield pd.DataFrame(
                {
                    "c_id": pdf["vid"].to_numpy(dtype=np.int64),
                    "cell": cids[idx].astype("int32"),
                    "cqv": pdf["qv"],
                }
            )

    assigned = corpus.mapInPandas(
        assign, "c_id long, cell int, cqv array<long>"
    )
    qdf = spark.createDataFrame(
        [
            (int(q_ids[i]), [int(v) for v in qm[i]])
            for i in range(len(q_ids))
        ],
        "q_id long, qqv array<long>",
    )
    cand = assigned.join(F.broadcast(probes), "cell").where(
        F.col("c_id") != F.col("q_id")
    ).join(F.broadcast(qdf), "q_id")
    # exact integer L2 via the zip_with fold (bigint arithmetic
    # JVM-side; candidates are |corpus| * n_probe / n_cells rows)
    adist = F.aggregate(
        F.zip_with("qqv", "cqv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y,
    )
    scored = cand.select("q_id", "c_id", adist.alias("adist")).dropDuplicates(
        ["q_id", "c_id"]
    )
    w = Window.partitionBy("q_id").orderBy("adist", "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "c_id", "adist", "rn")
    )


def lattice_pq_train(
    qv: DataFrame, m: int = 4, n_codes: int = 16, iters: int = 2
) -> DataFrame:
    """Per-subspace portable Lloyd: the PQ analogue of lattice_kmeans.
    All ``m`` subspaces train in the SAME per-round corpus pass
    (partial sums keyed (s, code)); the seed codebook is the one
    md5-ordered first-``n_codes`` draw sliced per subspace, so the SQL
    replay shares lattice_kmeans' seed CTE. Returns
    (s int, code_id int, w array<long>)."""
    import numpy as np
    import pandas as pd

    spark = qv.sparkSession
    sc = spark.sparkContext
    seed = _seed_codebook(qv, n_codes)
    dim = len(seed[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # books[s][c] = codeword c of subspace s
    books = [
        np.stack([v[s * sub : (s + 1) * sub] for _, v in seed])
        for s in range(m)
    ]
    base = qv.localCheckpoint(eager=False)

    for _ in range(iters):
        bc = sc.broadcast(np.stack(books))  # (m, n_codes, sub)

        def stats_batches(it, _bc=bc):
            bks = _bc.value
            m_now, k_now, sub_now = bks.shape
            for pdf in it:
                if not len(pdf):
                    continue
                x = np.array(pdf["qv"].tolist(), dtype=np.int64)
                _check_domain(x)
                out_s, out_c, out_cnt, out_sum = [], [], [], []
                for s in range(m_now):
                    xs = x[:, s * sub_now : (s + 1) * sub_now]
                    idx = np.argmin(_d2_int(xs, bks[s]), axis=1)
                    sums = np.zeros((k_now, sub_now), dtype=np.int64)
                    np.add.at(sums, idx, xs)
                    counts = np.bincount(idx, minlength=k_now)
                    nz = np.nonzero(counts)[0]
                    out_s.extend([s] * len(nz))
                    out_c.extend(nz.tolist())
                    out_cnt.extend(counts[nz].tolist())
                    out_sum.extend([list(v) for v in sums[nz]])
                yield pd.DataFrame(
                    {
                        "s": pd.Series(out_s, dtype="int32"),
                        "code": pd.Series(out_c, dtype="int32"),
                        "cnt": pd.Series(out_cnt, dtype="int64"),
                        "vsum": out_sum,
                    }
                )

        stats = base.select("qv").mapInPandas(
            stats_batches, "s int, code int, cnt long, vsum array<long>"
        )
        comp = stats.select(
            "s", "code", "cnt", F.posexplode("vsum").alias("pos", "val")
        )
        means = (
            comp.groupBy("s", "code", "pos")
            .agg(F.sum("val").alias("sv"), F.sum("cnt").alias("c"))
            .select(
                "s",
                "code",
                "pos",
                F.round(F.col("sv").cast("double") / F.col("c"), 0)
                .cast("long")
                .alias("m"),
            )
        )
        new_rows = {
            (r["s"], r["code"]): r["w"]
            for r in means.groupBy("s", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("s", "code", F.expr("transform(pm, x -> x.m)").alias("w"))
            .collect()
        }
        books = [
            np.stack(
                [
                    np.array(new_rows[(s, c)], dtype=np.int64)
                    if (s, c) in new_rows
                    else books[s][c]
                    for c in range(n_codes)
                ]
            )
            for s in range(m)
        ]
        bc.unpersist(False)

    return spark.createDataFrame(
        [
            (s, c, [int(x) for x in books[s][c]])
            for s in range(m)
            for c in range(n_codes)
        ],
        "s int, code_id int, w array<long>",
    )


def lattice_pq_search(
    queries: DataFrame,
    corpus: DataFrame,
    books: DataFrame,
    k: int = 5,
    m: int = 4,
) -> DataFrame:
    """ADC over trained lattice codebooks — operators/pq.py pq_search's
    fused encode+score mapInPandas shape with EXACT integer distances:
    encode each corpus vector per subspace (argmin, ties -> lowest
    code), score queries via the integer LUT, emit per-batch top-k.
    Returns (q_id, c_id, adist long, rn)."""
    import numpy as np
    import pandas as pd

    cb_rows = books.orderBy("s", "code_id").collect()
    n_codes = max(r["code_id"] for r in cb_rows) + 1
    if len(cb_rows) != m * n_codes:
        raise ValueError(
            f"lattice_pq_search: {len(cb_rows)} codebook rows, expected "
            f"{m}*{n_codes}"
        )
    sub = len(cb_rows[0]["w"])
    bks = np.array(
        [r["w"] for r in cb_rows], dtype=np.int64
    ).reshape(m, n_codes, sub)
    dim = m * sub

    q_rows = queries.select("vid", "qv").collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, c_id long, adist long, rn int"
        )
    q_ids = np.array([r["vid"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["qv"] for r in q_rows], dtype=np.int64)
    if qm.shape[1] != dim:
        raise ValueError(
            f"lattice_pq_search: query dim {qm.shape[1]} != codebook dim {dim}"
        )
    _check_domain(qm)
    # integer LUT[qi, s, j]
    lut = np.stack(
        [_d2_int(qm[:, s * sub : (s + 1) * sub], bks[s]) for s in range(m)],
        axis=1,
    )

    def gen(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf["vid"].to_numpy(dtype=np.int64)
            X = np.array(pdf["qv"].tolist(), dtype=np.int64)
            if X.shape[1] != dim:
                raise ValueError(
                    f"lattice_pq_search: corpus dim {X.shape[1]} != {dim}"
                )
            _check_domain(X)
            codes = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                codes[:, s] = np.argmin(
                    _d2_int(X[:, s * sub : (s + 1) * sub], bks[s]), axis=1
                )
            adist = np.zeros((len(ids), len(q_ids)), dtype=np.int64)
            for s in range(m):
                adist += lut[:, s, codes[:, s]].T
            for qi, qid in enumerate(q_ids):
                mask = ids != qid
                cand_ids, cand_d = ids[mask], adist[mask, qi]
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

    scored = corpus.select("vid", "qv").mapInPandas(
        gen, "q_id long, c_id long, adist long"
    )
    w = Window.partitionBy("q_id").orderBy("adist", "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "c_id", "adist", "rn")
    )


def lattice_semantic_dedup(
    corpus: DataFrame,
    cents: DataFrame,
    tau_num: int = 2,
    tau_den: int = 5,
) -> DataFrame:
    """SemDeDup over the lattice with an EXACT rational-cosine
    predicate: vector b (within a's trained cell) marks a... rather,
    every vector with a same-cell smaller-id neighbour at
    cos >= tau_num/tau_den is a duplicate. The cosine test is done in
    integer arithmetic — ``dot > 0 AND den^2*dot^2 >= num^2*|a|^2*|b|^2``
    (zero-norm vectors never match: cosine undefined) — so both
    engines agree bit-exactly with NO float threshold margin argument.
    Returns (vec_id, cell int, is_dup boolean) for every corpus row.
    Same plan as operators/similarity.py semantic_dedup: map-side
    assignment, quadratic stage confined to cells via
    groupBy(cell).applyInPandas."""
    import numpy as np
    import pandas as pd

    cent_rows = cents.orderBy("cent_id").collect()
    code = np.stack([np.array(r["cv"], dtype=np.int64) for r in cent_rows])
    cids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(pdf["qv"].tolist(), dtype=np.int64)
            _check_domain(x)
            idx = np.argmin(_d2_int(x, code), axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vid"].to_numpy(dtype=np.int64),
                    "cell": cids[idx].astype("int32"),
                    "qv": pdf["qv"],
                }
            )

    assigned = corpus.mapInPandas(assign, "vec_id long, cell int, qv array<long>")
    num2 = int(tau_num) ** 2
    den2 = int(tau_den) ** 2

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        x = np.array(pdf["qv"].tolist(), dtype=np.int64)
        order = np.argsort(ids)
        ids, x = ids[order], x[order]
        xf = x.astype(np.float64)
        dot = (xf @ xf.T).astype(np.int64)  # exact: integer-valued,
        n2 = np.diag(dot).copy()  # all partial sums < 2^53
        # b is a dup if any a<b (by id) in the cell passes the test
        # (den^2 dot^2 and num^2 na nb stay well inside int64:
        # dot <= dim*(scale*|e|)^2 ~ 2.4e7 -> den2*dot^2 ~ 1.4e16)
        pos = dot > 0
        sim = pos & (
            den2 * dot.astype(np.int64) ** 2
            >= num2 * n2[:, None] * n2[None, :]
        )
        sim &= (n2[:, None] > 0) & (n2[None, :] > 0)
        lower = np.tril(np.ones_like(sim, dtype=bool), k=-1)
        is_dup = (sim & lower).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"].iloc[0],
                "is_dup": is_dup,
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        per_cell, "vec_id long, cell int, is_dup boolean"
    )
