"""Round-8 operator invariants: CCNet paragraph dedup, prototype
pruning, SQ8 quantized search, incremental MinHash dedup. Exact
end-to-end parity for all four runs in test_oracle_parity (sf0.001)
and tools/drivercheck.py (sf0.01); these pin the semantic invariants
the oracles alone would not explain."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fhir2sql_spark import registry
from fhir2sql_spark.operators import dedup
from fhir2sql_spark.tables import load

registry.load_all()


def test_paragraph_dedup_keeps_exactly_one_copy_per_chunk(spark, sf_dir):
    out = registry.QUERIES["q_dedup_paragraph"](spark, sf_dir)
    agg = out.agg(
        F.sum(F.col("n_chunks") - F.col("n_dropped")).alias("kept"),
        F.sum("n_chunks").alias("total"),
    ).collect()[0]
    docs = load(spark, sf_dir, "documents").withColumn(
        "ts", F.split("text", " ")
    )
    distinct_chunks = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, cast(floor((size(ts)-1)/8) as int)),"
                    " i -> concat_ws(' ', slice(ts, i*8+1, 8)))"
                )
            ).alias("chunk")
        )
        .select(F.countDistinct("chunk"))
        .collect()[0][0]
    )
    # first-occurrence keeper: exactly one survivor per distinct chunk
    assert agg["kept"] == distinct_chunks
    assert agg["total"] >= distinct_chunks
    for r in out.collect():
        assert abs(
            r["kept_frac"] - (r["n_chunks"] - r["n_dropped"]) / r["n_chunks"]
        ) < 1e-6


def test_prune_prototypes_keeps_hardest_70pct_per_cell(spark, sf_dir):
    rows = registry.QUERIES["q_prune_prototypes"](spark, sf_dir).collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        n = len(rs)
        assert all(r["n_cell"] == n for r in rs)
        kept = [r for r in rs if r["keep"]]
        assert len(kept) == (7 * n) // 10  # hardest floor(0.7 n)
        # kept = the LARGEST distances (hard examples), ranks 1..kept
        max_kept_rank = max((r["rnk"] for r in kept), default=0)
        assert max_kept_rank == len(kept)
        ordered = sorted(rs, key=lambda r: r["rnk"])
        d2s = [r["d2"] for r in ordered]
        assert d2s == sorted(d2s, reverse=True)


def test_embed_sq_topk_recall_vs_float_l2(spark, sf_dir):
    out = registry.QUERIES["q_embed_sq"](spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["q_id"], []).append((r["rn"], r["c_id"]))
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)
    X = np.stack([emb[i] for i in ids])
    hits = total = 0
    for q in sorted(got):
        assert sorted(rn for rn, _ in got[q]) == [1, 2, 3, 4, 5]
        d = ((X - emb[q]) ** 2).sum(axis=1)
        order = [
            ids[j]
            for j in np.lexsort((ids, d))
            if ids[j] != q
        ][:5]
        sq_ids = {c for _, c in got[q]}
        hits += len(sq_ids & set(order))
        total += 5
    # 8-bit quantization at dim 64 barely perturbs the ranking
    assert hits / total >= 0.8


def test_minhash_inc_statuses_are_sound(spark, sf_dir):
    out = {
        r["doc_id"]: r["status"]
        for r in registry.QUERIES["q_dedup_minhash_inc"](
            spark, sf_dir
        ).collect()
    }
    docs = load(spark, sf_dir, "documents")
    new_ids = {
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .collect()
    }
    assert set(out) == new_ids  # every batch doc classified exactly once
    # ground truth: ALL exact-Jaccard >= 4/5 pairs, language-agnostic
    # (the query dedups across langs, unlike jaccard_pairs' per-lang
    # contract), brute-forced in the driver at this fixture size
    sets: dict[int, set] = {}
    for r in dedup.shingles(docs, n=3, distinct=True).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    pairs = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            c = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and c * 5 >= u * 4:
                pairs.append((a, b))
    truth_corpus, truth_batch = set(), set()
    for a, b in pairs:
        for x, y in ((a, b), (b, a)):
            if x in new_ids and y not in new_ids:
                truth_corpus.add(x)
            if x in new_ids and y in new_ids and y < x:
                truth_batch.add(x)
    # soundness: verification makes LSH candidates exact, so every
    # claimed dup is a true dup of the claimed kind
    for d, s in out.items():
        if s == "dup_corpus":
            assert d in truth_corpus
        elif s == "dup_batch":
            assert d in truth_batch and d not in truth_corpus
        else:
            assert d not in truth_corpus


def test_minhash_inc_fast_statuses_equal_md5_twin(spark):
    """The xxhash64 scale path must classify the fixture identically
    to the exact-oracled md5 twin — different hash families can in
    principle band-collide differently, but exact verification makes
    false positives impossible and the fixture's near-dup pairs are
    high-Jaccard enough that both families catch them all (the
    q_dedup_minhash recall=1.0 argument, applied to statuses)."""
    from tests.conftest import SF_MED

    slow = {
        r["doc_id"]: r["status"]
        for r in registry.QUERIES["q_dedup_minhash_inc"](
            spark, SF_MED
        ).collect()
    }
    fast = {
        r["doc_id"]: r["status"]
        for r in registry.QUERIES["q_dedup_minhash_inc_fast"](
            spark, SF_MED
        ).collect()
    }
    assert fast == slow
