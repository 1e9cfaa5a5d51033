"""Property tests for the round-3 additions beyond the oracle
differential (which tests/test_oracle_parity.py already runs for each
of them): CMS guarantees, decayed-sum merge-order determinism, A-ES
weighted-sample replication, and LM-score invariants."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fhir2sql_spark.operators.text import cms_estimate, cms_sketch
from fhir2sql_spark.registry import QUERIES, load_all
from fhir2sql_spark.tables import load

load_all()


def test_cms_never_underestimates_and_bounded(spark, sf_dir):
    """CMS guarantee: est >= exact for EVERY token (deterministic),
    and the total overestimate is bounded by collisions — with
    depth=4 the chance any token exceeds exact + 8*N/width is
    negligible even adversarially (Markov + independence across
    rows); on this fixture it is a hard assertion."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    n_total = toks.count()
    width = 1024
    sketch = cms_sketch(toks, width=width)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact.select("token"), width=width)
    joined = exact.join(est, "token").collect()
    assert len(joined) > 0
    bound = 8 * n_total / width
    for r in joined:
        assert r.est >= r.n, f"CMS underestimated {r.token}"
        assert r.est - r.n <= bound, f"CMS error blown for {r.token}"


def test_cms_sketch_size_is_constant(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    assert cms_sketch(toks, depth=4, width=64).count() <= 4 * 64


def test_agg_decay_partitioning_invariant(spark, sf_dir):
    """The dyadic-decimal weighted sum must be bit-identical under any
    partitioning (the reason the weights are DECIMAL, not pow(2.0,-k))."""
    rows = QUERIES["q_agg_decay"](spark, sf_dir).collect()
    base = {r.event_type: (r.n_recent, r.decayed_sum) for r in rows}

    # rebuild the same aggregate over a repartitioned input; the double
    # must be BIT-identical (exact decimal sum -> one IEEE divide)
    from fhir2sql_spark.queries.util import dec, exact_div
    from fhir2sql_spark.queries.streaming_batch import _DECAY_CASE

    e = load(spark, sf_dir, "events").repartition(13)
    age = F.datediff(F.lit("2024-01-31").cast("date"), F.col("ts").cast("date"))
    got = (
        e.select("event_type", age.alias("age"), dec("value", 2).alias("v"))
        .where(F.col("age").between(1, 12))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            (F.sum(F.col("v") * F.expr(_DECAY_CASE)) * 409600)
            .cast("long")
            .alias("scaled"),
        )
        .select(
            "event_type",
            "n_recent",
            exact_div(F.col("scaled"), F.lit(409600)).alias("decayed_sum"),
        )
        .collect()
    )
    assert {r.event_type: (r.n_recent, r.decayed_sum) for r in got} == base


def test_sample_weighted_replicates_in_pure_python(spark, sf_dir):
    """The A-ES sample is fully deterministic: an independent pure-
    Python replay (hashlib + math.pow) selects the identical 200 ids."""
    got = sorted(
        r.doc_id for r in QUERIES["q_sample_weighted"](spark, sf_dir).collect()
    )
    docs = [
        (r.doc_id, r.n_chars)
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    ]
    keyed = []
    for doc_id, n_chars in docs:
        h = hashlib.sha256(f"wsamp|{doc_id}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 1) / 4294967296.0
        keyed.append((u ** (1.0 / n_chars), -doc_id, doc_id))
    keyed.sort(reverse=True)
    want = sorted(doc_id for _, _, doc_id in keyed[:200])
    assert got == want


def test_lm_score_invariants(spark, sf_dir):
    """avg_bits is a (quantized) log-probability: strictly <= 0, with
    one output row per document holding >= 2 tokens, and n_bigrams =
    n_tokens - 1."""
    out = {r.doc_id: r for r in QUERIES["q_text_lm_score"](spark, sf_dir).collect()}
    d = load(spark, sf_dir, "documents")
    ntok = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    expect_docs = {k for k, n in ntok.items() if n >= 2}
    assert set(out) == expect_docs
    for doc_id, r in out.items():
        assert r.n_bigrams == ntok[doc_id] - 1
        assert r.bits_sum <= 0
        assert r.avg_bits <= 0


def test_lm_score_ranks_repetitive_text_higher(spark, sf_dir):
    """A document made of one repeated bigram must outscore the
    corpus median: its bigrams are maximally predictable. Built by
    unioning a synthetic doc into the fixture corpus in-plan."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    probe = spark.createDataFrame(
        [(99_999_999, "en", " ".join(["alpha"] * 40))], "doc_id long, lang string, text string"
    )
    corpus = d.unionByName(probe)

    # same pipeline as q_text_lm_score, inlined over the union
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)).alias(
                "bg"
            ),
        ),
    )
    exploded = corpus.select("doc_id", "lang", F.explode(bigrams).alias("b")).select(
        "doc_id", "lang", F.col("b.w1").alias("w1"), F.col("b.bg").alias("bg")
    )
    c2 = exploded.groupBy("lang", "bg", "w1").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("lang", "w1").agg(F.sum("n2").alias("n1"))
    bits = (F.length(F.bin("n2")) - F.length(F.bin("n1"))).cast("long")
    model = c2.join(c1, ["lang", "w1"]).select("lang", "bg", bits.alias("bits"))
    scored = (
        exploded.join(model, ["lang", "bg"])
        .groupBy("doc_id")
        .agg((F.sum("bits") / F.count(F.lit(1))).alias("avg_bits"))
        .collect()
    )
    by_doc = {r.doc_id: r.avg_bits for r in scored}
    others = sorted(v for k, v in by_doc.items() if k != 99_999_999)
    median = others[len(others) // 2]
    assert by_doc[99_999_999] >= median


def test_kmv_exhaustive_sets_are_exact(spark):
    from fhir2sql_spark.operators.kmv import (
        kmv_intersection_estimate,
        kmv_sketch_single,
    )

    a = spark.range(0, 40).selectExpr("id AS key")          # 40 < k
    b = spark.range(20, 50).selectExpr("id AS key")
    sa, sb = kmv_sketch_single(a, "key"), kmv_sketch_single(b, "key")
    r = kmv_intersection_estimate(sa, sb).collect()[0]
    assert abs(r.intersection_est - 20) < 1e-9
    assert abs(r.jaccard_est - 20 / 50) < 1e-9


def test_kmv_estimate_within_bounds_on_large_sets(spark):
    from fhir2sql_spark.operators.kmv import (
        kmv_intersection_estimate,
        kmv_sketch_single,
    )

    a = spark.range(0, 3000).selectExpr("id AS key")
    b = spark.range(1500, 4500).selectExpr("id AS key")      # overlap 1500
    sa, sb = kmv_sketch_single(a, "key"), kmv_sketch_single(b, "key")
    r = kmv_intersection_estimate(sa, sb).collect()[0]
    assert abs(r.jaccard_est - 1500 / 4500) <= 0.15
    assert abs(r.intersection_est - 1500) <= 0.35 * 1500


def test_kmv_union_sketch_is_sketch_of_union(spark):
    """Mergeability: the k smallest of (sketch_a ∪ sketch_b) equal the
    k smallest of the full union — because the union's k smallest all
    sit inside their own set's k smallest."""
    from fhir2sql_spark.operators.kmv import kmv_sketch_single

    a = spark.range(0, 3000).selectExpr("id AS key")
    b = spark.range(1500, 4500).selectExpr("id AS key")
    k = 64
    sa, sb = kmv_sketch_single(a, "key", k), kmv_sketch_single(b, "key", k)
    merged = sorted(
        r.h for r in sa.union(sb).distinct().orderBy("h").limit(k).collect()
    )
    direct = sorted(
        r.h for r in kmv_sketch_single(a.union(b), "key", k).collect()
    )
    assert merged == direct


def test_m4_envelope_invariants(spark, sf_dir):
    out = QUERIES["q_downsample_m4"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
        assert r.n_points >= 1
    total = sum(r.n_points for r in out)
    assert total == load(spark, sf_dir, "events").count()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_equals_naive_python(spark):
    from fhir2sql_spark.operators.fuzzy import fuzzy_self_pairs

    names = [
        "red widget", "rod widget", "red widgets", "hot widget",
        "blue bolt", "blue bolts", "blue belts", "small gizmo",
        "small gizmos", "large gizmo", "steel gear", "steel bear",
    ]
    df = spark.createDataFrame([(x,) for x in names], "p_name string")
    got = sorted(
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_self_pairs(df, "p_name", max_dist=2).collect()
    )
    want = sorted(
        (min(a, b), max(a, b), _lev(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev(a, b) <= 2
    )
    assert got == want
    assert len(want) > 0


def test_fuzzy_join_plan_has_no_nested_loop(spark, sf_dir):
    from fhir2sql_spark.registry import QUERIES

    plan = (
        QUERIES["q_join_fuzzy"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def _naive_skyline(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (bx <= x and by >= y and (bx < x or by > y))
            for j, (bx, by) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_matches_naive_with_ties_and_duplicates(spark):
    from fhir2sql_spark.operators.skyline import skyline_2d

    # adversarial: equal-x groups, duplicate points, dominated chains,
    # and near-misses 1 apart (the RANGE -1 boundary)
    pts = [
        (10, 5), (10, 5), (10, 7), (11, 7), (9, 4), (9, 6), (12, 8),
        (12, 8), (13, 8), (8, 3), (8, 2), (11, 6), (10, 6), (9, 7),
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", n_parts=4).collect())
    assert got == _naive_skyline(pts)


def test_skyline_random_matches_naive(spark):
    import random

    from fhir2sql_spark.operators.skyline import skyline_2d

    rng = random.Random(42)
    pts = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(400)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", n_parts=8).collect())
    assert got == _naive_skyline(pts)


def test_spatial_join_random_matches_naive(spark):
    import random

    from fhir2sql_spark.operators.spatial import distance_self_join

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 120), rng.randint(0, 120)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(
        (r.id_a, r.id_b, r.dist_sq)
        for r in distance_self_join(df, "id", "x", "y", radius=6).collect()
    )
    want = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 36
    )
    assert got == want
    assert len(want) > 0


def test_spatial_join_cell_boundary_pairs_kept(spark):
    """Pairs straddling a cell boundary (the reason for the 3x3
    neighborhood) and exact-radius pairs must both survive."""
    from fhir2sql_spark.operators.spatial import distance_self_join

    pts = [(1, 4, 4), (2, 5, 4), (3, 9, 9), (4, 10, 10), (5, 0, 5), (6, 0, 0)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r.id_a, r.id_b) for r in distance_self_join(df, "id", "x", "y", 5).collect()}
    assert (1, 2) in got      # adjacent across x-cell boundary
    assert (3, 4) in got      # diagonal boundary
    assert (5, 6) in got      # exactly radius apart (<=)


def test_fuzzy_join_complete_at_min_length_boundary(spark):
    """Stress the q-gram count-filter bound exactly at the minimum
    complete length (q*(k+1)+1 = 7 for q=2, k=2): 400 random strings
    over a 2-letter alphabet of lengths 7-9 maximize gram collisions
    AND near-pairs; the operator must still equal the naive scan."""
    import random

    from fhir2sql_spark.operators.fuzzy import fuzzy_self_pairs

    rng = random.Random(3)
    names = list({
        "".join(rng.choice("ab") for _ in range(rng.randint(7, 9)))
        for _ in range(400)
    })
    df = spark.createDataFrame([(x,) for x in names], "p_name string")
    got = sorted(
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_self_pairs(df, "p_name", max_dist=2).collect()
    )
    want = sorted(
        (min(a, b), max(a, b), _lev(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev(a, b) <= 2
    )
    assert got == want
    assert len(want) > 100  # dense near-pair regime actually exercised


def test_cms_absent_token_estimates_zero(spark, sf_dir):
    """CMS point-query contract: a token never seen by the sketch must
    estimate 0 (its min includes an empty cell) — the review finding
    that an inner sketch join inflated or dropped absent tokens."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    sketch = cms_sketch(toks, depth=4, width=1 << 20)  # wide: no collisions
    ghost = spark.createDataFrame(
        [("__token_not_in_corpus__",)], "token string"
    )
    est = cms_estimate(sketch, ghost, depth=4, width=1 << 20).collect()
    assert len(est) == 1 and est[0].est == 0


def test_kmv_empty_sketches_estimate_zero(spark):
    from fhir2sql_spark.operators.kmv import (
        kmv_intersection_estimate,
        kmv_distinct_estimate_value,
        kmv_sketch_single,
    )

    empty = spark.range(0).selectExpr("id AS key")
    s = kmv_sketch_single(empty, "key")
    assert kmv_distinct_estimate_value(s) == 0.0
    r = kmv_intersection_estimate(s, s).collect()[0]
    assert r.jaccard_est == 0.0 and r.intersection_est == 0.0


def test_pagerank_empty_graph_returns_empty(spark):
    from fhir2sql_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges, iters=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_fuzzy_rejects_below_completeness_floor(spark):
    import pytest as _pytest

    from fhir2sql_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame([("abcdefg",), ("ab",)], "p_name string")
    # construction is lazy (no job); the in-plan guard raises at action
    bad = fuzzy_self_pairs(df, "p_name", max_dist=2)
    with _pytest.raises(Exception, match="complete"):
        bad.count()
    # and an empty input is fine (no pairs, no error)
    empty = spark.createDataFrame([], "p_name string")
    assert fuzzy_self_pairs(empty, "p_name", max_dist=2).count() == 0


def test_fuzzy_null_values_flow_through_guard(spark):
    """NULL names must NOT trip the min-length guard (ADVICE r4: a
    NULL length made the `when` condition NULL and fell through to
    raise_error); they drop out downstream like the pre-guard
    driver-side check allowed."""
    from fhir2sql_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame(
        [("abcdefgh",), (None,), ("abcdefgx",)], "p_name string"
    )
    pairs = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_pairs(df, "p_name", max_dist=2).collect()
    }
    assert pairs == {("abcdefgh", "abcdefgx")}


def test_kmv_jaccard_empty_events(spark, tmp_path):
    """Empty events table: Jaccard denominator is 0 — the query must
    emit a well-defined row, not raise ZeroDivisionError (ADVICE r3)."""
    from fhir2sql_spark.registry import QUERIES
    from fhir2sql_spark.tables import load

    src = load(spark, "/root/testdata/sf0.001", "events")
    src.limit(0).write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["q_agg_kmv_jaccard"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b, r.n_intersect) == (0, 0, 0)
    assert r.est_a_ok and r.est_b_ok and r.intersect_ok and r.jaccard_ok


def test_spatial_pack_injective_at_extreme_coords(spark):
    """Pairs near the old cx*2^31+cy aliasing boundary are emitted
    exactly once, and out-of-domain coordinates raise (ADVICE r3)."""
    import pytest as _pytest

    from fhir2sql_spark.operators.spatial import distance_self_join

    r = 10
    big = (1 << 30) * r - 25  # just inside the guarded domain
    pts = spark.createDataFrame(
        [(1, big, big), (2, big + 5, big + 5), (3, -big, -big), (4, 0, 0)],
        "id long, x long, y long",
    )
    rows = distance_self_join(pts, "id", "x", "y", r).collect()
    assert [(r_.id_a, r_.id_b) for r_ in rows] == [(1, 2)]

    bad = spark.createDataFrame([(1, (1 << 31) * r, 0)], "id long, x long, y long")
    with _pytest.raises(Exception, match="domain"):
        distance_self_join(bad, "id", "x", "y", r).count()


def test_kmv_driver_estimator_matches_distributed_forms(spark):
    """r11 parity pin: kmv_estimates_from_values (the driver-side
    bounded-collect path q_agg_kmv_jaccard now runs) must agree
    BIT-EXACTLY with the distributed estimate/intersection operators
    on both exhaustive (< k) and saturated (> k) sketches."""
    from fhir2sql_spark.operators.kmv import (
        kmv_distinct_estimate_value,
        kmv_estimates_from_values,
        kmv_intersection_estimate,
        kmv_sketch_single,
    )

    for lo_b, hi_b in ((20, 50), (1500, 4500)):
        a = spark.range(0, max(40, hi_b - 1500)).selectExpr("id AS key")
        b = spark.range(lo_b, hi_b).selectExpr("id AS key")
        sa, sb = kmv_sketch_single(a, "key"), kmv_sketch_single(b, "key")
        ha = [r.h for r in sa.collect()]
        hb = [r.h for r in sb.collect()]
        est_a, est_b, jac, inter = kmv_estimates_from_values(ha, hb)
        assert est_a == kmv_distinct_estimate_value(sa)
        assert est_b == kmv_distinct_estimate_value(sb)
        r = kmv_intersection_estimate(sa, sb).collect()[0]
        assert jac == r.jaccard_est
        assert inter == r.intersection_est
    # empty-sketch degenerate case
    assert kmv_estimates_from_values([], []) == (0.0, 0.0, 0.0, 0.0)
