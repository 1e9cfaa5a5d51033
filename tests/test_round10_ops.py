"""Round-10 invariants:

1. Bloom membership tier (VERDICT r9 #5): deterministic
   no-false-negative on the exact stored key set, an FPR envelope on
   a deliberately saturated small sketch, status equality with the
   un-sketched q_dedup_incremental, and the PLAN property the oracle
   cannot check — the exact corpus-index join is consulted ONLY for
   bloom positives (exactly one th-keyed join, gated behind a
   bloom_hit filter; the negatives branch never touches the index).
2. DoReMi x bigram-LM composition (VERDICT r9 #4): the emitted
   mixture is a probability vector with the 20 % uniform floor, and
   the excess-loss signal is centered the DoReMi way (reference-
   weighted mean ~ 0).
3. bench.py host-factor plumbing (VERDICT r9 #1): the same-run
   DuckDB A/B measures exactly the pinned §B query set, on the
   PINNED sf0.1 data (the factor must hold workload constant), and
   the factor arithmetic matches the BASELINE.md §C definition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir2sql_spark import registry
from fhir2sql_spark.queries.llm import (
    _BLOOM_BITS,
    _BLOOM_K,
    _bloom_positions,
)
from tests.conftest import SF_SMALL

registry.load_all()


def _bloom_words(df, m):
    return (
        df.select(F.explode(_bloom_positions(F.col("th"), m)).alias("pos"))
        .select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
    )


def _probe(df, words, m):
    posed = df.select(
        "th", F.explode(_bloom_positions(F.col("th"), m)).alias("pos")
    )
    return (
        posed.select(
            "th",
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("b"),
        )
        .join(F.broadcast(words), "w", "left")
        .withColumn(
            "hit",
            F.coalesce(F.col("word").bitwiseAND(F.col("b")) != 0, F.lit(False)),
        )
        .groupBy("th")
        .agg((F.min(F.col("hit").cast("int")) == 1).alias("bloom_hit"))
    )


def test_bloom_no_false_negatives_and_fpr_envelope(spark):
    """Members ALL test positive (the deterministic guarantee the
    query's statuses lean on); non-members on a saturated small
    sketch (m = 4096 bits, 1000 keys * k = 5 -> 1.22 bits-set load)
    false-positive within the theoretical envelope
    (1 - e^(-kn/m))^k ~ 0.17 — wide band for hash variance."""
    m = 4096
    members = spark.range(1000).selectExpr("concat('key-', id) AS th")
    others = spark.range(20000).selectExpr(
        "concat('other-', id) AS th"
    )
    words = _bloom_words(members, m).localCheckpoint()
    assert (
        _probe(members, words, m).where(~F.col("bloom_hit")).count() == 0
    )  # no false negatives, ever
    fpr = (
        _probe(others, words, m).where(F.col("bloom_hit")).count() / 20000
    )
    assert 0.05 <= fpr <= 0.35, fpr
    # and the PRODUCTION sizing keeps the fixture essentially clean
    words_big = _bloom_words(members, _BLOOM_BITS).localCheckpoint()
    fpr_big = (
        _probe(others, words_big, _BLOOM_BITS)
        .where(F.col("bloom_hit"))
        .count()
        / 20000
    )
    assert fpr_big < 0.001, fpr_big


def test_bloom_statuses_equal_unsketched_twin(spark):
    """The sketch tier must be invisible in the output: statuses
    equal q_dedup_incremental's row-for-row and bloom_sound is the
    constant TRUE the oracle pins."""
    rows = registry.QUERIES["q_dedup_incremental_bloom"](
        spark, SF_SMALL
    ).collect()
    base = {
        r["doc_id"]: r["status"]
        for r in registry.QUERIES["q_dedup_incremental"](
            spark, SF_SMALL
        ).collect()
    }
    assert {r["doc_id"]: r["status"] for r in rows} == base
    assert all(r["bloom_sound"] is True for r in rows)
    # all three statuses exercised on this fixture
    assert {r["status"] for r in rows} == {"dup_corpus", "dup_batch", "new"}


def test_bloom_index_join_gated_behind_sketch(spark):
    """Plan pin (VERDICT r9 #5 done-criteria): exactly ONE join keyed
    on the corpus key `th` (the exact-index probe), and it sits
    behind a bloom_hit filter; the negatives branch reaches the
    output with no th-join at all. The word-table joins key on `w`
    and do not count."""
    plan = (
        registry.QUERIES["q_dedup_incremental_bloom"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [
        ln
        for ln in plan.splitlines()
        if "Join" in ln and "[th#" in ln.replace(" ", "")
    ]
    assert len(join_lines) == 1, join_lines
    # Catalyst rewrites the bloom_hit projection into the filter as
    # (__allhit = 1); the positives gate and the join-free negatives
    # branch (NOT (__allhit = 1)) must both be present
    lines = plan.splitlines()
    assert any(
        "Filter" in ln and "__allhit" in ln and "= 1)" in ln
        and "NOT" not in ln
        for ln in lines
    ), "the index probe must be gated behind the bloom-positive filter"
    assert any(
        "Filter" in ln and "NOT (__allhit" in ln for ln in lines
    ), "the negatives branch must filter on bloom-miss"
    assert "Union" in plan  # the join-free negatives branch exists


def test_doremi_lm_mixture_properties(spark):
    rows = registry.QUERIES["q_sample_doremi_lm"](spark, SF_SMALL).collect()
    k = len(rows)
    assert k >= 2
    w1 = [r["w1"] for r in rows]
    # probability vector with the 20% uniform floor
    assert abs(sum(w1) - 1.0) < 1e-3 * k  # 4-dp rounding per row
    assert all(w >= 0.2 / k - 1e-4 for w in w1)
    # excess loss is centered: reference-weighted mean excess ~ 0
    # (sum w0*excess = 1 - sum(w0 * dom_ratio) and the w0 weights are
    # the corpus shares that define the corpus mean) — loose band
    # because w0/excess are emitted rounded
    centered = sum(r["w0"] * r["excess"] for r in rows)
    assert abs(centered) < 0.05
    # domains above corpus-average loss are upweighted vs w0 modulo
    # the uniform smoothing: check the multiplicative direction on
    # the extremes
    hi = max(rows, key=lambda r: r["excess"])
    lo = min(rows, key=lambda r: r["excess"])
    if hi["excess"] > lo["excess"]:
        assert (hi["w1"] - 0.2 / k) / max(hi["w0"], 1e-9) >= (
            lo["w1"] - 0.2 / k
        ) / max(lo["w0"], 1e-9)


def test_bench_host_factor_plumbing():
    """duckdb_headline measures exactly the pinned query set against
    the PINNED sf0.1 data, and the factor arithmetic is the §C
    definition. (No Spark involved — this is the oracle side.)"""
    import bench

    assert set(bench.DUCKDB_PINNED_S) == {
        "q_agg_basic",
        "q_join_inner",
        "q_window_rank",
        "q_limit_topk",
        "q_tumble",
        "q_sync_diff_full",
    }
    assert bench.DUCKDB_PINNED_DIR.endswith("sf0.1")
    meas = bench.duckdb_headline(bench.DUCKDB_PINNED_DIR)
    assert set(meas) == set(bench.DUCKDB_PINNED_S)
    assert all(v > 0 for v in meas.values())
    factor = sum(meas.values()) / sum(bench.DUCKDB_PINNED_S.values())
    assert factor > 0.05  # sanity: the ratio is a real number of ~unit scale


def test_pack_bfd_quality_and_capacity(spark):
    """BFD packing: every bin holds <= capacity (except unavoidable
    single-oversized-doc bins), the packed doc set equals greedy's,
    and BFD uses no more bins than greedy next-fit per stream (the
    point of the variant)."""
    from fhir2sql_spark.operators.packing import pack_bfd, pack_greedy
    from fhir2sql_spark.tables import load

    docs = load(spark, SF_SMALL, "documents")
    bfd = pack_bfd(docs, capacity=256).collect()
    greedy = pack_greedy(docs, capacity=256).collect()
    assert {r["doc_id"] for r in bfd} == {r["doc_id"] for r in greedy}
    loads: dict = {}
    members: dict = {}
    for r in bfd:
        k = (r["lang"], r["bin_id"])
        loads[k] = loads.get(k, 0) + r["n_tokens"]
        members[k] = members.get(k, 0) + 1
    for k, ld in loads.items():
        assert ld <= 256 or members[k] == 1, (k, ld, members[k])

    def nbins(rows):
        return len({(r["lang"], r["bin_id"]) for r in rows})

    assert nbins(bfd) <= nbins(greedy)
    # BFD must actually beat next-fit somewhere on this fixture
    assert nbins(bfd) < nbins(greedy)
