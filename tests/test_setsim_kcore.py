"""Batch-2 round-5 additions: prefix-filtered set-similarity join
(AllPairs) and k-core decomposition.

setsim's completeness guarantee (prefix filtering finds every pair
with Jaccard >= t) is checked by equality against the independent
inverted-index formulation (jaccard_pairs) on random corpora; k-core
against a brute-force python peel on random graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, lang="en", text=t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): (r["common"], r["union_n"])
        for r in df.collect()
    }


def test_setsim_equals_inverted_index_fixed(spark):
    from fhir2sql_spark.operators import dedup

    texts = [
        "a b c d e f",
        "a b c d e g",      # J vs 0 at bigrams: 4/6
        "x y z w v u",
        "a b c d e f",      # exact clone of 0
        "q r s t",
    ]
    docs = _docs(spark, texts)
    got = _pairs(dedup.setsim_pairs(docs, 1, 2, n=2))
    want = _pairs(dedup.jaccard_pairs(docs, 1, 2, n=2))
    assert got == want
    assert (0, 3) in got and got[(0, 3)] == (5, 5)
    assert (0, 1) in got  # 4/6 >= 1/2


@pytest.mark.slow
def test_setsim_property_random_corpora(spark):
    """Hypothesis: prefix-filtered output == inverted-index output
    for random word-soup docs across thresholds."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fhir2sql_spark.operators import dedup

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(words), min_size=2, max_size=10),
            min_size=2,
            max_size=8,
        ),
        thr=st.sampled_from([(1, 3), (1, 2), (2, 3), (4, 5)]),
    )
    def run(docs, thr):
        df = _docs(spark, [" ".join(d) for d in docs])
        num, den = thr
        got = _pairs(dedup.setsim_pairs(df, num, den, n=2))
        want = _pairs(dedup.jaccard_pairs(df, num, den, n=2))
        assert got == want

    run()


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs], "src long, dst long"
    )


def _brute_kcore(pairs, k):
    edges = set(pairs)
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        edges = {
            (a, b) for a, b in edges if a not in bad and b not in bad
        }


def test_kcore_triangle_plus_tail(spark):
    from fhir2sql_spark.operators.kcore import kcore

    # triangle 1-2-3 plus a pendant path 3-4-5
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    out = {
        r["node"]: r["deg"]
        for r in kcore(_edges_df(spark, pairs), k=2).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2}
    assert kcore(_edges_df(spark, pairs), k=3).count() == 0


def test_kcore_property_random_graphs(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fhir2sql_spark.operators.kcore import kcore

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.sets(
            st.tuples(
                st.integers(0, 9), st.integers(0, 9)
            ).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=25,
        ),
        k=st.integers(2, 4),
    )
    def run(edges, k):
        und = sorted({(min(a, b), max(a, b)) for a, b in edges})
        got = {
            r["node"]: r["deg"]
            for r in kcore(_edges_df(spark, und), k=k).collect()
        }
        assert got == _brute_kcore(und, k)

    run()


def test_kcore_k_validation(spark):
    from fhir2sql_spark.operators.kcore import kcore

    with pytest.raises(ValueError, match="k must be"):
        kcore(_edges_df(spark, [(1, 2)]), k=0)


def test_kcore_fixture_converges_within_oracle_unroll(spark):
    """The registered oracle unrolls 14 peel rounds; assert the
    sf0.01 fixture's actual peeling depth fits with margin (peeling
    is monotone, so converged rounds are no-ops — this test pins the
    assumption that 14 covers the driver's fixture)."""
    from tests.conftest import SF_MED

    from fhir2sql_spark.operators.kcore import _degrees
    from fhir2sql_spark.operators.triangles import cooccurrence_edges
    from fhir2sql_spark.tables import load

    li = load(spark, SF_MED, "lineitem")
    cur = (
        cooccurrence_edges(li, "l_orderkey", "l_partkey", min_weight=2)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        deg = _degrees(cur)
        bad = deg.where(F.col("deg") < 3).select("node").localCheckpoint(
            eager=True
        )
        if bad.limit(1).count() == 0:
            break
        rounds += 1
        assert rounds <= 14, "fixture peeling depth exceeds oracle unroll"
        cur = (
            cur.join(bad.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(bad.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    assert rounds <= 12  # measured 10; margin of 2 under the unroll
