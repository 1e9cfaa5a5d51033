"""pagerank: parity with a dense numpy power iteration (same damping,
same dangling handling, same iteration count), mass conservation, and
structural sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fhir2sql_spark.operators.pagerank import pagerank
from fhir2sql_spark.tables import load


def _numpy_pagerank(edge_list, iters=15, d=0.85):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = sorted({(idx[u], idx[v]) for u, v in edge_list})
    deg = np.zeros(n)
    for u, _ in adj:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in adj:
            contrib[v] += r[u] / deg[u]
        dmass = r[deg == 0].sum()
        r = (1.0 - d) / n + d * (contrib + dmass / n)
    return {v: r[idx[v]] for v in nodes}


def test_matches_numpy_power_iteration(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("o_orderkey") % 60).alias("dst"),
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=15).collect()}
    edge_list = [(r.src, r.dst) for r in edges.collect()]
    want = _numpy_pagerank(edge_list, iters=15)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, f"node {v}: {got[v]} vs {want[v]}"


def test_mass_conserved(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("o_orderkey") % 60).alias("dst"),
    )
    total = pagerank(edges, iters=10).agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_star_graph_hub_dominates(spark):
    spokes = 20
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, spokes + 1)]
        + [(0, i) for i in range(1, spokes + 1)],
        "src long, dst long",
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=20).collect()}
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    # spokes are symmetric: identical ranks
    vals = list(ranks.values())
    assert max(vals) - min(vals) < 1e-12
