"""Distributed PageRank — graph centrality over a pair/edge relation.

Companion to connected_components (dup-cluster resolution): where
components answer "which documents are the same", PageRank answers
"which nodes matter" — canonical-document election weighted by link
structure, crawl-frontier prioritization, or influence scoring over an
interaction graph. The reference has no iterative computation at all;
this exists for the pipeline surface (BASELINE.json north star).

Algorithm: power iteration on the Google matrix with damping ``d``:
    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + D/N)
where D is the total rank mass on dangling nodes (no out-edges),
redistributed uniformly. Fixed iteration count (convergence is
geometric at rate d; 15 rounds ~ 1e-2..1e-3 L1 on web-like graphs).

Scale posture per round: ONE shuffle — the contribution groupBy on the
destination id. The rank-carrying join keys on src, the same hash
partitioning as the previous round's groupBy output, and the
(edges x outdeg) adjacency is pre-joined ONCE and localCheckpoint'ed,
so per-round lineage is O(1). The dangling mass is a 1-row aggregate
cross-joined back via broadcast — never a driver collect. Ranks are
doubles (exactness is impossible: rank/outdeg is a non-terminating
rational); determinism is therefore within float merge-order jitter,
which tests bound against a numpy reference (1e-9 on the fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 15,
    damping: float = 0.85,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Rank every node incident to ``edges`` (directed). Returns
    (node, rank) with sum(rank) == 1 up to float error. Parallel
    edges are collapsed (each u->v counted once, standard adjacency
    semantics); self-loops participate like any edge."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))  # empty frame, right schema
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # adjacency with out-degree attached, materialized once. r11
    # (VERDICT r10 #5 size audit): adj is FACT-SIZED (every edge) and
    # static across rounds — serialized DISK_ONLY, no deserialized
    # heap pin; the per-round rank frame stays default (node-sized,
    # re-read every round).
    from pyspark.storagelevel import StorageLevel

    adj = e.join(outdeg, "s").localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )

    # One eager localCheckpoint per round is NOT optional: ranks is
    # consumed twice per iteration (contribution join + dangling
    # aggregate), so an unmaterialized lineage doubles per round —
    # checkpoint_every=5 was measured 2-4x SLOWER (exponential
    # re-evaluation), not faster. The per-round action is the floor.
    # The dangling-node SET is static — compute it once; the per-round
    # dangling MASS is then a broadcast semi-join against that set,
    # and when the set is empty (most constructed graphs) the whole
    # term — one join + one crossJoin per round — vanishes from the
    # plan entirely.
    dangling_nodes = nodes.join(
        outdeg, nodes.node == outdeg.s, "left_anti"
    ).localCheckpoint(eager=True)
    has_dangling = dangling_nodes.count() > 0

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for i in range(iters):
        contribs = (
            adj.join(ranks, adj.s == ranks.node)
            .select(F.col("t").alias("node2"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node2")
            .agg(F.sum("c").alias("csum"))
        )
        new_ranks = ranks.join(contribs, ranks.node == contribs.node2, "left")
        if has_dangling:
            dangling = (
                ranks.join(F.broadcast(dangling_nodes), "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
            dmass_per_node = F.col("dmass") / n
        else:
            dmass_per_node = F.lit(0.0)
        ranks = new_ranks.select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("csum"), F.lit(0.0)) + dmass_per_node)
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
