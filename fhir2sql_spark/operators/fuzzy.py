"""Fuzzy (edit-distance) string join — entity resolution / data
cleaning: pair strings whose Levenshtein distance is at most k
without comparing all pairs.

The naive form is a cartesian product with a levenshtein() predicate
— a BroadcastNestedLoopJoin, dead at catalog scale. The standard
q-gram rewrite makes it an EQUI-join:

1. each distinct string explodes into its character q-grams (derived
   via arrays_zip of shifted char slices — codegen, no HOF lambda);
2. candidate pairs are strings sharing >= 1 q-gram with
   |len(a) - len(b)| <= k (length pruning composes into the same
   aggregate filter);
3. the exact levenshtein() runs on candidates only.

Completeness: one edit operation destroys at most q q-grams, so two
strings within distance k share at least max(len)-q+1-q*k q-grams
(Gravano et al., VLDB'01 count filter). The >= 1-shared-gram
candidate test is therefore COMPLETE whenever max(len) >= q*(k+1)+1
— asserted at runtime against the input's min length; shorter strings
need a dedicated short-string branch (at that size the distinct-value
set is tiny, so an exact pass over it is cheap anyway).

The distinct-gram inverted index and the pair aggregate both key on
xxhash64 longs (the near-dup posting discipline); the candidate
count is O(pairs sharing a gram), the same contract as the Jaccard
inverted index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    names: DataFrame, col: str, max_dist: int = 2, q: int = 2
) -> DataFrame:
    """(name_a, name_b, edit_dist) for every unordered pair of
    DISTINCT ``col`` values with levenshtein <= max_dist
    (name_a < name_b).

    Inputs shorter than ``min_complete_length(max_dist, q)`` raise at
    ACTION time (an in-plan ``raise_error`` guard) — below that floor
    the shared-gram candidate test can miss true pairs, and the caller
    must route short strings through an exact pass instead. The guard
    is a per-row expression inside the main job: building the
    DataFrame stays lazy (no eager scan), and no extra pass over the
    input is ever made.

    NULL values short-circuit the guard (a NULL length would
    otherwise make the ``when`` condition NULL and fall through to
    ``raise_error`` with a confusing message): they pass through
    unchanged and drop out naturally downstream — ``split(NULL)``
    yields NULL, so a NULL name never produces a gram row or a
    candidate pair, matching the pre-guard driver-side behavior."""
    floor = min_complete_length(max_dist, q)
    guard = F.when(
        F.col(col).isNull() | (F.length(F.col(col)) >= floor), F.col(col)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "fuzzy_self_pairs: input string '%s' has length %s < "
                f"{floor}; the q-gram candidate filter is only complete "
                "from length q*(max_dist+1)+1 — handle shorter strings "
                "with an exact pass",
                F.col(col),
                F.length(F.col(col)),
            )
        )
    )
    n = names.select(guard.alias("name")).distinct()
    chars = F.split(F.col("name"), "")
    m = F.size(chars) - (q - 1)
    zipped = F.arrays_zip(*[F.slice(chars, i + 1, m) for i in range(q)])
    gram = F.concat_ws("", *[F.col(f"g.{i}") for i in range(q)])
    grams = (
        n.select("name", F.explode(zipped).alias("g"))
        .select("name", F.xxhash64(gram).alias("gid"))
        .distinct()
    )
    a = grams.select(F.col("name").alias("name_a"), "gid")
    b = grams.select(F.col("name").alias("name_b"), F.col("gid").alias("gid_b"))
    # length pruning INSIDE the join condition (still a hash join on
    # gid): pairs of wildly different lengths never reach the shuffle
    # aggregate; distinct() collapses the per-shared-gram multiplicity
    cand = a.join(
        b,
        (a.gid == b.gid_b)
        & (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        ),
    ).select("name_a", "name_b").distinct()
    return (
        cand.withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= max_dist)
        .select("name_a", "name_b", F.col("edit_dist").cast("int").alias("edit_dist"))
    )


def min_complete_length(max_dist: int = 2, q: int = 2) -> int:
    """Smallest string length for which the >=1-shared-gram candidate
    test provably misses nothing (count filter > 0)."""
    return q * (max_dist + 1) + 1
