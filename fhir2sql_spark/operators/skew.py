"""Skew-handling join utilities.

AQE's skew-join splitting (enabled session-wide in session.py) handles
most skew at runtime by splitting oversized partitions. Salting is the
manual complement for the pathological case AQE can't fix: a single
join KEY so hot that one task would still own it after splitting —
e.g. the null/default key, or a celebrity user at 100 TB.

``salted_join``: replicate the (small-ish) right side ``salt`` times
and scatter the left side's hot keys across ``salt`` sub-keys. The
join key becomes (key, salt_id) — the hot key's rows spread over
``salt`` tasks. Result rows are identical to the unsalted join
(verified by test); only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with ``salt``-way key scattering.

    left gets a random-but-deterministic salt from its own row content
    (hash-based — no rand(), so the plan stays deterministic and
    retry-safe); right is exploded ``salt`` times so every (key,
    salt_id) pair finds its match. Use when one key dominates; cost is
    replicating the right side ``salt``x, so keep right the smaller
    input.

    Only ``inner`` and ``left`` joins are supported: with the right
    side replicated ``salt`` times, a right/full outer join would emit
    every unmatched right row once per replica — not the unsalted
    result (round-1 advisor finding). Semi/anti flavors are pointless
    here (they never multiply rows, so salt the plain join instead)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "outer flavors would duplicate unmatched right rows "
            "(right side is replicated per salt)"
        )
    salt_col = F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    l_salted = left.withColumn("__salt", salt_col)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")


def banded_inequality_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    max_gap,
    band_width=None,
) -> DataFrame:
    """Bounded-gap inequality join as equi-join + residual — the
    scale rewrite of the theta join (0 < left_val - right_val <=
    max_gap) that BroadcastNestedLoopJoin cannot survive at 100 TB.

    Each row maps to band = floor(value / band_width) (computed in
    DECIMAL so banding is exact on money-typed columns); the right
    side replicates into ceil(max_gap / band_width) + 1 consecutive
    band keys, the join becomes an EQUI-join on the band, and the
    original predicate runs as a post-match residual filter. Coverage:
    left_val in (right_val, right_val + max_gap] implies
    band(left) in [band(right), band(right) + ceil(gap/width)], so no
    qualifying pair crosses outside the replicated keys; each pair
    matches exactly one band key, so no dedup is needed.

    Cost model: candidates ~ |right| * (extra+1) rows shuffled on an
    8-byte key vs the nested loop's |left| x |right| comparisons.
    ``band_width`` trades residual waste (wide bands) against key
    cardinality and replication (narrow bands); a hot band (value
    skew) composes with ``salted_join``'s scattering or AQE skew
    splitting since the band key is a plain equi key.

    The UNBOUNDED form (no max_gap) is inherently quadratic in its
    OUTPUT, so no physical plan fixes it; bound the gap or use the
    contract-only BNLJ form (queries/joins.py q_join_theta)."""
    w = band_width or max_gap
    extra = -(-max_gap // w)  # ceil
    lb = F.floor(F.col(left_val).cast("decimal(18,2)") / F.lit(w)).cast("long")
    rb = F.floor(F.col(right_val).cast("decimal(18,2)") / F.lit(w)).cast("long")
    a = left.withColumn("__band", lb)
    b = right.withColumn(
        "__band",
        F.explode(F.sequence(rb, rb + F.lit(int(extra)))),
    )
    gap = F.col(left_val).cast("decimal(18,2)") - F.col(right_val).cast(
        "decimal(18,2)"
    )
    return (
        a.join(b, "__band")
        .where((F.col(left_val) > F.col(right_val)) & (gap <= max_gap))
        .drop("__band")
    )
