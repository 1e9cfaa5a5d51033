"""Grid-bucketed spatial distance join — all point pairs within
radius r, without the cartesian product.

The classic cell trick: partition the plane into r x r cells; any
pair within distance r lies in the same or an adjacent cell, so one
side replicates into its 3x3 cell neighborhood, the other stays in
its home cell, and the join becomes an EQUI-join on the cell id with
the exact distance as a residual. Each unordered pair meets exactly
once (the right row's home cell is unique), so no dedup is needed —
the same exactly-once argument as operators/interval.py.

Distances compare as INTEGER dx^2 + dy^2 <= r^2 (planar integer
coordinates), so the predicate is exact in any engine — no sqrt, no
float. Cost: 9x replication of one side shuffled on a long key vs
|A| x |B| comparisons; cell occupancy bounds the candidate fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distance_self_join(
    points: DataFrame, id_col: str, x_col: str, y_col: str, radius: int
) -> DataFrame:
    """(id_a, id_b, dist_sq) for unordered pairs of ``points``
    (integer planar coords) with squared distance <= radius^2,
    id_a < id_b."""
    r = int(radius)
    lim = 1 << 30

    # Cell coordinates are guarded to |cell| < 2^30 - 1 (an in-plan
    # raise_error, so the check is lazy and costs one comparison per
    # row). The margin of one cell makes the packing injective
    # VERBATIM across the +/-1 probe offsets: with |cell| <= 2^30 - 2
    # and |offset| <= 1, the shifted cy lands in [1, 2^31 - 1], i.e.
    # strictly inside [0, 2^31), so pack(cx, cy) == pack(cx', cy')
    # forces cy - cy' = +/-2^31 — impossible in that range. (The older
    # |cell| < 2^30 guard let a probe key hit shifted value exactly
    # 2^31, aliasing into the (cx+1, 0) slot; harmless only because
    # home keys never produced shifted 0 or 2^31, but the invariant
    # as stated was false for the probe side.) |cx| < 2^30 also
    # bounds the product at ~2^61, safely inside long range.
    guard_lim = lim - 1

    def cell(c):
        cc = F.floor(F.col(c) / r).cast("long")
        return F.when(F.abs(cc) < guard_lim, cc).otherwise(
            F.raise_error(
                F.format_string(
                    "distance_self_join: coordinate %s is outside the "
                    f"supported domain |coord| < {guard_lim}*r (r={r}); "
                    "rescale coordinates or widen the cell packing",
                    F.col(c),
                )
            )
        )

    pack = lambda cx, cy: (cx * F.lit(1 << 31) + (cy + F.lit(1 << 30)))  # noqa: E731

    home = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        pack(cell(x_col), cell(y_col)).alias("__cell"),
    )
    # probe cells reuse the guarded cell exprs (offsets applied after
    # the domain check, so cy+dy stays within the injective range)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        points.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).alias("xa"),
            F.col(y_col).alias("ya"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            pack(
                cell("xa") + F.col("o.dx"),
                cell("ya") + F.col("o.dy"),
            ).alias("__cell"),
        )
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(home, "__cell")
        .where((F.col("id_a") < F.col("id_b")) & (dist_sq <= r * r))
        .select("id_a", "id_b", dist_sq.cast("long").alias("dist_sq"))
    )
