"""Interval-overlap join — the time-range analog of the banded theta
join (operators/skew.py), for workloads the reference's key-equality
diff cannot express: maintenance-window attribution, ad-campaign /
promo overlap, genomic-range intersection.

Spark has no native interval join; the naive form is a cartesian
product with an overlap predicate, i.e. BroadcastNestedLoopJoin — dead
at 100 TB. ``interval_overlap_join`` rewrites it as an EQUI-join:

1. each interval maps to the set of fixed-width day buckets it spans
   (`floor(epoch_day / bucket_days)`), a BOUNDED explode as long as
   interval length is bounded (ceil(len/width) + 1 keys per row);
2. the join becomes an equi-join on the bucket key — shuffle/broadcast
   hash joinable, AQE-skew-splittable, salting-composable;
3. the true overlap predicate (`a.start <= b.end AND b.start <= a.end``)
   runs as a post-match residual;
4. a pair overlapping across several shared buckets would match once
   per bucket, so matches are pinned to the single canonical bucket
   containing ``greatest(a.start, b.start)`` — which any overlapping
   pair shares by construction (max(start) <= min(end) lies in both
   intervals) — making the output exactly-once WITHOUT a distinct.

Cost: |rows| x (len/width + 1) exploded rows shuffled on an 8-byte
long vs the nested loop's |A| x |B| comparisons. ``bucket_days``
trades replication (narrow) against per-bucket candidate fan-in
(wide); pick ~ the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _epoch_day(col: str) -> Column:
    return F.datediff(F.col(col).cast("date"), F.lit(_EPOCH).cast("date"))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_days: int = 16,
) -> DataFrame:
    """Inner join of ``left`` x ``right`` on interval overlap
    (closed intervals of DATE/TIMESTAMP columns), realized as a
    bucket equi-join + residual. Column names must be disjoint.
    Emits each overlapping pair exactly once."""
    lb = F.floor(_epoch_day(left_start) / bucket_days).cast("long")
    le = F.floor(_epoch_day(left_end) / bucket_days).cast("long")
    rb = F.floor(_epoch_day(right_start) / bucket_days).cast("long")
    re = F.floor(_epoch_day(right_end) / bucket_days).cast("long")
    a = left.withColumn("__bucket", F.explode(F.sequence(lb, le)))
    b = right.withColumn("__bucket", F.explode(F.sequence(rb, re)))
    meet = F.floor(
        F.greatest(_epoch_day(left_start), _epoch_day(right_start)) / bucket_days
    ).cast("long")
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    return (
        a.join(b, "__bucket")
        .where(overlap & (F.col("__bucket") == meet))
        .drop("__bucket")
    )
