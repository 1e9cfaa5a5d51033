"""As-of join — an operator Spark lacks natively (SURVEY.md §4.3-3).

Semantics: for each left row, attach the single right row with the
largest ``right_ts <= left_ts`` within the same ``on`` key (ties on
``right_ts`` broken by the largest ``tie_break``). Inner flavor: left
rows with no eligible right row are dropped.

Implementation is the canonical composition: equi-join on the key with
the range predicate as a residual, then one window to keep the latest
candidate per probe. Both steps are shuffle-partitioned on distributed
keys, so the plan scales horizontally; the window's partition key is
the probe's unique id, keeping per-partition state at O(candidates of
one probe).

Scale note: when the right side is dense per key (many events per
user), the candidate set multiplies. For 100 TB workloads, pre-bucket
both sides by (key, time-bucket) so each probe only joins its own and
the preceding bucket — same composition, bounded fan-out. The simple
form is below; the bucketed variant is a straightforward extension of
the same operator contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    probe_key: str,
    tie_break: str,
) -> DataFrame:
    """Latest-at-or-before join. ``probe_key`` must uniquely identify
    left rows (it becomes the window partition key)."""
    cand = left.join(
        right,
        (left[on] == right[on]) & (right[right_ts] <= left[left_ts]),
    ).drop(right[on])
    w = (
        Window.partitionBy(probe_key)
        .orderBy(F.col(right_ts).desc(), F.col(tie_break).desc())
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
