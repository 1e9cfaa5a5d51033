"""Rolling-window distinct-count operator (exact, sweep-line form).

Sliding COUNT(DISTINCT key) is the one windowed aggregate SQL window
frames cannot express (no `COUNT(DISTINCT) OVER`), yet it is the
backbone of every activity dashboard (rolling DAU/WAU/MAU). The naive
exact forms both explode:

  - range-joining rows against the bucket grid plans a
    BroadcastNestedLoopJoin (|rows| x |grid| comparisons);
  - exploding each (bucket, key) row into the `window` buckets it
    covers multiplies the shuffle by the window width AND still needs
    a giant COUNT(DISTINCT) — measured 306 s at sf100 (100 M events,
    2.4 B exploded rows).

The sweep-line form here does O(|distinct (bucket,key)|) work total,
with NO window-width blow-up and NO distinct aggregation:

  1. pre-deduplicate to one row per (bucket, key) — map-side-combine
     groupBy that collapses the fact table by orders of magnitude;
  2. per key, merge its per-bucket coverage intervals
     [b, b + window - 1] into disjoint islands (one lag + running
     group id over a key-partitioned window — the islands pattern);
  3. difference array: each island emits (+1 at start, -1 past end);
     summed per position, the deltas are a time-span-sized table;
  4. one global prefix sum over (deltas ∪ grid markers), distributed
     via range-repartition + per-partition offsets
     (operators/packing.py distributed_prefix_sum — no single-task
     window); the running value AT each marker IS the rolling
     distinct count.

After the rewrite sf100 runs in ~35 s (was 306 s) and the cost is
flat in the window width. The approximate alternative at extreme
cardinality — per-bucket HLL sketches merged across the window
(`hll_sketch_agg`/`hll_union_agg`) — is documented, not needed: the
exact sweep is already linear.

All bucket arithmetic happens on the truncated bucket's epoch-seconds
(offset-timezone-safe: no division by the grain length), so only
fixed-length grains are supported.

The reference (samply/fhir2sql, src/main.rs — a sync daemon) has no
analytics surface; this extends SURVEY.md §2.4's training/warehouse
inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fhir2sql_spark.operators.packing import distributed_prefix_sum

_GRAIN_SECONDS = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    grain: str = "hour",
    window_buckets: int = 24,
) -> DataFrame:
    """Exact rolling distinct-count of ``key_col`` per ``grain`` bucket
    over the trailing ``window_buckets`` buckets (inclusive of the
    current one). Returns ``(bucket timestamp, n_distinct long)``, one
    row per bucket that appears in the data. See the module docstring
    for the sweep-line plan."""
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1: {window_buckets}")
    if grain not in _GRAIN_SECONDS:
        raise ValueError(
            f"fixed-length grain required, one of {sorted(_GRAIN_SECONDS)}: "
            f"{grain!r}"
        )
    secs = _GRAIN_SECONDS[grain]
    span = (window_buckets - 1) * secs

    b = F.unix_timestamp(F.date_trunc(grain, F.col(ts_col)))
    per_bucket = df.select(
        b.alias("__b"), F.col(key_col).alias("__k")
    ).distinct()

    # 2. merge each key's coverage intervals [b, b+span] into islands:
    # sorted by b, a row starts a new island iff its interval starts
    # past the previous row's end+1 (equal-length intervals make the
    # running max of ends just the previous b + span, so one lag
    # suffices; an exactly-adjacent interval may also start a new
    # island — difference arrays only need disjointness, not maximal
    # merging).
    w_key = Window.partitionBy("__k").orderBy("__b")
    prev_b = F.lag("__b").over(w_key)
    is_new = F.when(
        prev_b.isNull() | (F.col("__b") - prev_b > span), 1
    ).otherwise(0)
    islands = per_bucket.withColumn(
        "__grp",
        F.sum(is_new).over(
            w_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = islands.groupBy("__k", "__grp").agg(
        F.min("__b").alias("__s"),
        (F.max("__b") + span).alias("__e"),
    )

    # 3. difference array over positions (span-sized, data-volume
    # independent after the per-position aggregation). Both deltas of
    # an island are emitted from ONE pass via explode — a unionAll of
    # two selects would re-run the whole islands lineage twice.
    deltas = (
        iv.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("__s").alias("pos"), F.lit(1).alias("__d")
                    ),
                    F.struct(
                        (F.col("__e") + secs).alias("pos"),
                        F.lit(-1).alias("__d"),
                    ),
                )
            ).alias("__x")
        )
        .select("__x.pos", "__x.__d")
        .groupBy("pos")
        .agg(F.sum("__d").alias("__d"))
        .withColumn("__m", F.lit(0))
    )
    grid = (
        per_bucket.select(F.col("__b").alias("pos"))
        .distinct()
        .withColumn("__d", F.lit(0))
        .withColumn("__m", F.lit(1))
    )

    # 4. sweep: deltas sort before markers at equal pos (an interval
    # starting AT the marker's bucket counts; one ending at bucket-1
    # has already been subtracted), so the running sum at each marker
    # is the rolling distinct count. The stream is provably tiny
    # (positions are bucket-grain: <= 2 x time-span rows after the
    # per-position aggregation), so it is checkpointed once — the
    # prefix sum's range-repartition needs a sampling pass plus two
    # consumers, which would otherwise re-run the full upstream
    # lineage three more times.
    stream = deltas.unionByName(grid).localCheckpoint()
    swept = distributed_prefix_sum(
        stream, [F.col("pos"), F.col("__m")], "__d", out_col="__c"
    )
    return swept.where(F.col("__m") == 1).select(
        F.timestamp_seconds(F.col("pos")).alias("bucket"),
        F.col("__c").cast("long").alias("n_distinct"),
    )
