"""Continuous-aggregate rollup: the streaming twin of
``q_rollup_hypertable``.

The batch query builds hour/day/type grains in one GROUPING SETS pass.
Structured Streaming cannot run GROUPING SETS in an aggregation, and a
real continuous aggregate would not want to: the streaming job
maintains ONLY the finest grain (hour buckets, watermarked), and every
coarser grain is derived by re-aggregating the hour rollup — decimal
sums and counts are mergeable, so composition upward is exact and the
raw stream is read exactly once. This is the TimescaleDB
continuous-aggregate / materialized-rollup architecture expressed as
watermarked Structured Streaming + a mergeable summary table.

``tests/test_streaming.py::test_rollup_stream_merges_to_batch`` proves
the property end-to-end: streamed hour grain -> merge_grains() equals
the one-pass batch GROUPING SETS result row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FMT = "yyyy-MM-dd HH:mm:ss"


def hour_grain_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked hour-bucket aggregation — the ONLY stateful
    streaming aggregation a continuous rollup needs. Keeps the sum as
    DECIMAL so coarser grains merge exactly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_dec"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value_dec",
        )
    )


def merge_grains(hour_df: DataFrame) -> DataFrame:
    """Derive day and per-type grains by re-aggregating the hour
    rollup (counts add, decimal sums add — both mergeable), emitting
    the exact schema of ``q_rollup_hypertable``. Input size is
    #hour-buckets, not #events: merging is free at any scale."""
    hour = hour_df.select(
        F.lit("hour").alias("grain"),
        "event_type",
        F.date_format("hour_start", _FMT).alias("bucket_start"),
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )
    day = (
        hour_df.groupBy(
            F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").alias("sum_value_dec"),
        )
        .select(
            F.lit("day").alias("grain"),
            "event_type",
            F.date_format("day_start", _FMT).alias("bucket_start"),
            "n_events",
            F.col("sum_value_dec").cast("double").alias("sum_value"),
        )
    )
    typ = (
        hour_df.groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").alias("sum_value_dec"),
        )
        .select(
            F.lit("type").alias("grain"),
            "event_type",
            F.lit(None).cast("string").alias("bucket_start"),
            "n_events",
            F.col("sum_value_dec").cast("double").alias("sum_value"),
        )
    )
    return hour.unionByName(day).unionByName(typ)
