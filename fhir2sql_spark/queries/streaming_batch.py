"""Streaming-shaped queries, batch-checked (SURVEY.md §2.3 M5).

Each query here is the batch rendering of a Structured Streaming
computation; tests/test_streaming.py re-runs the same logic through
``readStream`` (file source, Trigger.AvailableNow, temp checkpoint)
and asserts streaming-batch equivalence — the engine's replacement for
the reference's poll-scheduler micro-batching
(/root/reference/src/main.rs:199-270, 390-411).

Determinism: window starts are emitted as formatted strings (never raw
timestamps); sums go through DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load
from fhir2sql_spark.queries.util import dec

_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "q_tumble",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type (F.window group)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 2)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_slide",
    oracle="""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
               event_type
        FROM events
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n_events
    FROM assigned GROUP BY 1, 2
    """,
)
def q_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour, 30-minute slide): every event lands in
    exactly two windows (Expand-based assignment, no self-join)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@query(
    "q_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts >= COALESCE(
                        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        TIMESTAMP '1970-01-01 00:00:00')
                      + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-minute gap (F.session_window).
    Spark merges an event into the session while ts < prev_end
    (half-open); the gaps-and-islands oracle mirrors that with a
    `>= prev + gap` break condition."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 2)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_late_data",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withWatermark + tumble. In batch execution the watermark is
    defined to be a no-op (Spark batch plans drop EventTimeWatermark),
    so the exact oracle is the plain hourly rollup; the actual
    late-drop semantics are asserted in tests/test_streaming.py via a
    two-batch replay (SURVEY §5.2-3)."""
    e = load(spark, sf_dir, "events")
    return (
        e.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@query(
    "q_stream_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           CAST(FLOOR(epoch(c.ts)) - FLOOR(epoch(v.ts)) AS BIGINT) AS secs_after
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 1 HOUR
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-checked: each view pairs
    with the same user's clicks inside the following hour. The
    streaming twin (tests/test_streaming.py) runs the identical plan
    through two watermarked ``readStream`` sides — the equi key
    (user_id) co-partitions both streams so state lives on the
    matching task, and the watermark + time-range condition bound
    that state (Spark evicts buffered rows once they can no longer
    join) — the scale answer to an unbounded-state self-join. In
    batch, Catalyst plans the equi key as a sort-merge join with the
    range predicate as a residual filter; nothing shuffles twice.
    ``secs_after`` floors both timestamps to epoch seconds
    (unix_timestamp in Spark, FLOOR(epoch()) in DuckDB) so sub-second
    payloads of the timestamp column never reach the compare.
    """
    e = load(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = views.join(
        clicks,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")).alias(
            "secs_after"
        ),
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup by event_id after injecting duplicates via
    self-union — mirrors the idempotent re-sync property of the
    reference (re-running a converged sync is all-noop,
    src/main.rs:159-164). Streaming twin: dropDuplicatesWithinWatermark."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    doubled = e.unionByName(e)
    return doubled.dropDuplicates(["event_id"])


@query(
    "q_rollup_hypertable",
    oracle="""
    WITH base AS (
        SELECT event_type,
               date_trunc('hour', ts) AS h,
               date_trunc('day', ts) AS d,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
    )
    SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
                WHEN GROUPING(d) = 0 THEN 'day'
                ELSE 'type' END AS grain,
           event_type,
           strftime(COALESCE(h, d), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM base
    GROUP BY GROUPING SETS ((event_type, h), (event_type, d), (event_type))
    """,
)
def q_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: the batch build
    of a continuous aggregate — hour buckets, day buckets, and the
    per-type total, computed in ONE pass over events via GROUPING SETS
    (a single Expand + partial/final hash agg, one shuffle; never
    three scans). At 100 TB this is the materialized-rollup shape:
    coarser grains merge from the finest by re-aggregating the hour
    rollup, so the raw table is read exactly once. The streaming twin
    (streaming/rollup.py) maintains just the watermarked hour grain
    and derives day/type grains by mergeable re-aggregation;
    tests/test_streaming.py proves stream+merge == this query."""
    e = load(spark, sf_dir, "events")
    e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        dec("value", 2).alias("v"),
    ).createOrReplaceTempView("v_events_rollup")
    return spark.sql(
        f"""
        SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                    WHEN grouping(d) = 0 THEN 'day'
                    ELSE 'type' END AS grain,
               event_type,
               date_format(COALESCE(h, d), '{_FMT}') AS bucket_start,
               COUNT(*) AS n_events,
               CAST(SUM(v) AS DOUBLE) AS sum_value
        FROM v_events_rollup
        GROUP BY GROUPING SETS ((event_type, h), (event_type, d), (event_type))
        """
    )


@query(
    "q_window_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), agg AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS sv
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           t.event_type,
           COALESCE(a.n, 0) AS n_events,
           CAST(COALESCE(a.sv, 0) AS DOUBLE) AS sum_value,
           a.n IS NULL AS filled
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type
    """,
)
def q_window_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled time buckets (the time_bucket_gapfill companion to
    q_rollup_hypertable): every (hour, event_type) cell across the
    table's full time range, zero-filled and flagged where no events
    landed. The raw table is touched by exactly two aggregations (the
    hour rollup + the 1-row bounds agg); the dense spine is generated,
    not scanned — sequence() explode of #hours x #types rows — and the
    rollup joins back against it broadcast. At 100 TB the spine stays
    tiny (it scales with the time range, not the data), so gap filling
    costs the same one shuffle the plain rollup does."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value", 2)).alias("sv"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(F.broadcast(agg), ["h", "event_type"], "left")
        .select(
            F.date_format("h", _FMT).alias("bucket_start"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sv"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.col("n").isNull().alias("filled"),
        )
    )


# Exact dyadic decay weights 2^-age for age 1..12 (one day per
# half-life step). Written as decimal literals so the weighted sum is
# EXACT decimal arithmetic in both engines — pow(2.0, -age) would be a
# double and the summation order would then matter. Shared verbatim by
# the Spark expression and the DuckDB oracle.
_DECAY_CASE = "CASE age " + " ".join(
    f"WHEN {k} THEN CAST('{__import__('decimal').Decimal(1) / (1 << k)}' "
    "AS DECIMAL(16,14))"
    for k in range(1, 13)
) + " END"


@query(
    "q_agg_decay",
    oracle=f"""
    WITH recent AS (
        SELECT event_type,
               date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') AS age,
               CAST(value AS DECIMAL(22,2)) AS v
        FROM events
        WHERE date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')
              BETWEEN 1 AND 12
    )
    SELECT event_type,
           COUNT(*) AS n_recent,
           CAST(CAST(SUM(v * {_DECAY_CASE}) * 409600 AS BIGINT) AS DOUBLE)
             / 409600.0 AS decayed_sum
    FROM recent GROUP BY event_type
    """,
)
def q_agg_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed recency-weighted aggregate (round 3) —
    the 'hotness' score a feature store or trending-topics job
    maintains: per event_type, SUM(value * 2^-age_days) anchored at
    2024-01-31 with a 1-day half-life and a 12-day horizon.

    Determinism at scale: the decay weights are exact dyadic DECIMAL
    literals (2^-k has exactly k decimal digits), so the weighted sum
    is exact decimal arithmetic — associative and commutative — and
    the result is bit-identical under any partitioning/merge order.
    The double form (pow(2.0,-age) * value) would drift with shuffle
    order. Every term is a multiple of 2^-12 * 10^-2, so the exact sum
    times 409600 is an INTEGER; the emitted double is that integer
    through ONE IEEE division — bit-identical in both engines (a
    direct DECIMAL(38,16)->DOUBLE cast risks double rounding, and wide
    decimals reach the driver's pandas compare as mismatched dtypes).
    Physical shape: map-side age filter inside the scan stage, one
    partial+final hash agg on a 5-value key — the same plan at any
    scale."""
    from fhir2sql_spark.queries.util import exact_div

    e = load(spark, sf_dir, "events")
    age = F.datediff(F.lit("2024-01-31").cast("date"), F.col("ts").cast("date"))
    recent = e.select(
        "event_type", age.alias("age"), dec("value", 2).alias("v")
    ).where(F.col("age").between(1, 12))
    scaled = (
        (F.sum(F.col("v") * F.expr(_DECAY_CASE)) * 409600)
        .cast("long")
        .alias("scaled")
    )
    return (
        recent.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_recent"), scaled)
        .select(
            "event_type",
            "n_recent",
            exact_div(F.col("scaled"), F.lit(409600)).alias("decayed_sum"),
        )
    )


@query(
    "q_downsample_m4",
    oracle="""
    WITH b AS (
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS bucket_start,
               event_id,
               CAST(value AS DECIMAL(18,2)) AS v,
               ts
        FROM events
    ), w AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_start
                                  ORDER BY ts, event_id) AS rf,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_start
                                  ORDER BY ts DESC, event_id DESC) AS rl
        FROM b
    )
    SELECT event_type, bucket_start,
           CAST(MIN(v) AS DOUBLE) AS v_min,
           CAST(MAX(v) AS DOUBLE) AS v_max,
           CAST(MIN(CASE WHEN rf = 1 THEN v END) AS DOUBLE) AS v_first,
           CAST(MIN(CASE WHEN rl = 1 THEN v END) AS DOUBLE) AS v_last,
           COUNT(*) AS n_points
    FROM w GROUP BY event_type, bucket_start
    """,
)
def q_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (round 3) — the error-free
    visualization/rollup reduction (Jugel et al., VLDB'14): per
    (series, time bucket) keep min, max, first and last values. The
    four extremes preserve every rendered pixel of a line chart while
    reducing a 100 TB raw stream to #buckets x #series rows — the
    standard first stage of a monitoring pipeline.

    Determinism: first/last tie-break on (ts, event_id) via min_by/
    max_by over a struct ordering (identical lexicographic struct
    comparison in both engines); values DECIMAL. One shuffle: a
    single partial+final hash agg on the (series, bucket) key — the
    min/max/first/last all fold map-side."""
    e = load(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), _FMT).alias("bucket_start"),
        dec("value", 2).alias("v"),
        F.struct("ts", "event_id").alias("ord"),
    )
    return b.groupBy("event_type", "bucket_start").agg(
        F.min("v").cast("double").alias("v_min"),
        F.max("v").cast("double").alias("v_max"),
        F.min_by("v", "ord").cast("double").alias("v_first"),
        F.max_by("v", "ord").cast("double").alias("v_last"),
        F.count(F.lit(1)).alias("n_points"),
    )
