"""Behavioral analytics over the events stream (round-5 additions to
SURVEY.md §2.4): rolling-window distinct actives and last-touch
revenue attribution.

The reference (samply/fhir2sql — a 624-line Rust sync daemon,
src/main.rs) has no analytics surface; these extend the engine's
warehouse inventory with the two event-stream primitives SQL windows
cannot express directly: sliding COUNT(DISTINCT) (no `COUNT(DISTINCT)
OVER` exists in any engine) and as-of attribution joins.

Determinism rules per queries/util.py: exact integer/decimal sums
before any double cast, formatted timestamps, tie-broken as-of
matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir2sql_spark.operators.asof import asof_join_sorted
from fhir2sql_spark.operators.rolling import rolling_distinct
from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load
from fhir2sql_spark.queries.util import dec

_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "q_rolling_active",
    oracle="""
    WITH hu AS (
        SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ),
    grid AS (SELECT DISTINCT h FROM hu)
    SELECT strftime(grid.h, '%Y-%m-%d %H:%M:%S') AS bucket,
           COUNT(DISTINCT hu.user_id) AS n_distinct
    FROM grid JOIN hu
      ON hu.h <= grid.h AND hu.h >= grid.h - INTERVAL 23 HOUR
    GROUP BY grid.h
    """,
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour active users at hourly grain — the exact
    sliding COUNT(DISTINCT) in sweep-line form (operators/rolling.py):
    pre-dedup to (hour, user), merge each user's coverage intervals
    into islands, emit a ±1 difference array, and read the answer off
    one distributed prefix sum over the time-span-sized delta stream.
    O(distinct (hour,user)) work, flat in the window width — no
    ×window explode, no corpus-wide distinct aggregation (306 → 56.7 s
    at sf100). The trailing window is inclusive of the current hour
    (23 preceding + current)."""
    e = load(spark, sf_dir, "events")
    r = rolling_distinct(e, "ts", "user_id", grain="hour", window_buckets=24)
    return r.select(
        F.date_format("bucket", _FMT).alias("bucket"), "n_distinct"
    )


@query(
    "q_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts, event_type, event_id
        FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    a AS (
        SELECT p.event_id, p.v,
               (SELECT t.event_type FROM t
                WHERE t.user_id = p.user_id
                  AND t.ts <= p.ts
                  AND t.ts >= p.ts - INTERVAL 3 DAY
                ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS channel
        FROM p
    )
    SELECT COALESCE(channel, 'organic') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(v) AS DOUBLE) AS revenue
    FROM a GROUP BY 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits the most
    recent view/click/signup by the same user within 3 days (ties on
    timestamp break to the largest touch event_id — the asof
    operator's backward tie rule); purchases with no eligible touch
    fall to 'organic'.

    Plan shape (r12): ONE LEFT-OUTER merge-sorted as-of join
    (operators/asof.py asof_join_sorted how="left" — single shuffle on
    user_id, |purchases| + |touches| intermediate, no candidate
    blow-up); unmatched purchases read their 'organic' bucket off the
    SAME pass via coalesce. The r11 form re-derived the whole as-of
    pipeline a second time under a left-anti join to recover the
    organic rows (two full event scans + three extra exchanges —
    guide §2.4); matched/unmatched partition the purchase set by
    construction, so the left flavor is result-identical. Revenue sums
    stay exact decimal until the final double cast (util.py rules)."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", dec("value", 2).alias("v")
    )
    touches = e.where(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("touch_id"),
    )
    att = asof_join_sorted(
        purchases,
        touches,
        on="user_id",
        left_ts="ts",
        right_ts="touch_ts",
        probe_key="event_id",
        tie_break="touch_id",
        direction="backward",
        tolerance="3 days",
        how="left",
    ).select(
        "v", F.coalesce("channel", F.lit("organic")).alias("channel")
    )
    return att.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v").cast("double").alias("revenue"),
    )
