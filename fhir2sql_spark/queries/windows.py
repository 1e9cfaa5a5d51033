"""Window-function suite (SURVEY.md §2.3 q_window_*, q_topk_pergroup).

The reference has no window functions; this is new engine surface.
Every ordering carries a unique tie-break key (SURVEY determinism
rules). Physically each query is one shuffle on the partition key +
an in-partition sort — at 100 TB the partition key (custkey/user_id)
is high-cardinality so partitions stay balanced; WindowGroupLimit
(Spark >=3.5) prunes per-group top-k before the full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load
from fhir2sql_spark.queries.util import dec

_RANK_ORACLE = """
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           rn, rnk, drnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    ) t WHERE rn <= 3
"""


@query("q_window_rank", oracle=_RANK_ORACLE)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank over one window; keep top-3 rows."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(value AS DECIMAL(18,2))
                - CAST(COALESCE(LAG(value, 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id), 0)
                  AS DECIMAL(18,2)) AS DOUBLE) AS delta
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value delta vs the previous event (lag default 0)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.coalesce(F.lag("value", 1).over(w), F.lit(0))
    return e.select(
        "event_id",
        "user_id",
        (dec("value", 2) - prev.cast("decimal(18,2)"))
        .cast("double")
        .alias("delta"),
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_sum
    FROM events
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal sum with an explicit ROWS frame."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value", 2)).over(w).cast("double").alias("running_sum"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id
                 ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS hour_sum
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch seconds: trailing 1-hour sum per user.
    Range frames are value-based (peers included), so the result is
    deterministic without a tie-break."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value", 2)).over(w).cast("double").alias("hour_sum"),
    )


@query(
    "q_topk_pergroup",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k. Spark >=3.5 plans WindowGroupLimit: each
    partition keeps only k candidates before the shuffle-sort — the
    form that survives 100 TB (vs sorting every group fully)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )
