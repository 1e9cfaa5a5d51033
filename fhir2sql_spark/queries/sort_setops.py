"""Sort / limit / top-k and set operations (SURVEY.md §2.3).

The reference's only ordering is the incidental BTreeMap iteration
(/root/reference/src/main.rs:55); its set algebra is the diff itself
(inserts = source∖mirror, deletes = mirror∖source). Declared here as
first-class operators.

Scale notes: global sort-limit compiles to TakeOrderedAndProject
(per-partition top-k + driver merge of k-sized heaps — no global
sort); set ops are hash-partitioned aggregates/joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderdate AS order_date,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_orderdate DESC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 500
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering + limit. The unique
    o_orderkey tie-break makes the selected set deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.desc_nulls_last("o_orderdate"),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(500)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )


@query(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 — TakeOrderedAndProject (k-heap per partition,
    merge on driver; never a full sort)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
    )


_HIGH = "SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders WHERE o_totalprice > 300000"
_VERY_HIGH = "SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders WHERE o_totalprice > 400000"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    high = o.where(F.col("o_totalprice") > 300000).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    very_high = o.where(F.col("o_totalprice") > 400000).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    return high, very_high


@query("q_union_all", oracle=f"{_HIGH} UNION ALL {_VERY_HIGH}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: overlapping slices kept duplicated (no shuffle at
    all — pure concatenation of partitions)."""
    high, very_high = _slices(spark, sf_dir)
    return high.unionByName(very_high)


@query("q_union_distinct", oracle=f"{_HIGH} UNION {_VERY_HIGH}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: concatenation + hash-dedup shuffle."""
    high, very_high = _slices(spark, sf_dir)
    return high.unionByName(very_high).distinct()


_P96 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
_P98 = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"


def _periods(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    p96 = (
        o.where(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1997-01-01 00:00:00")
        )
        .select("o_custkey")
        .distinct()
    )
    p98 = (
        o.where(
            (F.col("o_orderdate") >= "1998-01-01 00:00:00")
            & (F.col("o_orderdate") < "1999-01-01 00:00:00")
        )
        .select("o_custkey")
        .distinct()
    )
    return p96, p98


@query("q_intersect", oracle=f"{_P96} INTERSECT {_P98}")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1996 and 1998."""
    p96, p98 = _periods(spark, sf_dir)
    return p96.intersect(p98)


@query("q_except", oracle=f"{_P96} EXCEPT {_P98}")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1996 but not 1998 (distinct EXCEPT)."""
    p96, p98 = _periods(spark, sf_dir)
    return p96.exceptAll(p98).distinct()
