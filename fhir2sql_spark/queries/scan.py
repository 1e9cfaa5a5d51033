"""Scan / projection / filter / JSON-projection queries (SURVEY.md §2.3).

Mirrors the reference's scan surface: its COUNT pushdown
(/root/reference/src/main.rs:141-148), its projection-only mirror scan
(src/main.rs:50), and its JSON version extraction (src/main.rs:37-46,
``$.meta.versionId`` string -> int). All four plans push filters and
projections into the parquet scan (verified via .explain: PushedFilters
/ ReadSchema carry the predicates/columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.tables import load


@query(
    "q_scan_count",
    oracle="SELECT COUNT(*) AS n_rows FROM lineitem",
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) on lineitem — mirrors R4 (src/main.rs:141-148).

    Parquet metadata-only count: Catalyst rewrites to footer row-counts,
    so at 100 TB this reads no data pages.
    """
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection — mirrors the reference's 2-column mirror scan
    (src/main.rs:50). ReadSchema must show exactly these 4 columns."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS qty,
           CAST(l_extendedprice AS DOUBLE) AS price,
           l_returnflag,
           l_shipdate AS ship_date
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex conjunctive predicate; every leaf is pushdown-eligible."""
    l = load(spark, sf_dir, "lineitem")
    return l.where(
        F.col("l_shipdate").between("1996-01-01 00:00:00", "1997-12-31 00:00:00")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        "l_returnflag",
        F.col("l_shipdate").alias("ship_date"),
    )


@query(
    "q_project_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_project_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path projection + cast — mirrors R2's ``$.meta.versionId``
    string->int extraction (src/main.rs:37-46). Null-safe: missing paths
    yield NULL, not an error (the reference's skip-malformed policy)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )
