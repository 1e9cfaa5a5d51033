"""Bucketed co-located join: writing both sync snapshots bucketed by
the diff key eliminates BOTH exchanges from the repeated-sync join —
the PLANS.md-documented optimization for daily re-syncs at 100 TB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fhir2sql_spark.sync.diff import diff_snapshots
from fhir2sql_spark.tables import load


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    o = load(spark, sf_dir, "orders")
    src = o.where(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("res_key"),
        F.lit(1).cast("int").alias("src_version"),
    )
    mir = o.where(F.col("o_orderkey") % 10 != 7).select(
        F.col("o_orderkey").alias("res_key"),
        F.lit(1).cast("int").alias("mir_version"),
        F.col("o_orderkey").cast("bigint").alias("pk_id"),
    )
    for df, name in [(src, "b_src"), (mir, "b_mir")]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, "res_key")
            .sortBy("res_key")
            .option("path", f"{wh}/{name}")  # external: warehouse.dir is static
            .saveAsTable(name)
        )
    return spark


def test_bucketed_diff_join_has_no_exchange(warehouse):
    spark = warehouse
    src = spark.table("b_src")
    mir = spark.table("b_mir")
    tagged = diff_snapshots(src, mir)
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # co-located buckets: the join needs NO shuffle on either side
    assert "Exchange hashpartitioning" not in plan


def test_bucketed_diff_same_result(warehouse, sf_dir):
    spark = warehouse
    tagged = diff_snapshots(spark.table("b_src"), spark.table("b_mir"))
    counts = {
        r["op"]: r["n"]
        for r in tagged.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    o = load(spark, sf_dir, "orders")
    n = o.count()
    # keys ending in 7 -> insert; ending in 3 -> delete; versions equal
    # everywhere else -> noop (derivation in queries/sync.py)
    assert counts["insert"] == o.where(F.col("o_orderkey") % 10 == 7).count()
    assert counts["delete"] == o.where(F.col("o_orderkey") % 10 == 3).count()
    assert counts.get("update") is None
    assert counts["noop"] == n - counts["insert"] - counts["delete"]
