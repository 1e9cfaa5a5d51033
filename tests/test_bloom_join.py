"""Runtime bloom-filter join pruning (q_join_bloom): Catalyst's
InjectRuntimeFilter must land a `might_contain` predicate on the FACT
side's scan stage — semi-join reduction computed from the filtered dim
side, without shuffling the fact table. Also proves the query's conf
save/restore leaves the session untouched and the pruned plan returns
the same rows as the conf-default (broadcast) plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir2sql_spark.queries.joins import q_join_bloom
from fhir2sql_spark.tables import load


def _bloom_plan(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .count()
    )


def test_bloom_filter_lands_on_fact_scan(spark, sf_dir):
    app_key = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_app = spark.conf.get(app_key, None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(app_key, "65536")
        plan = (
            _bloom_plan(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        if saved_app is None:
            spark.conf.unset(app_key)
        else:
            spark.conf.set(app_key, saved_app)
    assert "might_contain" in plan, plan
    # the bloom probe guards the fact side's l_orderkey, pre-exchange
    assert "might_contain" in plan and "l_orderkey" in plan.split("might_contain", 1)[1][:200]


def test_bloom_query_matches_default_plan_and_restores_confs(spark, sf_dir):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    got = {
        (r["l_returnflag"], r["n_items"], r["sum_price"])
        for r in q_join_bloom(spark, sf_dir).collect()
    }
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before

    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    ref = {
        (r["l_returnflag"], r["n_items"], r["sum_price"])
        for r in (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("decimal(18,4)")
                .cast("double")
                .alias("sum_price"),
            )
        ).collect()
    }
    assert got == ref and got
