"""Partitioned storage layout: the write-side half of the 100 TB
posture. Writing partitionBy(lang) and filtering on lang at read time
must prune partitions at planning (PartitionFilters in the scan, only
matching directories touched) — the property that turns a 100 TB scan
into a per-partition one. Sorted-within-partition writes additionally
give min/max row-group statistics for finer pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir2sql_spark.tables import load


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = load(spark, sf_dir, "documents")
    (
        docs.repartition("lang")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("lang")
        .mode("overwrite")
        .parquet(out)
    )

    back = spark.read.parquet(out).where(F.col("lang") == "de")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan

    expected = docs.where(F.col("lang") == "de").count()
    assert back.count() == expected > 0

    # the partition filter appears as a pushed partition predicate,
    # not a post-scan Filter over the data column
    assert "PushedFilters: []" in plan or "Filter (lang" not in plan


def test_partitioned_write_roundtrip_content(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_roundtrip")
    docs = load(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    a = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b
