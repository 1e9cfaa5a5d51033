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


def test_semantic_index_pruned_by_touched_cells(spark, sf_dir, tmp_path):
    """q_dedup_semantic_inc's scale claim made checkable: with the base
    vector index STORED partitioned by cell, reading only the cells a
    batch touches is partition pruning at the scan — untouched cells'
    files are never opened (PartitionFilters + partition-count drop in
    the plan)."""
    from pyspark.sql import functions as F

    from fhir2sql_spark.operators import lattice
    from fhir2sql_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    qv = lattice.quantize(emb)
    cents = lattice.lattice_kmeans(qv, k=8, iters=1)
    code, cids = lattice._collect_codebook(cents)
    assigned = lattice._assign_cells(qv, code, cids)
    out = str(tmp_path / "semindex")
    assigned.write.partitionBy("cell").parquet(out)

    idx = spark.read.parquet(out)
    touched = [int(r["cell"]) for r in
               assigned.select("cell").distinct().limit(2).collect()]
    pruned = idx.where(F.col("cell").isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # only the touched cells' rows come back
    assert {r["cell"] for r in pruned.select("cell").distinct().collect()} \
        == set(touched)
