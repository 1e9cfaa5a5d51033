"""Source-format breadth: the engine's loader is parquet-first
(TESTDATA.md), but a reference user also lands JSON-lines (the FHIR
wire shape) and CSV extracts. Round-trips must preserve values exactly
under explicit schemas — schema inference is deliberately not relied
on (inference samples data and can drift between files; at 100 TB the
schema is a contract, not a guess)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir2sql_spark.tables import load

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(df):
    return {
        tuple(r)
        for r in df.select("doc_id", "text", "lang", "source", "n_chars").collect()
    }


def test_jsonlines_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_json")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(_SCHEMA).json(out)
    assert _rows(back) == _rows(docs)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_csv")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").option("header", "true").option(
        "quoteAll", "true"
    ).csv(out)
    back = spark.read.schema(_SCHEMA).option("header", "true").csv(out)
    assert _rows(back) == _rows(docs)


def test_json_corrupt_record_tolerance(spark, tmp_path):
    """PERMISSIVE mode mirrors the reference's row-level tolerance
    (malformed resources skipped, not fatal — src/main.rs:210-225):
    corrupt lines land in the corrupt-record column instead of
    failing the read."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "{not json at all\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    # cache() first: Spark disallows queries that prune down to only
    # the internal corrupt-record column on a raw file scan
    df = (
        spark.read.schema("doc_id long, text string, _corrupt_record string")
        .json(str(p))
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the other columnar format Spark ships natively (hive
    ecosystems land it); exact round-trip under the same contract as
    parquet, including predicate pushdown on read."""
    out = str(tmp_path / "docs_orc")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.schema(_SCHEMA).orc(out)
    assert _rows(back) == _rows(docs)
    pushed = back.where(F.col("doc_id") < 10)
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(doc_id,10)" in plan
    assert pushed.count() == docs.where(F.col("doc_id") < 10).count()
