"""User-facing SQL entry point: register the star schema as views and
run arbitrary SQL against it.

The registry's ``queries()`` are the verified showcase; this is the
door for everything else — a user migrating off the reference points
``sf_dir`` at their data and keeps writing SQL. Views go through
``tables.load`` (so the TIMESTAMP(NANOS) events fix and the pinned
UTC session timezone apply to ad-hoc SQL exactly as they do to the
curated queries), and Catalyst sees plain parquet scans underneath —
pushdown/pruning work unchanged through the view layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fhir2sql_spark.tables import TABLES, load


def open_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a session temp view."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: open the catalog (idempotent) and run ``query``."""
    open_catalog(spark, sf_dir)
    return spark.sql(query)
