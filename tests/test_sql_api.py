"""fhir2sql_spark.api: ad-hoc SQL over the registered star schema
must agree with DuckDB on the same statement, and pushdown must reach
the scans through the view layer."""

from __future__ import annotations

import duckdb
import pytest

from fhir2sql_spark.api import open_catalog, sql
from fhir2sql_spark.tables import TABLES

ADHOC = """
SELECT n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY n_name
"""


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_adhoc_sql_matches_duckdb(spark, sf_dir, duck):
    got = sorted(tuple(r) for r in sql(spark, sf_dir, ADHOC).collect())
    want = sorted(tuple(r) for r in duck.execute(ADHOC).fetchall())
    assert got == want
    assert len(got) > 0


def test_pushdown_reaches_scan_through_views(spark, sf_dir):
    open_catalog(spark, sf_dir)
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "o_orderpriority" in plan


def test_all_tables_registered(spark, sf_dir):
    open_catalog(spark, sf_dir)
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() >= 0


def test_adhoc_sql_unknown_table_errors(spark, sf_dir):
    """The error path a migrating user hits first: a typo'd table name
    must fail analysis with the standard not-found error, not return
    an empty or stale view."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        sql(spark, sf_dir, "SELECT * FROM lineitems_typo LIMIT 1").collect()
