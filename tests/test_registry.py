"""Registry-level invariants + smoke execution of every query at
sf0.001 (the t1-scale gate; oracle parity runs in
tests/test_oracle_parity.py at the same scale)."""

from __future__ import annotations

import pytest

from fhir2sql_spark import registry

registry.load_all()


def test_all_queries_have_unique_names():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))


def test_oracle_keys_subset_of_queries():
    assert set(registry.ORACLE) <= set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_runs_and_has_rows(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    # stable schema + executable plan + non-negative rows
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
