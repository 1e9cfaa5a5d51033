"""Query registry backing ``__spark_entry__.py``.

Each query from SURVEY.md §2.3 registers itself here with:
  - a PySpark callable ``(spark, sf_dir) -> DataFrame``
  - optionally, the equivalent DuckDB SQL (the correctness oracle).

Queries with no oracle get the driver's weaker rows-only check
(documented per-query in SURVEY.md §2.3's Oracle column).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    from fhir2sql_spark import queries  # noqa: F401

    queries.load_all()
