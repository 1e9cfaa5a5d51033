"""Query modules. Importing them registers queries into the registry."""

from __future__ import annotations

import importlib

_MODULES = (
    "scan",
    "sync",
    "joins",
    "aggs",
    "windows",
    "sort_setops",
    "scalars",
    "streaming_batch",
    "udfs",
    "llm",
    "relational_ext",
    "tpch",
    "training",
    "curation",
    "analysis",
    "behavior",
    "retrieval",
    "vocab",
    "selection",
    "diagnostics",
)


def load_all() -> None:
    for m in _MODULES:
        importlib.import_module(f"fhir2sql_spark.queries.{m}")
