"""FHIR resource envelope extraction (R2) — Spark rendering.

The reference parses ``$.id`` and ``$.meta.versionId`` (a JSON
*string*) per resource, returning None on any absence
(/root/reference/src/main.rs:37-46); unparseable mirror rows are
skipped with a warning (src/main.rs:60-63). Here both are one
vectorized projection; rows failing extraction carry NULLs and are
split off by ``partition_malformed`` (row-level tolerance,
stage-level fail-fast — SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_versions(resources: DataFrame, resource_col: str = "resource") -> DataFrame:
    """Project (res_key, src_version, resource) from raw JSON strings.

    ``$.meta.versionId`` arrives as a JSON string and is cast to long
    (src/main.rs:39: ``as_str() -> parse::<i64>()``); try_cast because
    a non-numeric value must yield NULL (the reference's skip path,
    src/main.rs:219-225) — ANSI mode would otherwise fail the stage.
    """
    c = F.col(resource_col)
    return resources.select(
        F.get_json_object(c, "$.id").alias("res_key"),
        F.get_json_object(c, "$.meta.versionId").try_cast("long").alias("src_version"),
        c.alias("resource"),
    )


def partition_malformed(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(well_formed, malformed): a resource is well-formed iff both id
    and versionId extracted (get_version() -> Some, src/main.rs:41-45)."""
    ok = F.col("res_key").isNotNull() & F.col("src_version").isNotNull()
    return extracted.where(ok), extracted.where(~ok)
