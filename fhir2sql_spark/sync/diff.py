"""Version-diff CDC classification — the reference's core operator (R5).

The reference builds a driver-side BTreeMap of the mirror and probes it
per source row (/root/reference/src/main.rs:49-75, 227-248), deriving
deletes as the residual map (src/main.rs:279-282). Semantics
(src/main.rs:159-175):

  - key only in source            -> insert
  - key in both, version differs  -> update  (source-wins: *any*
    difference, the reference tests `<` || `>`, src/main.rs:229-230)
  - key in both, version equal    -> noop
  - key only in mirror            -> delete

Spark-first re-expression: the BTreeMap (O(mirror) driver memory — the
reference's scale ceiling) becomes a distributed full-outer hash join
on the key. At 100 TB both snapshots shuffle-partition on `res_key`;
if either side is small Catalyst broadcasts it; AQE handles key skew.
No driver-side state of any kind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"
OP_NOOP = "noop"


def diff_snapshots(source: DataFrame, mirror: DataFrame) -> DataFrame:
    """Classify every key across two snapshots.

    ``source`` must have columns (res_key, src_version, ...payload);
    ``mirror`` must have (res_key, mir_version, ...e.g. pk_id).
    Returns one row per key in the union of key-sets with an ``op`` tag.
    The four tags partition the key universe (property-tested in
    tests/test_sync_properties.py).
    """
    s = source.withColumnRenamed("res_key", "s_key")
    m = mirror.withColumnRenamed("res_key", "m_key")
    joined = s.join(m, s.s_key == m.m_key, "full_outer")
    op = (
        F.when(F.col("m_key").isNull(), F.lit(OP_INSERT))
        .when(F.col("s_key").isNull(), F.lit(OP_DELETE))
        .when(F.col("src_version") != F.col("mir_version"), F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_NOOP))
    )
    return joined.withColumn(
        "res_key", F.coalesce(F.col("s_key"), F.col("m_key"))
    ).withColumn("op", op).drop("s_key", "m_key")
