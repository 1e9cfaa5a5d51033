"""Sync-semantics queries (SURVEY.md §2.3 M1) — the reference's CDC
diff re-expressed over derived snapshots of `orders`.

Snapshot derivation (deterministic, per SURVEY.md §2.3):
  source: keys with o_orderkey % 10 != 3, version 1 + (o_orderkey % 7 == 0)
  mirror: keys with o_orderkey % 10 != 7, version 1, pk_id = o_orderkey

So keys ending in 3 exist only in the mirror (deletes), keys ending in
7 only in the source (inserts), multiples of 7 with both -> updates.
Mirrors /root/reference/src/main.rs:227-248 (classification),
:279-282 (residual deletes), :288-297 (count reconciliation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir2sql_spark.registry import query
from fhir2sql_spark.sync.diff import diff_snapshots
from fhir2sql_spark.tables import load

_SRC_SQL = """
    SELECT o_orderkey AS res_key,
           CAST(1 + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS INT) AS src_version
    FROM orders WHERE o_orderkey % 10 <> 3
"""
_MIR_SQL = """
    SELECT o_orderkey AS res_key,
           CAST(1 AS INT) AS mir_version,
           CAST(o_orderkey AS BIGINT) AS pk_id
    FROM orders WHERE o_orderkey % 10 <> 7
"""


def _source(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("res_key"),
        (
            F.lit(1)
            + F.when(F.col("o_orderkey") % 7 == 0, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("int")
        .alias("src_version"),
    )


def _mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 10 != 7).select(
        F.col("o_orderkey").alias("res_key"),
        F.lit(1).cast("int").alias("mir_version"),
        F.col("o_orderkey").cast("bigint").alias("pk_id"),
    )


@query(
    "q_sync_diff_full",
    oracle=f"""
    WITH src AS ({_SRC_SQL}), mir AS ({_MIR_SQL})
    SELECT COALESCE(s.res_key, m.res_key) AS res_key,
           s.src_version, m.mir_version,
           CASE WHEN m.res_key IS NULL THEN 'insert'
                WHEN s.res_key IS NULL THEN 'delete'
                WHEN s.src_version <> m.mir_version THEN 'update'
                ELSE 'noop' END AS op
    FROM src s FULL OUTER JOIN mir m ON s.res_key = m.res_key
    """,
)
def q_sync_diff_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core operator: full-outer diff join + CDC tag (R5)."""
    return diff_snapshots(_source(spark, sf_dir), _mirror(spark, sf_dir)).select(
        "res_key", "src_version", "mir_version", "op"
    )


@query(
    "q_sync_inserts",
    oracle=f"""
    WITH src AS ({_SRC_SQL}), mir AS ({_MIR_SQL})
    SELECT s.res_key, s.src_version FROM src s
    WHERE NOT EXISTS (SELECT 1 FROM mir m WHERE m.res_key = s.res_key)
    """,
)
def q_sync_inserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert branch = source-minus-mirror anti join
    (src/main.rs:243-247)."""
    src, mir = _source(spark, sf_dir), _mirror(spark, sf_dir)
    return src.join(mir, "res_key", "left_anti").select("res_key", "src_version")


@query(
    "q_sync_deletes",
    oracle=f"""
    WITH src AS ({_SRC_SQL}), mir AS ({_MIR_SQL})
    SELECT m.res_key, m.pk_id FROM mir m
    WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.res_key = m.res_key)
    """,
)
def q_sync_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete branch = mirror-minus-source (the reference's residual
    BTreeMap, src/main.rs:279-282)."""
    src, mir = _source(spark, sf_dir), _mirror(spark, sf_dir)
    return mir.join(src, "res_key", "left_anti").select("res_key", "pk_id")


@query(
    "q_sync_updates",
    oracle=f"""
    WITH src AS ({_SRC_SQL}), mir AS ({_MIR_SQL})
    SELECT s.res_key, m.pk_id, s.src_version, m.mir_version
    FROM src s JOIN mir m ON s.res_key = m.res_key
    WHERE s.src_version <> m.mir_version
    """,
)
def q_sync_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update branch = inner join + version inequality, carrying the
    mirror pk (src/main.rs:229-238; `<`||`>` == `!=`, source-wins)."""
    src, mir = _source(spark, sf_dir), _mirror(spark, sf_dir)
    return (
        src.join(mir, "res_key")
        .where(F.col("src_version") != F.col("mir_version"))
        .select("res_key", "pk_id", "src_version", "mir_version")
    )


@query(
    "q_cdc_scd2",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM ordered
    ),
    hist AS (
        SELECT user_id, run_id, MIN(event_type) AS event_type,
               MIN(ts) AS valid_from, COUNT(*) AS n_events
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             IS NULL AS is_current,
           n_events
    FROM hist
    """,
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build — the CDC diff
    (R5) projected into time: per user, collapse consecutive runs of
    equal event_type into validity intervals [valid_from, valid_to)
    with an is_current flag. The reference only ever materializes the
    LATEST state (source-wins overwrite, src/main.rs:229-238); this is
    what replacing its UPDATE with an interval-close + insert yields.

    Shape: one shuffle on user_id, then three window passes over the
    same (user_id | ts, event_id) ordering — Spark keeps them in a
    single sort within one exchange. Deterministic: the (ts, event_id)
    tie-break totally orders each partition."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    hist = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    valid_to = F.lead("valid_from").over(w2)
    return hist.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


@query(
    "q_count_reconcile",
    oracle=f"""
    WITH src AS ({_SRC_SQL}), mir AS ({_MIR_SQL})
    SELECT (SELECT COUNT(*) FROM src) AS src_count,
           (SELECT COUNT(*) FROM mir) AS mir_count,
           (SELECT COUNT(*) FROM src) = (SELECT COUNT(*) FROM mir) AS counts_match
    """,
)
def q_count_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-sync cardinality assertion (R9, src/main.rs:288-297) —
    warn-only in the reference, emitted as a boolean column here."""
    src_n = _source(spark, sf_dir).agg(F.count(F.lit(1)).alias("src_count"))
    mir_n = _mirror(spark, sf_dir).agg(F.count(F.lit(1)).alias("mir_count"))
    return src_n.crossJoin(mir_n).select(
        "src_count",
        "mir_count",
        (F.col("src_count") == F.col("mir_count")).alias("counts_match"),
    )
