"""The sync pipeline — the fhir2sql-equivalent product (SURVEY §7 M4).

Orchestrates: source scan (bundle pages) -> version extraction ->
distributed diff vs the mirror snapshot -> parameterized sink
(insert/update/delete) -> count reconciliation; per-resource-type,
mirroring ``run_sync`` / ``sync_blaze_2_pg``
(/root/reference/src/main.rs:176-339) with the driver-side BTreeMap
replaced by the shuffle/broadcast join in sync/diff.py.

Invariants (property-tested in tests/test_sync_properties.py, from
the reference's doc comment src/main.rs:159-175):
  1. the four op tags partition the key universe;
  2. applying the diff converges the mirror to the source;
  3. re-sync of a converged mirror is all-noop (idempotence — the
     reference's daily re-run depends on this);
  4. diff(A, A) has no effects.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir2sql_spark.sinks import jdbc_upsert

# Parallelism of insert-pk allocation (buckets = concurrent tasks).
_PK_BUCKETS = 64
from fhir2sql_spark.sync.diff import OP_DELETE, OP_INSERT, OP_NOOP, OP_UPDATE, diff_snapshots
from fhir2sql_spark.sync.fhir import extract_versions, partition_malformed


@dataclass
class SyncStats:
    inserts: int
    updates: int
    deletes: int
    noops: int
    malformed: int
    source_count: int
    mirror_count_after: int

    @property
    def counts_match(self) -> bool:
        """The reference's post-sync reconciliation
        (src/main.rs:288-297) — warn-only there, surfaced here."""
        return self.source_count == self.mirror_count_after


def extract_mirror_versions(mirror_raw: DataFrame) -> DataFrame:
    """(pk_id|id, resource) -> (pk_id, res_key, mir_version), fully
    distributed — the version-extraction half of the reference's
    full-scan + BTreeMap build (src/main.rs:49-75). Accepts either
    column name for the pk so a raw ``SELECT id, resource`` JDBC frame
    plugs in unchanged. Unparseable rows are skipped (src/main.rs:60-63)
    via the null-extraction filter."""
    id_col = "pk_id" if "pk_id" in mirror_raw.columns else "id"
    ext = mirror_raw.select(
        F.col(id_col).cast("int").alias("pk_id"),
        F.get_json_object("resource", "$.id").alias("res_key"),
        F.get_json_object("resource", "$.meta.versionId")
        .try_cast("long")
        .alias("mir_version"),
    )
    return ext.where(
        F.col("res_key").isNotNull() & F.col("mir_version").isNotNull()
    )


def read_mirror_versions(
    spark: SparkSession, connect_fn: Callable[[], object], table: str
) -> DataFrame:
    """TEST-ONLY mirror snapshot: fetches the whole table through one
    driver-side connection (the in-process sqlite/duckdb databases are
    not visible to executors). This inherits the reference's BTreeMap
    scale ceiling by construction — production syncs must pass
    ``mirror_df`` to ``sync_resources`` (built from
    ``sources.jdbc.mirror_reader``'s range-partitioned read, or any
    distributed source) so the mirror never materializes on the
    driver."""
    conn = connect_fn()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT id, resource FROM {table}")  # noqa: S608
        rows = cur.fetchall()
    finally:
        conn.close()
    # normalize across drivers (the psql adapter fetches text)
    rows = [(int(r[0]), str(r[1])) for r in rows or []]
    df = spark.createDataFrame(rows or [], "pk_id int, resource string")
    return extract_mirror_versions(df)


def sync_resources(
    spark: SparkSession,
    source_resources: DataFrame,
    connect_fn: Callable[[], object],
    table: str,
    batch_size: int = 10_000,
    strategy: str = "batched",
    apply_deletes: bool = True,
    mirror_df: DataFrame | None = None,
    dialect: str = "ansi",
) -> SyncStats:
    """One full sync of raw source resources into the mirror table.

    ``dialect="pg"`` routes every emitted statement through the
    PostgreSQL dialect (%s paramstyle, ::jsonb casts — see
    sinks/pg_dialect.py); wire-verified against a real server in
    tests/test_pg_roundtrip.py.

    ``mirror_df`` is the PRODUCTION mirror-read seam: a distributed
    (pk_id|id, resource) DataFrame — typically
    ``sources.jdbc.mirror_reader(spark, cfg, lo, hi).load()``, a
    range-partitioned parallel JDBC scan — from which versions are
    extracted executor-side. When omitted, the test-only
    ``read_mirror_versions`` driver fetch is used (in-process
    databases are invisible to executors). This seam is what kills
    the reference's driver-memory BTreeMap ceiling (src/main.rs:49-75):
    with it, no step of the diff ever materializes the mirror on the
    driver.

    ``apply_deletes=False`` is the INCREMENTAL form: when the source
    DataFrame is one micro-batch (a page window, not the full
    snapshot), absence from the batch does not mean deletion, so
    mirror-only rows are left untouched and reported as 0 deletes.
    Continuous pipelines (streaming/continuous_sync.py) run upsert-only
    micro-batches plus a periodic full-snapshot pass for deletes.

    Source-wins semantics: ANY version difference overwrites with the
    source copy (the reference's `<`||`>`, src/main.rs:229-230).

    ``strategy``: 'batched' = per-partition parameterized executemany
    (parallel, independent transactions — the reference's flush model
    done right); 'merge' = load the tagged change-set into a staging
    table, then ONE set-based transaction applies update/insert/delete
    (atomic visibility — the preferred shape when the target supports
    it)."""
    extracted = extract_versions(source_resources)
    well_formed, malformed = partition_malformed(extracted)
    n_malformed = malformed.count()

    if mirror_df is not None:
        mirror = extract_mirror_versions(mirror_df)
    else:
        mirror = read_mirror_versions(spark, connect_fn, table)
    tagged = diff_snapshots(
        well_formed.select("res_key", "src_version", "resource"),
        mirror.select("res_key", "mir_version", "pk_id"),
    ).cache()

    # New pks for inserts: allocated deterministically above the
    # current max (the reference lets SERIAL do this; a distributed
    # sink needs explicit allocation to stay parallel). Allocation is
    # bucket-parallel: an unpartitioned row_number would pull every
    # insert through ONE task — on an initial full load that
    # serializes the whole dataset (round-1 advisor finding). Instead
    # hash res_key into _PK_BUCKETS buckets, row_number inside each
    # bucket (distributed), and add per-bucket offsets computed from
    # bucket counts (a _PK_BUCKETS-row driver-side cumsum). Ids are
    # dense in (bucket, res_key) order — deterministic across runs
    # and retries, just not globally res_key-sorted.
    max_pk = (mirror.agg(F.max("pk_id")).collect()[0][0]) or 0
    bucketed = tagged.where(F.col("op") == OP_INSERT).withColumn(
        "__bucket", F.pmod(F.xxhash64("res_key"), F.lit(_PK_BUCKETS)).cast("int")
    )
    counts = {
        r["__bucket"]: r["n"]
        for r in bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_col = F.coalesce(
        *[F.when(F.col("__bucket") == b, F.lit(off)) for b, off in offsets.items()],
        F.lit(0),
    ) if offsets else F.lit(0)
    w_bucket = Window.partitionBy("__bucket").orderBy("res_key")
    inserts = (
        bucketed.withColumn(
            "pk_id",
            (F.row_number().over(w_bucket) + offset_col + F.lit(max_pk)).cast("int"),
        )
        .select("pk_id", "resource")
    )
    updates = tagged.where(F.col("op") == OP_UPDATE).select("resource", "pk_id")
    deletes = tagged.where(F.col("op") == OP_DELETE).select("pk_id")
    if not apply_deletes:
        deletes = deletes.limit(0)

    stats_rows = {
        r["op"]: r["n"]
        for r in tagged.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not apply_deletes:
        stats_rows[OP_DELETE] = 0

    if strategy == "merge":
        stage = f"{table}__stage"
        staged = (
            inserts.select("pk_id", F.lit("insert").alias("op"), "resource")
            .unionByName(
                updates.select("pk_id", F.lit("update").alias("op"), "resource")
            )
            .unionByName(
                deletes.select(
                    "pk_id",
                    F.lit("delete").alias("op"),
                    F.lit(None).cast("string").alias("resource"),
                )
            )
        )
        conn = connect_fn()
        try:
            cur = conn.cursor()
            cur.execute(f"DROP TABLE IF EXISTS {stage}")  # noqa: S608
            cur.execute(
                f"CREATE TABLE {stage} (pk_id INT, op TEXT, resource TEXT)"  # noqa: S608
            )
            conn.commit()
        finally:
            conn.close()
        ph = "%s, %s, %s" if dialect == "pg" else "?, ?, ?"
        jdbc_upsert.foreach_partition_write(
            staged,
            f"INSERT INTO {stage} (pk_id, op, resource) VALUES ({ph})",  # noqa: S608
            connect_fn,
            batch_size,
        )
        jdbc_upsert.merge_stage_into_target(
            connect_fn, table, stage, dialect=dialect
        )
        conn = connect_fn()
        try:
            conn.cursor().execute(f"DROP TABLE IF EXISTS {stage}")  # noqa: S608
            conn.commit()
        finally:
            conn.close()
    else:
        jdbc_upsert.apply_changeset(
            inserts, updates, deletes, table, connect_fn, batch_size,
            dialect=dialect,
        )

    conn = connect_fn()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT COUNT(*) FROM {table}")  # noqa: S608
        mirror_after = int(cur.fetchone()[0])
    finally:
        conn.close()
    src_count = well_formed.count()
    tagged.unpersist()
    return SyncStats(
        inserts=stats_rows.get(OP_INSERT, 0),
        updates=stats_rows.get(OP_UPDATE, 0),
        deletes=stats_rows.get(OP_DELETE, 0),
        noops=stats_rows.get(OP_NOOP, 0),
        malformed=n_malformed,
        source_count=src_count,
        mirror_count_after=mirror_after,
    )


def run_sync(
    spark: SparkSession,
    sources_by_type: dict[str, DataFrame],
    connect_fn: Callable[[], object],
    table_prefix: str = "",
    batch_size: int = 10_000,
    mirror_by_type: dict[str, DataFrame] | None = None,
    parallel: bool = False,
    dialect: str = "ansi",
) -> dict[str, SyncStats]:
    """Per-type orchestration (R10, src/main.rs:303-339): bootstrap
    DDL idempotently, then sync each resource type. The reference is
    strictly sequential (src/main.rs:319-325); types are independent,
    so ``parallel=True`` submits them as concurrent Spark jobs from
    one thread per type — the SparkSession schedules them side by
    side, overlapping each type's scan/shuffle with another's JDBC
    writes. Safe because every type owns its table and its
    ``<table>__stage``; ``connect_fn`` must hand out a fresh
    connection per call (it already must for executor use).
    ``mirror_by_type`` optionally supplies a distributed mirror
    DataFrame per resource type (the production JDBC-read path — see
    ``sync_resources``)."""
    tables = {
        rt: f"{table_prefix}{rt.lower()}" for rt in sources_by_type
    }  # lowercase table naming, src/main.rs:185
    jdbc_upsert.create_mirror_tables(
        connect_fn, list(tables.values()), dialect=dialect
    )
    mirrors = mirror_by_type or {}
    if not parallel:
        return {
            rt: sync_resources(
                spark, df, connect_fn, tables[rt], batch_size,
                mirror_df=mirrors.get(rt), dialect=dialect,
            )
            for rt, df in sources_by_type.items()
        }
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(sources_by_type)) as pool:
        futures = {
            rt: pool.submit(
                sync_resources, spark, df, connect_fn, tables[rt],
                batch_size, mirror_df=mirrors.get(rt), dialect=dialect,
            )
            for rt, df in sources_by_type.items()
        }
        return {rt: f.result() for rt, f in futures.items()}
