"""Parquet table access for the synthetic star schema (TESTDATA.md).

``load`` is the single scan entry point for all queries so that
projection/filter pushdown behavior is uniform and auditable with
``.explain``. Tables are plain parquet files; at 100 TB these would be
partitioned datasets — the loader API is path-based so nothing changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamp determinism is a correctness requirement: date_format,
    # DATE casts, and timestamp literals all resolve against the
    # SESSION timezone, and the driver's session may carry any tz.
    # Every query funnels through this loader, so pin UTC here (it is
    # a runtime conf; verified session-dynamic). Without this, window
    # starts and probe literals shift by the session offset and the
    # oracle hash breaks (caught by a Pacific/Kiritimati preflight).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts may be parquet TIMESTAMP(NANOS) (round-1 generator),
        # which the Spark reader rejects unless read as long — then
        # integer-divided to micros (exact: whole-microsecond values;
        # int64 `DIV` avoids double rounding at ~1.7e18 ns epochs).
        # Newer generators emit TIMESTAMP(MICROS), which reads natively;
        # branch on the actual read type so both vintages work.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
