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
        return _load_events(spark, os.path.join(sf_dir, "events.parquet"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Read events.parquet with a vintage-independent ``ts`` type.

    events.ts may be parquet TIMESTAMP(NANOS) (round-1 generator), which
    the Spark reader rejects outright ([PARQUET_TYPE_ILLEGAL]); newer
    generators emit TIMESTAMP(MICROS, isAdjustedToUTC=false), which reads
    natively as TIMESTAMP_NTZ. Try the plain read first and enable
    ``spark.sql.legacy.parquet.nanosAsLong`` only on the nanos rejection,
    restoring its prior value immediately after the read (safe: the scan's
    hadoop conf is captured at ``read.parquet`` time, so later execution
    does not re-consult the session conf — verified empirically).

    The legacy branch integer-divides to micros (exact for whole-micro
    values; int64 ``DIV`` avoids double rounding at ~1.7e18 ns epochs)
    and casts to TIMESTAMP_NTZ — lossless under the pinned UTC session tz
    — so the Spark type of ``ts``, and hence the output schema of every
    query projecting it, is the same for both generator vintages.
    """
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # AnalysisException: PARQUET_TYPE_ILLEGAL
        if "NANOS" not in str(exc).upper():
            raise
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
    return df.withColumn(
        "ts", F.expr("cast(timestamp_micros(ts DIV 1000) as timestamp_ntz)")
    )
