"""applyInPandasWithState operator: cross-batch state accumulation
verified against the batch ground truth."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from fhir2sql_spark.streaming.stateful import user_totals_stream

SCHEMA = "user_id long, ts timestamp, value double"


def test_state_accumulates_across_batches(spark, tmp_path):
    # each shuffle partition gets its own state store; 32 of them make
    # this tiny test spend minutes on store setup — shrink to 4
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _run(spark, tmp_path)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run(spark, tmp_path):
    base = datetime(2024, 1, 1)
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [
            (1, base, 1.25),
            (1, base + timedelta(minutes=1), 2.50),
            (2, base, 10.00),
        ],
        SCHEMA,
    )
    batch2 = spark.createDataFrame(
        [
            (1, base + timedelta(minutes=5), 0.25),
            (3, base + timedelta(minutes=5), 7.00),
        ],
        SCHEMA,
    )

    out_dir = str(tmp_path / "out")

    def drain() -> None:
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (
            user_totals_stream(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    def latest() -> dict[int, tuple[int, int]]:
        rows = spark.read.parquet(out_dir).collect()
        best: dict[int, tuple[int, int]] = {}
        for r in rows:
            cur = best.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                best[r["user_id"]] = (r["n_events"], r["value_cents"])
        return best

    batch1.write.mode("append").parquet(in_dir)
    drain()
    first = latest()
    assert first[1] == (2, 375)
    assert first[2] == (1, 1000)

    batch2.write.mode("append").parquet(in_dir)
    drain()
    cur = latest()
    # user 1's state carried across the restart: 2 events + 1 new
    assert cur[1] == (3, 400)
    assert cur[2] == (1, 1000)
    assert cur[3] == (1, 700)
