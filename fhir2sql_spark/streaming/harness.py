"""Structured Streaming harness (SURVEY §7 M5).

Replaces the reference's poll-scheduler loop
(/root/reference/src/main.rs:390-411: 60s tokio interval gated on
03:00 wall clock) with incremental triggers: a file-source stream +
``Trigger.AvailableNow`` drains all pending input and stops — the
exact semantics the reference's daily batch wants, minus the
double-fire window its minute-equality gate allows (SURVEY §2.1 R15).

Utilities here power the streaming-batch equivalence tests: run any
batch-defined transformation as a stream over the same data and
compare results; replay a two-batch late-data scenario to observe
watermark drops deterministically.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def run_stream_available_now(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Run ``transform`` over a parquet file-source stream of
    ``input_dir``, drain with AvailableNow into an in-memory sink, and
    return the result as a DataFrame."""
    name = f"q_{abs(hash((input_dir, schema, output_mode))) % 10**9}"
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    out = transform(stream)
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        q.stop()
        return spark.table(name)


def replay_two_batches(
    spark: SparkSession,
    batch1: DataFrame,
    batch2: DataFrame,
    schema: str,
    transform: Callable[[DataFrame], DataFrame],
    input_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Deterministic two-batch replay: write batch1, drain; write
    batch2, drain the same checkpointed query again. Watermarks only
    advance between triggers, so late rows in batch2 are observably
    dropped (SURVEY §5.2-3 requirement). Returns the sink contents.

    The sink is a parquet file sink — the memory sink cannot resume
    from a checkpoint, and resuming is the whole point here."""
    out_dir = checkpoint_dir + "_out"

    def drain() -> None:
        stream = spark.readStream.schema(schema).parquet(input_dir)
        q = (
            transform(stream)
            .writeStream.format("parquet")
            .outputMode(output_mode)
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    batch1.write.mode("append").parquet(input_dir)
    drain()
    batch2.write.mode("append").parquet(input_dir)
    drain()
    return spark.read.parquet(out_dir)
