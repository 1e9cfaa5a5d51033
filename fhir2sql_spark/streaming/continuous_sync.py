"""Continuous sync: the reference's daily batch loop as a streaming
pipeline.

The reference syncs by polling wall-clock time and re-running a full
snapshot diff (/root/reference/src/main.rs:390-411). The streaming
form consumes resource pages AS THEY ARRIVE: each micro-batch runs the
same extract → diff → apply pipeline (sync/pipeline.py) through
foreachBatch, checkpointed so restarts resume at the last committed
batch.

Delete semantics — the one place incremental and snapshot sync MUST
differ: a micro-batch is a window of the source, so a key's absence
from the batch carries no information. Micro-batches therefore apply
inserts/updates only (``apply_deletes=False``); deletions reconcile in
a periodic full-snapshot pass (run_sync), exactly like the reference's
daily run. Idempotence carries over: re-delivered micro-batches
re-diff against the mirror and classify as noop (at-least-once
delivery converges).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from fhir2sql_spark.sinks import jdbc_upsert
from fhir2sql_spark.sync import pipeline


def stream_sync(
    resources: DataFrame,
    connect_fn: Callable[[], object],
    table: str,
    checkpoint_dir: str,
    batch_size: int = 10_000,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously sync a streaming DataFrame of raw resource JSON
    strings (column ``resource``) into the mirror ``table``.

    Each micro-batch is one upsert-only sync_resources run; the
    mirror re-read per batch keeps the diff correct under concurrent
    external writes (the mirror, not driver state, is the source of
    truth — same property the reference relies on for its re-syncs).
    """
    jdbc_upsert.create_mirror_tables(connect_fn, [table])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline.sync_resources(
            batch_df.sparkSession,
            batch_df,
            connect_fn,
            table,
            batch_size=batch_size,
            apply_deletes=False,
        )

    writer = (
        resources.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
