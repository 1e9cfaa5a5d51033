"""foreachBatch -> relational sink: the streaming write path (M5).

Connects Structured Streaming to the parameterized relational sink
(sinks/jdbc_upsert.py): every micro-batch lands through the same
batched, per-partition, transactional writes the batch pipeline uses —
replacing the reference's poll-loop + hand-batched SQL
(/root/reference/src/main.rs:199-270) with an incremental, checkpointed
pipeline.

Idempotence note: foreachBatch offers at-least-once delivery; the
writer is keyed (INSERT OR REPLACE) so micro-batch replays after a
failure converge instead of duplicating — the streaming analogue of
the reference's re-sync idempotence (src/main.rs:159-164).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from fhir2sql_spark.sinks.jdbc_upsert import foreach_partition_write

UPSERT_EVENT_SQL = (
    "INSERT OR REPLACE INTO {table} (event_id, ts, event_type, value)"
    " VALUES (?, ?, ?, ?)"
)

EVENTS_SINK_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
    event_id INTEGER PRIMARY KEY,
    ts TIMESTAMP,
    event_type TEXT,
    value REAL
)
"""


def stream_events_to_table(
    events: DataFrame,
    connect_fn: Callable[[], object],
    table: str,
    checkpoint_dir: str,
    batch_size: int = 10_000,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a streaming events DataFrame (event_id, ts, event_type,
    value) into a relational table via foreachBatch + keyed upsert.

    Each micro-batch write is partition-parallel; the checkpoint
    records the batch id, so restarts resume from the last committed
    micro-batch and replays are absorbed by the keyed upsert."""
    conn = connect_fn()
    try:
        conn.cursor().execute(EVENTS_SINK_DDL.format(table=table))
        conn.commit()
    finally:
        conn.close()

    sql = UPSERT_EVENT_SQL.format(table=table)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(
            "event_id",
            batch_df["ts"].cast("string"),
            "event_type",
            "value",
        )
        foreach_partition_write(rows, sql, connect_fn, batch_size)

    writer = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
