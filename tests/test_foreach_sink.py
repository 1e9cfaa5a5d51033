"""foreachBatch -> sqlite sink: incremental delivery + replay
idempotence (keyed upsert absorbs at-least-once duplicates)."""

from __future__ import annotations

import sqlite3
from datetime import datetime, timedelta

import pytest

from fhir2sql_spark.streaming.foreach_sink import stream_events_to_table

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


@pytest.fixture()
def sqlite_db(tmp_path):
    path = str(tmp_path / "events.db")

    def connect():
        return sqlite3.connect(path, timeout=60, check_same_thread=False)

    return connect


def test_stream_lands_in_table_incrementally(spark, tmp_path, sqlite_db):
    base = datetime(2024, 1, 1)
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, SCHEMA)

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = stream_events_to_table(stream, sqlite_db, "events_mirror", ckpt)
        q.awaitTermination(120)
        q.stop()

    mk(
        [(i, base + timedelta(minutes=i), "click", 1.5 * i) for i in range(20)]
    ).write.mode("append").parquet(in_dir)
    drain()
    conn = sqlite_db()
    n1 = conn.execute("SELECT COUNT(*) FROM events_mirror").fetchone()[0]
    conn.close()
    assert n1 == 20

    # second batch: 10 new + 5 REPLAYED ids with identical payloads —
    # keyed upsert keeps the table exactly-once-shaped
    mk(
        [(i, base + timedelta(minutes=i), "click", 1.5 * i) for i in range(15, 30)]
    ).write.mode("append").parquet(in_dir)
    drain()
    conn = sqlite_db()
    n2 = conn.execute("SELECT COUNT(*) FROM events_mirror").fetchone()[0]
    vals = conn.execute(
        "SELECT value FROM events_mirror WHERE event_id = 17"
    ).fetchall()
    conn.close()
    assert n2 == 30
    assert vals == [(25.5,)]
