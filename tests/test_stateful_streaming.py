"""applyInPandasWithState operator: cross-batch state accumulation
verified against the batch ground truth."""

from __future__ import annotations

import pytest

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


class _FakeState:
    """Minimal GroupState stand-in for closure-level tests."""

    def __init__(self):
        self.hasTimedOut = False
        self.exists = False
        self.get = None
        self.updates: list[tuple] = []
        self.timeout_ms: int | None = None
        self.removed = False

    def update(self, v):
        self.updates.append(v)

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms

    def remove(self):
        self.removed = True


def test_idle_timeout_flag_is_bound_into_closure():
    """Round-1 advisor finding: the timeout flag used to be a module
    global mutated on the driver — executors re-import the module and
    see the default, so timeouts silently never fire. The flag must be
    captured in the serialized function itself: calling the built
    update fn (as a worker would after unpickling) must call
    setTimeoutDuration iff idle_timeout was requested."""
    import pandas as pd
    from pyspark import cloudpickle as pickle  # what Spark ships closures with

    from fhir2sql_spark.streaming.stateful import _make_update_fn

    pdf = pd.DataFrame(
        {"user_id": [7, 7], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
         "value": [1.25, 2.50]}
    )

    for idle, want_ms in ((True, 3600 * 1000), (False, None)):
        fn = pickle.loads(pickle.dumps(_make_update_fn(idle)))
        state = _FakeState()
        out = list(fn((7,), iter([pdf]), state))
        assert state.timeout_ms == want_ms
        assert state.updates == [(2, 375)]
        assert len(out) == 1 and int(out[0]["value_cents"][0]) == 375


def test_timed_out_state_is_removed():
    from fhir2sql_spark.streaming.stateful import _make_update_fn

    fn = _make_update_fn(True)
    state = _FakeState()
    state.hasTimedOut = True
    assert list(fn((7,), iter([]), state)) == []
    assert state.removed


@pytest.mark.slow
def test_stream_drains_with_idle_timeout_enabled(spark, tmp_path):
    """ProcessingTimeTimeout integration path: the query plans and
    drains a batch with the timeout conf active."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        base = datetime(2024, 1, 1)
        in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")
        spark.createDataFrame(
            [(1, base, 1.25), (2, base, 10.00)], SCHEMA
        ).write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (
            user_totals_stream(stream, idle_timeout=True)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # ProcessingTimeTimeout keeps the query alive post-drain
        # (waiting on future timers) — wait for the first batch then
        # stop explicitly.
        q.awaitTermination(60)
        q.stop()
        got = {
            r["user_id"]: r["value_cents"]
            for r in spark.read.parquet(out_dir).collect()
        }
        assert got == {1: 125, 2: 1000}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
