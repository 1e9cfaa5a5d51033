"""transformWithStateInPandas operator: cross-batch accumulation and
TTL plumbing through the Spark 4 StatefulProcessor API (RocksDB state
store)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from fhir2sql_spark.streaming.transform_state import (
    ROCKSDB_PROVIDER,
    UserTotalsProcessor,
    has_tws_runtime,
    user_totals_tws,
)

needs_tws = pytest.mark.skipif(
    not has_tws_runtime(),
    reason="transformWithState state server needs protobuf (absent here)",
)

SCHEMA = "user_id long, ts timestamp, value double"


@pytest.fixture()
def rocksdb_session(spark):
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if prev_provider is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prev_provider
        )


def _drain(spark, in_dir, out_dir, ckpt, ttl_ms=None):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        user_totals_tws(stream, ttl_ms=ttl_ms)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def _latest(spark, out_dir):
    best = {}
    for r in spark.read.parquet(out_dir).collect():
        cur = best.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            best[r["user_id"]] = (r["n_events"], r["value_cents"])
    return best


@needs_tws
def test_state_survives_restart(rocksdb_session, tmp_path):
    spark = rocksdb_session
    base = datetime(2024, 1, 1)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )

    spark.createDataFrame(
        [(1, base, 1.25), (1, base + timedelta(minutes=1), 2.50), (2, base, 10.00)],
        SCHEMA,
    ).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    first = _latest(spark, out_dir)
    assert first[1] == (2, 375)
    assert first[2] == (1, 1000)

    spark.createDataFrame(
        [(1, base + timedelta(minutes=5), 0.25), (3, base, 7.00)], SCHEMA
    ).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt)
    cur = _latest(spark, out_dir)
    assert cur[1] == (3, 400)  # state carried across query restart
    assert cur[2] == (1, 1000)
    assert cur[3] == (1, 700)


@needs_tws
def test_ttl_mode_plans_and_drains(rocksdb_session, tmp_path):
    """TTL path: ProcessingTime time mode + store-side TTL config
    plans and produces correct first-batch totals."""
    spark = rocksdb_session
    base = datetime(2024, 1, 1)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(
        [(1, base, 1.25), (2, base, 10.00)], SCHEMA
    ).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out_dir, ckpt, ttl_ms=3600 * 1000)
    got = {u: v for u, (_, v) in _latest(spark, out_dir).items()}
    assert got == {1: 125, 2: 1000}


class _FakeValueState:
    def __init__(self):
        self.value = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = v


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.ttls = {}

    def getValueState(self, name, schema, ttl_ms=None):
        self.ttls[name] = ttl_ms
        return self.states.setdefault(name, _FakeValueState())


def test_processor_logic_without_state_server():
    """The processor's own fold is testable without the protobuf
    state server: two batches accumulate into integer cents, TTL is
    passed through to the state handle."""
    proc = UserTotalsProcessor(ttl_ms=1234)
    handle = _FakeHandle()
    proc.init(handle)
    assert handle.ttls == {"totals": 1234}

    b1 = pd.DataFrame(
        {"user_id": [7, 7], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
         "value": [1.25, 2.50]}
    )
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))
    assert handle.states["totals"].value == (2, 375)
    assert int(out1[0]["value_cents"][0]) == 375

    b2 = pd.DataFrame(
        {"user_id": [7], "ts": pd.to_datetime(["2024-01-03"]), "value": [0.25]}
    )
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))
    assert handle.states["totals"].value == (3, 400)
    assert int(out2[0]["n_events"][0]) == 3


class _TtlClockValueState(_FakeValueState):
    """Store-side TTL emulation: the value disappears once the fake
    clock passes last-update + ttl — the contract the RocksDB
    provider enforces (expired state reads as absent; it is never
    returned stale)."""

    def __init__(self, ttl_ms, clock):
        super().__init__()
        self._ttl_ms = ttl_ms
        self._clock = clock
        self._written_at = None

    def _expired(self):
        return (
            self._ttl_ms is not None
            and self._written_at is not None
            and self._clock["now_ms"] - self._written_at >= self._ttl_ms
        )

    def exists(self):
        return self.value is not None and not self._expired()

    def get(self):
        return None if self._expired() else self.value

    def update(self, v):
        self.value = v
        self._written_at = self._clock["now_ms"]


class _TtlHandle(_FakeHandle):
    def __init__(self, clock):
        super().__init__()
        self._clock = clock

    def getValueState(self, name, schema, ttl_ms=None):
        self.ttls[name] = ttl_ms
        return self.states.setdefault(
            name, _TtlClockValueState(ttl_ms, self._clock)
        )


def test_processor_ttl_expiry_two_batch_scenario():
    """Two-batch TTL scenario against the emulated store contract:
    within TTL the second batch folds onto carried state; once the
    clock passes TTL the state reads as absent and the count restarts
    — exactly what the RocksDB provider's store-side TTL produces."""
    clock = {"now_ms": 0}
    proc = UserTotalsProcessor(ttl_ms=60_000)
    handle = _TtlHandle(clock)
    proc.init(handle)

    b = pd.DataFrame(
        {"user_id": [7], "ts": pd.to_datetime(["2024-01-01"]), "value": [1.25]}
    )
    list(proc.handleInputRows((7,), iter([b]), None))
    clock["now_ms"] = 30_000  # within TTL: accumulates
    out2 = list(proc.handleInputRows((7,), iter([b]), None))
    assert int(out2[0]["n_events"][0]) == 2

    clock["now_ms"] = 120_000  # past TTL: state expired, fold restarts
    out3 = list(proc.handleInputRows((7,), iter([b]), None))
    assert int(out3[0]["n_events"][0]) == 1
    assert int(out3[0]["value_cents"][0]) == 125


def test_processor_restart_reads_checkpointed_state():
    """Query-restart emulation: a NEW processor instance (fresh init)
    over the SAME handle store — the checkpoint contract — continues
    the fold instead of restarting it."""
    handle = _FakeHandle()
    p1 = UserTotalsProcessor()
    p1.init(handle)
    b = pd.DataFrame(
        {"user_id": [1], "ts": pd.to_datetime(["2024-01-01"]), "value": [2.0]}
    )
    list(p1.handleInputRows((1,), iter([b]), None))
    p1.close()

    p2 = UserTotalsProcessor()
    p2.init(handle)  # same store = restored checkpoint
    out = list(p2.handleInputRows((1,), iter([b]), None))
    assert int(out[0]["n_events"][0]) == 2
    assert int(out[0]["value_cents"][0]) == 400


def test_tws_plan_analyzes_without_runtime(spark, tmp_path):
    """The transformWithStateInPandas WIRING is verifiable without the
    protobuf state server: building the streaming plan only needs the
    JVM analyzer. Schema + operator presence are asserted here, so the
    only thing the @needs_tws runtime tests add is execution."""
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1.0)], SCHEMA
    ).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = user_totals_tws(stream, ttl_ms=1000)
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "value_cents",
    ]
    assert out.isStreaming
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "TransformWithStateInPySpark" in plan
