"""Streaming-batch equivalence + watermark late-drop tests
(SURVEY §5.2-3). Each streaming query must equal its batch twin over
the same events data; the late-data test replays two batches and
asserts the watermark actually drops late rows."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fhir2sql_spark.queries.util import dec
from fhir2sql_spark.streaming.harness import (
    replay_two_batches,
    run_stream_available_now,
)
from fhir2sql_spark.tables import load

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_parquet"))
    load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").parquet(out)
    return out


def _tumble(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 2)).cast("decimal(18,2)").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _rows(df: DataFrame) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


@pytest.mark.slow
def test_tumble_stream_equals_batch(spark, sf_dir, events_dir):
    batch = _tumble(
        load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    )
    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, _tumble, output_mode="complete"
    )
    assert _rows(stream) == _rows(batch)


def test_dedup_stream_equals_batch(spark, sf_dir, events_dir):
    def dedup(df: DataFrame) -> DataFrame:
        return df.select("event_id", "event_type").dropDuplicates(["event_id"])

    batch = dedup(load(spark, sf_dir, "events"))
    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, dedup, output_mode="append"
    )
    assert _rows(stream) == _rows(batch)


def test_watermark_drops_late_rows(spark, tmp_path):
    base = datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, EVENTS_SCHEMA)

    # batch 1 advances event-time to 12:00; batch 2 carries one row at
    # 02:00 — far older than watermark (12:00 - 1h) — and one fresh row.
    batch1 = mk(
        [
            (1, base + timedelta(hours=1), 1, "click", 1.0),
            (2, base + timedelta(hours=12), 1, "click", 1.0),
        ]
    )
    batch2 = mk(
        [
            (3, base + timedelta(hours=2), 1, "click", 1.0),  # LATE -> dropped
            (4, base + timedelta(hours=13), 1, "click", 1.0),
        ]
    )

    def agg(df: DataFrame) -> DataFrame:
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
                "n",
            )
        )

    out = replay_two_batches(
        spark,
        batch1,
        batch2,
        EVENTS_SCHEMA,
        agg,
        input_dir=str(tmp_path / "in"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )
    emitted = {r["ws"]: r["n"] for r in out.collect()}
    # the 02:00 row (event 3) must NOT appear anywhere
    assert "2024-01-01 02:00:00" not in emitted
    # the 01:00 window from batch1 was finalized once the watermark passed
    assert emitted.get("2024-01-01 01:00:00") == 1


def test_slide_stream_equals_batch(spark, sf_dir, events_dir):
    def slide(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
            )
        )

    batch = slide(
        load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    )
    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, slide, output_mode="complete"
    )
    assert _rows(stream) == _rows(batch)


def test_session_stream_equals_batch(spark, sf_dir, events_dir):
    def session(df: DataFrame) -> DataFrame:
        # streaming session_window requires a watermark; events are a
        # bounded replay so an effectively-infinite horizon keeps every
        # row while exercising the stateful merge path
        return (
            df.withWatermark("ts", "365 days")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec("value", 2)).cast("decimal(18,2)").alias("sum_value"),
            )
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                    "session_start"
                ),
                "n_events",
                "sum_value",
            )
        )

    batch = (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 2)).cast("decimal(18,2)").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )
    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, session, output_mode="complete"
    )
    assert _rows(stream) == _rows(batch)


def test_rate_source_smoke(spark, tmp_path):
    """rate-micro-batch source (deterministic rows/batch) — the
    declared always-on source for load/soak testing (SURVEY §2.2)."""
    import time as _time

    q = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 50)
        .option("numPartitions", 4)
        .load()
        .writeStream.format("memory")
        .queryName("rate_smoke")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline and spark.table("rate_smoke").count() < 50:
            _time.sleep(0.5)
        got = spark.table("rate_smoke")
        assert got.count() >= 50
        assert set(got.columns) == {"timestamp", "value"}
        vals = [r["value"] for r in got.select("value").collect()]
        assert len(set(vals)) == len(vals)  # values are unique ticks
    finally:
        q.stop()


def _interval_join(df: DataFrame) -> DataFrame:
    """The q_stream_join plan over a single source stream: filter into
    two watermarked sides, equi-join on user_id with a one-hour
    time-range residual. Watermark + range condition bound the join
    state (Spark evicts buffered rows that can no longer match)."""
    views = (
        df.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    clicks = (
        df.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    return views.join(
        clicks,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "view_id", "click_id")


def test_stream_join_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join drains to the same pairs the batch
    plan (q_stream_join) produces over the same events."""
    batch = _interval_join(
        load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    )
    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, _interval_join, output_mode="append"
    )
    assert _rows(stream) == _rows(batch)


@pytest.mark.slow
def test_stream_join_outer_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: a view with no click inside its
    hour must surface with a NULL click_id — but only once the
    watermark has passed the end of its join window, which takes a
    second batch to advance event time. Two-batch replay makes that
    deterministic."""
    base = datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, EVENTS_SCHEMA)

    # batch 1: one view with a click inside the hour, one view without
    batch1 = mk(
        [
            (1, base, 7, "view", 1.0),
            (2, base + timedelta(minutes=10), 7, "click", 1.0),
            (3, base + timedelta(hours=2), 8, "view", 1.0),
        ]
    )
    # batch 2: far-future rows push the watermark past both windows
    batch2 = mk(
        [
            (4, base + timedelta(hours=30), 9, "view", 1.0),
            (5, base + timedelta(hours=30), 9, "click", 1.0),
        ]
    )

    def outer(df: DataFrame) -> DataFrame:
        views = (
            df.where(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "10 minutes")
        )
        clicks = (
            df.where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("click_user_id"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "10 minutes")
        )
        return views.join(
            clicks,
            (F.col("user_id") == F.col("click_user_id"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        ).select("view_id", "click_id")

    out = replay_two_batches(
        spark,
        batch1,
        batch2,
        EVENTS_SCHEMA,
        outer,
        input_dir=str(tmp_path / "in"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = {(r["view_id"], r["click_id"]) for r in out.collect()}
    assert (1, 2) in got  # matched pair
    assert (3, None) in got  # unmatched view emitted as outer NULL


def test_rollup_stream_merges_to_batch(spark, sf_dir, events_dir):
    """Continuous-aggregate property: a watermarked streaming job
    maintaining ONLY the hour grain, merged upward by
    streaming/rollup.py merge_grains (counts and decimal sums are
    mergeable), must equal the one-pass batch GROUPING SETS rollup
    (q_rollup_hypertable) row-for-row."""
    from fhir2sql_spark.queries.streaming_batch import q_rollup_hypertable
    from fhir2sql_spark.streaming.rollup import hour_grain_stream, merge_grains

    hour = run_stream_available_now(
        spark,
        events_dir,
        EVENTS_SCHEMA,
        hour_grain_stream,
        output_mode="complete",
    )
    streamed = merge_grains(hour)
    assert _rows(streamed) == _rows(q_rollup_hypertable(spark, sf_dir))


def test_anomaly_stream_static_join_equals_batch(spark, sf_dir, events_dir):
    """Stream-STATIC join: score a live event stream against a static
    (historically trained) per-type moment table — the standard
    streaming anomaly-detection deployment. Stateless (no watermark
    needed, the static side broadcasts into every micro-batch), so
    append mode emits each flagged event exactly once; the result must
    equal the batch q_anomaly_zscore over the same data."""
    from fhir2sql_spark.queries.relational_ext import q_anomaly_zscore

    batch = q_anomaly_zscore(spark, sf_dir)

    e = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(19,6)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("sx"),
        F.sum(v * v).cast("double").alias("sx2"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(F.col("sx2") / F.col("n") - mean * mean)

    def flag(stream: DataFrame) -> DataFrame:
        z = (F.col("value") - mean) / std
        return (
            stream.join(F.broadcast(stats), "event_type")
            .where(F.abs(z) > 3)
            .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
        )

    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, flag, output_mode="append"
    )
    rows_s = {tuple(r) for r in stream.collect()}
    rows_b = {tuple(r) for r in batch.collect()}
    assert rows_s == rows_b and rows_s


def test_m4_stream_equals_batch(spark, sf_dir, events_dir):
    """The M4 envelope (q_downsample_m4) is fully mergeable — min/max
    trivially, first/last because min_by/max_by over the (ts,event_id)
    struct ordering merge associatively — so the streaming rendering
    in complete mode must equal the batch twin exactly."""

    def m4(df: DataFrame) -> DataFrame:
        b = df.select(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            dec("value", 2).alias("v"),
            F.struct("ts", "event_id").alias("ord"),
        )
        return b.groupBy("event_type", "bucket_start").agg(
            F.min("v").cast("double").alias("v_min"),
            F.max("v").cast("double").alias("v_max"),
            F.min_by("v", "ord").cast("double").alias("v_first"),
            F.max_by("v", "ord").cast("double").alias("v_last"),
            F.count(F.lit(1)).alias("n_points"),
        )

    batch = m4(
        load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    )
    stream = run_stream_available_now(
        spark, events_dir, EVENTS_SCHEMA, m4, output_mode="complete"
    )
    assert _rows(stream) == _rows(batch)


def test_incremental_dedup_foreachbatch(spark, tmp_path):
    """q_dedup_incremental's policy run as a CONTINUOUS ingest: the key
    index is a parquet table, each micro-batch classifies against it in
    one probe (new / dup_corpus / dup_batch) and appends its admitted
    keys — so a batch-2 clone of a key admitted in batch 1 classifies
    dup_corpus ACROSS batches. First-arrival replaces the one-shot
    query's min-doc_id keeper (the documented streaming difference);
    the final classification must equal a sequential replay of the
    same policy.

    Sink discipline: foreachBatch may REPLAY a batch after a restart,
    so both sinks write per-batch subdirectories in overwrite mode —
    a replayed batch rewrites its own output identically instead of
    appending duplicate rows whose classifications straddle the index
    append (observed as nondeterministic 'new'/'dup_corpus' flips).

    Runs on sf0.01 (the oracle fixture): the suite's sf0.001 corpus is
    too small to guarantee a cross-batch clone pair."""
    from pyspark.sql import Window

    from fhir2sql_spark.operators import dedup as dedup_ops

    from tests.conftest import SF_MED

    docs = load(spark, SF_MED, "documents")
    prefix = F.concat_ws(
        " ",
        F.slice(F.split(dedup_ops.normalize_text(F.col("text")), " "), 1, 8),
    )
    h = docs.select(
        "doc_id",
        F.sha2(prefix, 256).alias("th"),
        (F.col("doc_id") % 3 == 0).alias("is_new"),
    )
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "classified")
    in_dir = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")
    h.where(~F.col("is_new")).select("th").distinct().write.parquet(
        index_dir + "/base"
    )
    new_docs = h.where(F.col("is_new")).select("doc_id", "th")

    def classify(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        idx = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir)
            .withColumn("in_corp", F.lit(True))
        )
        keeper = bdf.withColumn(
            "keeper", F.min("doc_id").over(Window.partitionBy("th"))
        )
        tagged = keeper.join(idx, "th", "left").select(
            "doc_id",
            "th",
            F.when(F.col("in_corp").isNotNull(), F.lit("dup_corpus"))
            .when(F.col("doc_id") != F.col("keeper"), F.lit("dup_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
        # pin ONE evaluation: the admitted-keys write below must not
        # recompute tagged after the index it read has grown
        tagged = tagged.localCheckpoint()
        tagged.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        tagged.where(F.col("status") == "new").select("th").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/batch={batch_id}")

    def drain() -> None:
        stream = spark.readStream.schema("doc_id long, th string").parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    b1 = new_docs.where(F.col("doc_id") % 2 == 0)
    b2 = new_docs.where(F.col("doc_id") % 2 == 1)
    b1.write.mode("append").parquet(in_dir)
    drain()
    b2.write.mode("append").parquet(in_dir)
    drain()

    out_rows = (
        spark.read.option("recursiveFileLookup", "true").parquet(out_dir).collect()
    )
    got = {r["doc_id"]: r["status"] for r in out_rows}
    rows = sorted(
        ((r["doc_id"], r["th"]) for r in new_docs.collect()),
        key=lambda t: (t[0] % 2, t[0]),  # batch1 (even) before batch2 (odd)
    )
    assert len(out_rows) == len(rows)  # no replay-duplicated rows
    assert set(got) == {d for d, _ in rows}  # each doc classified once
    # sequential replay of the policy: per batch, first-keeper wins
    corpus = {r["th"] for r in h.where(~F.col("is_new")).collect()}
    expect = {}
    for parity in (0, 1):
        batch = [(d, t) for d, t in rows if d % 2 == parity]
        keepers = {}
        for d, t in batch:
            keepers.setdefault(t, d)
        for d, t in batch:
            if t in corpus:
                expect[d] = "dup_corpus"
            elif keepers[t] != d:
                expect[d] = "dup_batch"
            else:
                expect[d] = "new"
        corpus |= {t for d, t in batch if expect[d] == "new"}
    assert got == expect
    # the cross-batch case must actually occur on this fixture: doc 420
    # (batch 1) and 393 (batch 2) share a prefix key with no corpus
    # member — streaming admits 420 then flags 393 as dup_corpus, where
    # the one-shot query's min-doc_id keeper would have kept 393.
    assert got[420] == "new" and got[393] == "dup_corpus"


def test_semantic_inc_dedup_foreachbatch(spark, tmp_path):
    """q_dedup_semantic_inc as a CONTINUOUS ingest (the
    test_incremental_dedup_foreachbatch convention, now for the
    frozen-codebook semantic form): the codebook is trained ONCE on
    the base shard and never retrained; the vector index is a parquet
    table; each micro-batch is assigned to cells and verdicted against
    (base ∪ previously-admitted) + its own smaller-id members, then
    appends its admitted vectors — so a batch-2 near-clone of a
    batch-1 admit classifies dup_corpus ACROSS batches. Final statuses
    must equal a sequential exact-integer replay of the same policy."""
    import numpy as np

    from fhir2sql_spark.operators import lattice
    from tests.conftest import SF_MED

    emb = load(spark, SF_MED, "embeddings")
    qv = lattice.quantize(emb)
    base = qv.where(F.col("vid") % 3 != 0)
    new = qv.where(F.col("vid") % 3 == 0)
    cents = lattice.lattice_kmeans(base, k=16, iters=1)
    cent_rows = [(r["cent_id"], list(r["cv"])) for r in cents.collect()]

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "classified")
    in_dir = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")
    base.selectExpr("vid AS vec_id", "qv").write.parquet(index_dir + "/base")

    def classify(bdf, batch_id: int) -> None:
        s = bdf.sparkSession
        cdf = s.createDataFrame(cent_rows, "cent_id int, cv array<long>")
        idx = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir)
            .selectExpr("vec_id AS vid", "qv")
        )
        verdicts = lattice.lattice_semantic_dedup_incremental(
            idx, bdf.selectExpr("vec_id AS vid", "qv"), cdf
        ).localCheckpoint()  # pin ONE evaluation before the index grows
        verdicts.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        verdicts.where(F.col("status") == "new").join(
            bdf, "vec_id"
        ).select("vec_id", "qv").write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}"
        )

    def drain() -> None:
        stream = (
            spark.readStream.schema("vec_id long, qv array<bigint>")
            .parquet(in_dir)
        )
        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    b1 = new.where(F.col("vid") % 2 == 0).selectExpr("vid AS vec_id", "qv")
    b2 = new.where(F.col("vid") % 2 == 1).selectExpr("vid AS vec_id", "qv")
    b1.write.mode("append").parquet(in_dir)
    drain()
    b2.write.mode("append").parquet(in_dir)
    drain()

    out = (
        spark.read.option("recursiveFileLookup", "true").parquet(out_dir)
    ).collect()
    got = {r["vec_id"]: r["status"] for r in out}
    assert len(out) == len(got) == new.count()  # no replay duplicates

    # exact-integer sequential replay
    X = {r["vid"]: np.array(r["qv"], dtype=np.int64) for r in qv.collect()}
    code = np.stack([np.array(v, dtype=np.int64) for _, v in cent_rows])
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)

    def cell(v):
        d2 = ((X[v][None, :] - code) ** 2).sum(axis=1)
        order = np.lexsort((cids, d2))
        return int(cids[order[0]])

    def cos_ge(a, b):
        dot = int(a @ b)
        na, nb = int(a @ a), int(b @ b)
        return na > 0 and nb > 0 and dot > 0 and 25 * dot * dot >= 4 * na * nb

    cells = {v: cell(v) for v in X}
    corpus = [v for v in X if v % 3 != 0]
    expect = {}
    for parity in (0, 1):
        batch = sorted(v for v in X if v % 3 == 0 and v % 2 == parity)
        for i, v in enumerate(batch):
            in_cell_corpus = [u for u in corpus if cells[u] == cells[v]]
            if any(cos_ge(X[u], X[v]) for u in in_cell_corpus):
                expect[v] = "dup_corpus"
            elif any(
                cos_ge(X[u], X[v])
                for u in batch[:i]
                if cells[u] == cells[v]
            ):
                expect[v] = "dup_batch"
            else:
                expect[v] = "new"
        corpus += [v for v in batch if expect[v] == "new"]
    assert got == expect
    # the semantic statuses must actually be exercised on this fixture
    assert set(got.values()) >= {"new", "dup_corpus"}


def test_minhash_inc_dedup_foreachbatch(spark, tmp_path):
    """q_dedup_minhash_inc as a CONTINUOUS ingest (the
    test_incremental_dedup_foreachbatch convention for the LSH form):
    the frozen index is TWO parquet tables — (band, bkey, doc_id) band
    postings and the per-doc shingle-set store for verification — and
    each micro-batch computes signatures, probes the GROWN index,
    exact-Jaccard-verifies the collisions, classifies, and appends its
    admitted docs' bands + sets. A batch-2 near-dup of a doc admitted
    in batch 1 classifies dup_corpus ACROSS batches. The expectation
    is a sequential driver replay of the IDENTICAL pipeline (md5
    permutations, 8x4 banding, band-collision candidates, >= 4/5
    verify) in pure Python, so LSH recall is part of the contract,
    not a tolerance. Runs on sf0.01 — sf0.001 has no cross-batch
    near-dup pairs.

    Replay discipline (VERDICT r8 #5): overwrite-per-batch-dir sinks
    alone do NOT make foreachBatch replay a noop here — a replayed
    batch would find its OWN admitted bands already in the index
    (every doc self-collides at Jaccard 1, flipping new ->
    dup_corpus). The index is therefore a WATERMARKED log: every
    append carries src_batch, reads filter src_batch < batch_id, so a
    replayed batch sees exactly the index view its first run saw and
    rewrites byte-identical outputs (asserted below by re-invoking
    classify with the final batch's id)."""
    import hashlib

    from fhir2sql_spark.operators import dedup as dedup_ops

    from tests.conftest import SF_MED

    docs = load(spark, SF_MED, "documents")

    def bands_of(df: DataFrame) -> DataFrame:
        sh = dedup_ops.shingles(df, n=3, distinct=True)
        mins = [
            F.min(
                F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle")))
            ).alias(f"h{i}")
            for i in range(32)
        ]
        sig = sh.groupBy("doc_id").agg(*mins)
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat(
                                *[
                                    F.col(f"h{i}")
                                    for i in range(b * 4, b * 4 + 4)
                                ]
                            ).alias("bkey"),
                        )
                        for b in range(8)
                    ]
                )
            ).alias("s"),
        ).select("doc_id", "s.band", "s.bkey")

    def sets_of(df: DataFrame) -> DataFrame:
        return (
            dedup_ops.shingles(df, n=3, distinct=True)
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("sh_set"))
        )

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "classified")
    in_dir = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")
    corpus_docs = docs.where(F.col("doc_id") % 3 != 0)
    bands_of(corpus_docs).withColumn("src_batch", F.lit(-1)).write.parquet(
        index_dir + "/bands/base"
    )
    sets_of(corpus_docs).withColumn("src_batch", F.lit(-1)).write.parquet(
        index_dir + "/sets/base"
    )
    new_docs = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id", "lang", "text"
    )

    def classify(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        bdf = bdf.localCheckpoint()  # batch is re-read several times
        idx_bands = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + "/bands")
            .where(F.col("src_batch") < batch_id)
            .drop("src_batch")
        )
        idx_sets = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + "/sets")
            .where(F.col("src_batch") < batch_id)
            .drop("src_batch")
        )
        nb = bands_of(bdf).localCheckpoint()
        bsets = sets_of(bdf).localCheckpoint()
        a = nb.select("band", "bkey", F.col("doc_id").alias("doc_a"))
        cand_corpus = (
            a.join(
                idx_bands.select(
                    F.col("band").alias("band_b"),
                    F.col("bkey").alias("bkey_b"),
                    F.col("doc_id").alias("doc_b"),
                ),
                (F.col("band") == F.col("band_b"))
                & (F.col("bkey") == F.col("bkey_b")),
            )
            .select("doc_a", "doc_b")
            .distinct()
            # provenance, NOT doc_id % 3: admitted docs from earlier
            # batches live in the index but still have doc_id % 3 == 0
            .withColumn("src", F.lit("corpus"))
        )
        cand_batch = (
            a.join(
                nb.select(
                    F.col("band").alias("band_b"),
                    F.col("bkey").alias("bkey_b"),
                    F.col("doc_id").alias("doc_b"),
                ),
                (F.col("band") == F.col("band_b"))
                & (F.col("bkey") == F.col("bkey_b"))
                & (F.col("doc_b") < F.col("doc_a")),
            )
            .select("doc_a", "doc_b")
            .distinct()
            .withColumn("src", F.lit("batch"))
        )
        cands = cand_corpus.unionByName(cand_batch).localCheckpoint()
        all_sets = idx_sets.unionByName(bsets)
        ver = (
            cands.join(
                bsets.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("sh_set").alias("set_a"),
                ),
                "doc_a",
            )
            .join(
                all_sets.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("sh_set").alias("set_b"),
                ),
                "doc_b",
            )
            .withColumn(
                "common", F.size(F.array_intersect("set_a", "set_b"))
            )
            .withColumn(
                "union_n",
                F.size("set_a") + F.size("set_b") - F.col("common"),
            )
            .where(F.col("common") * 5 >= F.col("union_n") * 4)
        )
        flags = ver.groupBy(F.col("doc_a").alias("doc_id")).agg(
            F.max((F.col("src") == "corpus").cast("int")).alias("hc"),
            F.max((F.col("src") == "batch").cast("int")).alias("hb"),
        )
        tagged = (
            bdf.select("doc_id")
            .join(F.broadcast(flags), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("hc") == 1, F.lit("dup_corpus"))
                .when(F.col("hb") == 1, F.lit("dup_batch"))
                .otherwise(F.lit("new"))
                .alias("status"),
            )
            .localCheckpoint()
        )
        tagged.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        admitted = tagged.where(F.col("status") == "new").select("doc_id")
        nb.join(F.broadcast(admitted), "doc_id", "left_semi").withColumn(
            "src_batch", F.lit(batch_id)
        ).write.mode("overwrite").parquet(f"{index_dir}/bands/batch={batch_id}")
        bsets.join(F.broadcast(admitted), "doc_id", "left_semi").withColumn(
            "src_batch", F.lit(batch_id)
        ).write.mode("overwrite").parquet(f"{index_dir}/sets/batch={batch_id}")

    def drain() -> None:
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    b1 = new_docs.where(F.col("doc_id") % 2 == 0)
    b2 = new_docs.where(F.col("doc_id") % 2 == 1)
    b1.write.mode("append").parquet(in_dir)
    drain()
    b2.write.mode("append").parquet(in_dir)
    drain()

    out_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    got = {r["doc_id"]: r["status"] for r in out_rows}

    # sequential Python replay of the identical pipeline
    def sh3(text: str) -> set:
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    def bands_py(sset: set) -> set:
        hs = [
            min(
                hashlib.md5(f"{p}|{s}".encode()).hexdigest() for s in sset
            )
            for p in range(32)
        ]
        return {(b, "".join(hs[b * 4 : b * 4 + 4])) for b in range(8)}

    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    sets_py = {d: sh3(t) for d, t in texts.items()}
    bands_idx: dict[int, set] = {
        d: bands_py(sets_py[d]) for d in texts if d % 3 != 0
    }

    def jac_ok(a: int, b: int) -> bool:
        c = len(sets_py[a] & sets_py[b])
        u = len(sets_py[a] | sets_py[b])
        return u > 0 and c * 5 >= u * 4

    expect = {}
    for parity in (0, 1):
        batch = sorted(d for d in texts if d % 3 == 0 and d % 2 == parity)
        bb = {d: bands_py(sets_py[d]) for d in batch}
        for d in batch:
            corp_hits = [
                o for o, ob in bands_idx.items() if bb[d] & ob and jac_ok(d, o)
            ]
            batch_hits = [
                o for o in batch if o < d and bb[d] & bb[o] and jac_ok(d, o)
            ]
            if corp_hits:
                expect[d] = "dup_corpus"
            elif batch_hits:
                expect[d] = "dup_batch"
            else:
                expect[d] = "new"
        bands_idx.update(
            {d: bb[d] for d in batch if expect[d] == "new"}
        )
    assert len(out_rows) == len(expect)  # no replay-duplicated rows
    assert got == expect
    assert set(got.values()) >= {"new", "dup_corpus"}
    # the cross-batch case must actually occur: 420 (batch 1, no
    # corpus partner) is admitted, then its near-dup 393 (batch 2)
    # hits the GROWN index — the one-shot query calls 393/420 a
    # dup_batch pair; the stream sees 420 as corpus by then
    assert got[420] == "new" and got[393] == "dup_corpus"

    # replay-noop (VERDICT r8 #5): re-run the LAST batch through the
    # same sink, as a post-restart foreachBatch replay would. The
    # src_batch watermark hides the batch's own earlier appends, so
    # classifications and index contents must be byte-identical.
    idx_before = sorted(
        (r["doc_id"], r["band"], r["bkey"], r["src_batch"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(index_dir + "/bands")
        .collect()
    )
    classify(b2, 1)  # the second drain processed b2 as batch_id 1
    replay_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    assert len(replay_rows) == len(out_rows)
    assert {r["doc_id"]: r["status"] for r in replay_rows} == expect
    idx_after = sorted(
        (r["doc_id"], r["band"], r["bkey"], r["src_batch"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(index_dir + "/bands")
        .collect()
    )
    assert idx_after == idx_before


def _sid_sets(df: DataFrame) -> DataFrame:
    """Per-doc distinct shingle-sid sets (array<long>) — the stored
    verification sets of the prefix-dedup streaming twins. Sid space
    (xxhash64(lang, 5-gram)) carries the lang qualifier, so
    cross-lang docs can never intersect — the same contract the batch
    queries' verify holds."""
    from fhir2sql_spark.operators.frozen_index import _sid_postings

    return (
        _sid_postings(df, n=5)
        .groupBy("doc_id")
        .agg(F.collect_set("__sid").alias("sids"))
    )


def _run_prefix_inc_stream(
    spark, tmp_path, candidates_fn, verify_where, containment: bool
):
    """Shared driver of the prefix-dedup foreachBatch twins
    (VERDICT r9 #3; the test_minhash_inc_dedup_foreachbatch
    convention): FROZEN rarity stats from the base corpus (staleness
    degrades selectivity, never recall — prefix completeness needs
    only a consistent order), a GROWING posting index + sid-set store
    watermarked by src_batch, two staged micro-batches, and a
    replay-noop re-invocation. Returns (got statuses, docs, classify,
    second_batch_df, out_dir, read_index_rows)."""
    from fhir2sql_spark.operators import frozen_index as fz

    from tests.conftest import SF_MED

    # PLANTED cross-batch pair (the round-9 planted-fixture
    # convention): at the 5-gram thresholds the natural sf0.01
    # fixture has NO new-batch near-dup pair without a base-corpus
    # partner (verified by brute force), so the growing-index path
    # would go unexercised. Two byte-identical docs with unique
    # tokens, both doc_id % 3 == 0, split across the two
    # micro-batches by parity: the first is admitted, the second
    # must classify dup_corpus via the GROWN index (the one-shot
    # batch query would call the pair dup_batch).
    planted = spark.createDataFrame(
        [
            (
                9000000,
                "en",
                "zqxv alpha bravo charlie delta echo foxtrot golf "
                "hotel india juliett kilo lima",
            ),
            (
                9000003,
                "en",
                "zqxv alpha bravo charlie delta echo foxtrot golf "
                "hotel india juliett kilo lima",
            ),
        ],
        "doc_id long, lang string, text string",
    )
    docs = (
        load(spark, SF_MED, "documents")
        .select("doc_id", "lang", "text")
        .unionByName(planted)
    )
    corpus_docs = docs.where(F.col("doc_id") % 3 != 0)
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "classified")
    in_dir = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")

    # frozen once: the rarity ORDER; growing: postings + sets
    fz.corpus_token_stats(corpus_docs).write.parquet(index_dir + "/stats")
    base_postings = (
        fz.build_containment_posting_index(corpus_docs)
        if containment
        else fz.build_setsim_prefix_index(corpus_docs)
    )
    base_postings.withColumn("src_batch", F.lit(-1)).write.parquet(
        index_dir + "/postings/base"
    )
    _sid_sets(corpus_docs).withColumn("src_batch", F.lit(-1)).write.parquet(
        index_dir + "/sets/base"
    )
    new_docs = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id", "lang", "text"
    )
    tn, td = (4, 5) if containment else (1, 2)

    def classify(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        bdf = bdf.localCheckpoint()  # batch is re-read several times
        stats = s.read.parquet(index_dir + "/stats")
        idx_post = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + "/postings")
            .where(F.col("src_batch") < batch_id)
            .drop("src_batch")
        )
        idx_sets = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + "/sets")
            .where(F.col("src_batch") < batch_id)
            .drop("src_batch")
        )
        bp = fz.batch_prefixes(bdf, stats, tn, td, n=5)
        bsets = _sid_sets(bdf).localCheckpoint()
        cand_corpus, cand_batch = candidates_fn(fz, bp, bdf, idx_post)
        cands = (
            cand_corpus.withColumn("src", F.lit("corpus"))
            .unionByName(cand_batch.withColumn("src", F.lit("batch")))
            .localCheckpoint()
        )
        all_sets = idx_sets.unionByName(bsets)
        ver = (
            cands.join(
                bsets.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("sids").alias("set_a"),
                ),
                "doc_a",
            )
            .join(
                all_sets.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("sids").alias("set_b"),
                ),
                "doc_b",
            )
            .withColumn(
                "common", F.size(F.array_intersect("set_a", "set_b"))
            )
            .where(verify_where)
        )
        flags = ver.groupBy(F.col("doc_a").alias("doc_id")).agg(
            F.max((F.col("src") == "corpus").cast("int")).alias("hc"),
            F.max((F.col("src") == "batch").cast("int")).alias("hb"),
        )
        tagged = (
            bdf.select("doc_id")
            .join(F.broadcast(flags), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("hc") == 1, F.lit("dup_corpus"))
                .when(F.col("hb") == 1, F.lit("dup_batch"))
                .otherwise(F.lit("new"))
                .alias("status"),
            )
            .localCheckpoint()
        )
        tagged.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        admitted = tagged.where(F.col("status") == "new").select("doc_id")
        # the growing index stores what the NEXT batch probes: full
        # postings for containment, rarity prefixes for setsim (each
        # admitted doc's prefix was computed under the frozen order)
        new_postings = (
            fz.build_containment_posting_index(
                bdf.join(F.broadcast(admitted), "doc_id", "left_semi")
            )
            if containment
            else bp.join(F.broadcast(admitted), "doc_id", "left_semi")
        )
        new_postings.withColumn("src_batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/postings/batch={batch_id}")
        bsets.join(F.broadcast(admitted), "doc_id", "left_semi").withColumn(
            "src_batch", F.lit(batch_id)
        ).write.mode("overwrite").parquet(f"{index_dir}/sets/batch={batch_id}")

    def drain() -> None:
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    b1 = new_docs.where(F.col("doc_id") % 2 == 0)
    b2 = new_docs.where(F.col("doc_id") % 2 == 1)
    b1.write.mode("append").parquet(in_dir)
    drain()
    b2.write.mode("append").parquet(in_dir)
    drain()

    out_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    got = {r["doc_id"]: r["status"] for r in out_rows}
    assert len(out_rows) == len(got)  # no replay-duplicated rows

    def read_postings():
        return sorted(
            tuple(r) for r in spark.read.option(
                "recursiveFileLookup", "true"
            ).parquet(index_dir + "/postings").collect()
        )

    return got, docs, classify, b2, out_dir, read_postings


def _prefix_inc_replay(docs, ok_fn):
    """Sequential pure-Python replay over raw (lang-qualified) 5-gram
    sets — ground truth for the prefix twins: candidate generation is
    COMPLETE (Bayardo) and verification exact, so pipeline statuses
    must equal brute force (modulo ~2^-64 sid collisions)."""
    rows = docs.select("doc_id", "lang", "text").collect()
    sets_py = {}
    for r in rows:
        t = r["text"].split(" ")
        sets_py[r["doc_id"]] = {
            (r["lang"], " ".join(t[i : i + 5])) for i in range(len(t) - 4)
        }
    corpus = [d for d in sets_py if d % 3 != 0]
    base_n = len(corpus)
    expect, cross_batch = {}, []
    for parity in (0, 1):
        batch = sorted(d for d in sets_py if d % 3 == 0 and d % 2 == parity)
        for d in batch:
            corp_hits = [o for o in corpus if ok_fn(sets_py[d], sets_py[o])]
            if corp_hits:
                expect[d] = "dup_corpus"
                if all(o % 3 == 0 for o in corp_hits):
                    cross_batch.append(d)  # only admitted-doc partners
            elif any(
                o < d and ok_fn(sets_py[d], sets_py[o]) for o in batch
            ):
                expect[d] = "dup_batch"
            else:
                expect[d] = "new"
        corpus += [d for d in batch if expect[d] == "new"]
    assert len(corpus) >= base_n
    return expect, cross_batch


def test_setsim_inc_dedup_foreachbatch(spark, tmp_path):
    """q_dedup_setsim_inc as a CONTINUOUS ingest (VERDICT r9 #3):
    frozen rarity stats, growing prefix-posting index, stream equals
    the sequential brute-force replay over two staged batches, and a
    replayed foreachBatch invocation is a byte-identical noop (the
    src_batch watermark, PLANS r9 lesson 3)."""

    def candidates(fz, bp, bdf, idx_post):
        from fhir2sql_spark.queries.llm import _setsim_inc_candidates

        return _setsim_inc_candidates(bp, idx_post)

    verify_where = (
        F.col("common") * 2
        >= (F.size("set_a") + F.size("set_b") - F.col("common")) * 1
    )
    got, docs, classify, b2, out_dir, read_postings = _run_prefix_inc_stream(
        spark, tmp_path, candidates, verify_where, containment=False
    )

    def jac_ok(a, b):
        u = len(a | b)
        return u > 0 and 2 * len(a & b) >= u

    expect, cross_batch = _prefix_inc_replay(docs, jac_ok)
    assert got == expect
    assert set(got.values()) >= {"new", "dup_corpus"}
    # the GROWING index must matter: the planted batch-2 doc's only
    # partner is its batch-1-admitted twin
    assert 9000003 in cross_batch
    assert got[9000000] == "new" and got[9000003] == "dup_corpus"

    # replay-noop: re-run the LAST batch (batch_id 1) — watermark
    # hides its own appends; outputs and index must not change
    before = read_postings()
    n_out = len(spark.read.option("recursiveFileLookup", "true").parquet(out_dir).collect())
    classify(b2, 1)
    after_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    assert len(after_rows) == n_out
    assert {r["doc_id"]: r["status"] for r in after_rows} == expect
    assert read_postings() == before


def test_containment_inc_dedup_foreachbatch(spark, tmp_path):
    """q_dedup_containment_inc as a CONTINUOUS ingest (VERDICT r9
    #3): directed containment against a growing FULL posting index;
    stream equals the brute-force directed replay; replayed batch is
    a noop."""

    def candidates(fz, bp, bdf, idx_post):
        from fhir2sql_spark.queries.llm import _containment_inc_candidates

        batch_full = fz._sid_postings(bdf, n=5).select(
            F.col("__sid").alias("__sid_b"), F.col("doc_id").alias("doc_b")
        )
        return _containment_inc_candidates(
            bp,
            idx_post.select(
                F.col("__sid").alias("__sid_b"),
                F.col("doc_id").alias("doc_b"),
            ),
            batch_full,
        )

    verify_where = F.col("common") * 5 >= F.size("set_a") * 4
    got, docs, classify, b2, out_dir, read_postings = _run_prefix_inc_stream(
        spark, tmp_path, candidates, verify_where, containment=True
    )

    def contain_ok(a, b):
        return len(a) > 0 and 5 * len(a & b) >= 4 * len(a)

    expect, cross_batch = _prefix_inc_replay(docs, contain_ok)
    assert got == expect
    assert set(got.values()) >= {"new", "dup_corpus"}
    assert 9000003 in cross_batch
    assert got[9000000] == "new" and got[9000003] == "dup_corpus"

    before = read_postings()
    classify(b2, 1)
    after_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    assert {r["doc_id"]: r["status"] for r in after_rows} == expect
    assert read_postings() == before


def test_incremental_bloom_dedup_foreachbatch(spark, tmp_path):
    """q_dedup_incremental_bloom as a CONTINUOUS ingest: the stored
    state is TWO watermarked logs — the exact key index (th,
    src_batch) and the Bloom sketch's PARTIAL WORD tables (w, word,
    src_batch), merged per batch by bit_or exactly as executor
    partials merge (the sketch is mergeable by OR, so each ingest
    appends only its admitted keys' partial). Per micro-batch: merge
    the visible sketch, probe batch keys map-side, consult the exact
    key index ONLY on positives, classify, append admitted keys +
    their partial sketch. Ground truth is a sequential pure-Python
    replay over exact normalized-prefix keys (the bloom must be
    INVISIBLE in statuses — no false negatives); the natural fixture
    provides the cross-batch case (keys shared only among new-batch
    docs: 420 admitted in batch 1, 393 hits the GROWN index in batch
    2). Replay-noop via the src_batch watermark as in the other
    foreachBatch twins."""
    import re as _re

    from pyspark.sql import Window

    from fhir2sql_spark.operators.dedup import normalize_text
    from fhir2sql_spark.queries.llm import _bloom_positions

    from tests.conftest import SF_MED

    docs = load(spark, SF_MED, "documents").select("doc_id", "text")
    prefix_key = F.sha2(
        F.concat_ws(
            " ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8)
        ),
        256,
    )
    keyed = docs.select("doc_id", prefix_key.alias("th"))
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "classified")
    in_dir = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")

    def sketch_words(keys: DataFrame) -> DataFrame:
        return (
            keys.select(
                F.explode(_bloom_positions(F.col("th"))).alias("pos")
            )
            .select(
                F.expr("pos div 64").alias("w"),
                F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("b"),
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("word"))
        )

    corpus_keys = keyed.where(F.col("doc_id") % 3 != 0).select("th").distinct()
    corpus_keys.withColumn("src_batch", F.lit(-1)).write.parquet(
        index_dir + "/keys/base"
    )
    sketch_words(corpus_keys).withColumn("src_batch", F.lit(-1)).write.parquet(
        index_dir + "/sketch/base"
    )
    new_docs = docs.where(F.col("doc_id") % 3 == 0)

    def classify(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        bdf = bdf.localCheckpoint()
        idx_keys = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + "/keys")
            .where(F.col("src_batch") < batch_id)
            .drop("src_batch")
        )
        merged = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + "/sketch")
            .where(F.col("src_batch") < batch_id)
            .groupBy("w")
            .agg(F.bit_or("word").alias("word"))
            .localCheckpoint()  # <= 2^25/64 rows regardless of corpus
        )
        nb = bdf.select(
            "doc_id",
            F.sha2(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.split(normalize_text(F.col("text")), " "), 1, 8
                    ),
                ),
                256,
            ).alias("th"),
        ).withColumn("keeper", F.min("doc_id").over(Window.partitionBy("th")))
        posed = nb.select(
            "doc_id",
            "th",
            "keeper",
            F.explode(_bloom_positions(F.col("th"))).alias("pos"),
        )
        probed = (
            posed.select(
                "doc_id",
                "th",
                "keeper",
                F.expr("pos div 64").alias("w"),
                F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("b"),
            )
            .join(F.broadcast(merged), "w", "left")
            .withColumn(
                "__hit",
                F.coalesce(
                    F.col("word").bitwiseAND(F.col("b")) != 0, F.lit(False)
                ),
            )
            .groupBy("doc_id", "th", "keeper")
            .agg((F.min(F.col("__hit").cast("int")) == 1).alias("bloom_hit"))
            .localCheckpoint()
        )
        pos = probed.where(F.col("bloom_hit")).join(
            idx_keys.withColumn("in_corp", F.lit(True)), "th", "left"
        )
        neg = probed.where(~F.col("bloom_hit")).withColumn(
            "in_corp", F.lit(None).cast("boolean")
        )
        tagged = (
            pos.unionByName(neg)
            .select(
                "doc_id",
                "th",
                "bloom_hit",
                F.when(F.col("in_corp").isNotNull(), F.lit("dup_corpus"))
                .when(F.col("doc_id") != F.col("keeper"), F.lit("dup_batch"))
                .otherwise(F.lit("new"))
                .alias("status"),
            )
            .localCheckpoint()
        )
        tagged.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        admitted_keys = (
            tagged.where(F.col("status") == "new").select("th").distinct()
        ).localCheckpoint()
        admitted_keys.withColumn("src_batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/keys/batch={batch_id}")
        sketch_words(admitted_keys).withColumn(
            "src_batch", F.lit(batch_id)
        ).write.mode("overwrite").parquet(
            f"{index_dir}/sketch/batch={batch_id}"
        )

    def drain() -> None:
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            in_dir
        )
        q = (
            stream.writeStream.foreachBatch(classify)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    b1 = new_docs.where(F.col("doc_id") % 2 == 0)
    b2 = new_docs.where(F.col("doc_id") % 2 == 1)
    b1.write.mode("append").parquet(in_dir)
    drain()
    b2.write.mode("append").parquet(in_dir)
    drain()

    out_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    got = {r["doc_id"]: r["status"] for r in out_rows}
    hits = {r["doc_id"]: r["bloom_hit"] for r in out_rows}
    assert len(out_rows) == len(got)

    # sequential replay over exact keys — the bloom must be invisible
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def key_of(t: str) -> str:
        return " ".join(
            _re.sub(r"\s+", " ", t.lower()).strip().split(" ")[:8]
        )

    keys_py = {d: key_of(t) for d, t in texts.items()}
    corpus = {keys_py[d] for d in keys_py if d % 3 != 0}
    expect = {}
    for parity in (0, 1):
        batch = sorted(d for d in keys_py if d % 3 == 0 and d % 2 == parity)
        keeper: dict = {}
        for d in batch:
            keeper.setdefault(keys_py[d], d)
        for d in batch:
            if keys_py[d] in corpus:
                expect[d] = "dup_corpus"
            elif keeper[keys_py[d]] != d:
                expect[d] = "dup_batch"
            else:
                expect[d] = "new"
        corpus |= {keys_py[d] for d in batch if expect[d] == "new"}
    assert got == expect
    # the cross-batch case occurs naturally: 420 (batch 1, key shared
    # with no corpus doc) is admitted; its key-twin 393 (batch 2)
    # hits the GROWN index
    assert got[420] == "new" and got[393] == "dup_corpus"
    # bloom soundness live: every dup_corpus row passed the filter,
    # and the tier actually pruned something (some row missed)
    assert all(hits[d] for d, st in got.items() if st == "dup_corpus")
    assert any(not h for h in hits.values())

    # replay-noop (src_batch watermark)
    def read_log(sub):
        return sorted(
            tuple(r)
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(index_dir + sub)
            .collect()
        )

    keys_before, sketch_before = read_log("/keys"), read_log("/sketch")
    classify(b2, 1)
    replay_rows = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(out_dir)
        .collect()
    )
    assert {r["doc_id"]: r["status"] for r in replay_rows} == expect
    assert read_log("/keys") == keys_before
    assert read_log("/sketch") == sketch_before


def test_token_drift_foreachbatch(spark, tmp_path):
    """q_diag_token_drift as a CONTINUOUS monitor: the base token
    counts are a FROZEN stored table; the batch side is a growing
    watermarked PARTIAL-COUNT log (token, n, src_batch) merged by
    SUM per micro-batch — the additive analogue of the Bloom twin's
    bit_or partial-sketch logs. After draining two micro-batches
    that partition the batch shard, the monitor's last output must
    equal the REGISTERED query row-for-row, and replaying the last
    batch is a no-op (the overwrite-per-batch log plus the
    src_batch <= batch_id read window see the identical state)."""
    from pyspark.sql import Window  # noqa: F401 (parity with peers)

    from fhir2sql_spark.operators.text import tokens_portable
    from fhir2sql_spark.registry import QUERIES, load_all

    from tests.conftest import SF_MED

    load_all()
    docs = load(spark, SF_MED, "documents").select("doc_id", "text")
    log_dir = str(tmp_path / "counts")
    out_dir = str(tmp_path / "drift")
    in_dir = str(tmp_path / "ingest")
    ckpt = str(tmp_path / "ckpt")

    def tok_counts(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.explode(tokens_portable(F.col("text"))).alias("token")
            )
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    base = docs.where(F.col("doc_id") % 3 != 0)
    tok_counts(base).write.parquet(log_dir + "/base")
    new_docs = docs.where(F.col("doc_id") % 3 == 0)

    def monitor(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        bdf = bdf.localCheckpoint()
        tok_counts(bdf).withColumn(
            "src_batch", F.lit(batch_id)
        ).write.mode("overwrite").parquet(
            f"{log_dir}/batch/batch={batch_id}"
        )
        nc = (
            s.read.option("recursiveFileLookup", "true")
            .parquet(log_dir + "/batch")
            .where(F.col("src_batch") <= batch_id)
            .groupBy("token")
            .agg(F.sum("n").cast("long").alias("n_new"))
        )
        bc = s.read.parquet(log_dir + "/base").select(
            "token", F.col("n").alias("n_base")
        )
        j = (
            bc.join(nc, "token", "full")
            .na.fill({"n_base": 0, "n_new": 0})
            .localCheckpoint()  # two consumers: totals + movers
        )
        t = j.agg(
            F.sum("n_base").cast("long").alias("tb"),
            F.sum("n_new").cast("long").alias("tn"),
        )
        top = (
            j.crossJoin(F.broadcast(t))
            .withColumn(
                "__d",
                F.abs(
                    F.col("n_new") * F.col("tb")
                    - F.col("n_base") * F.col("tn")
                ),
            )
            .orderBy(F.desc("__d"), "token")
            .limit(10)
        )
        out = top.select(
            "token",
            "n_base",
            "n_new",
            F.round(F.col("n_base") / F.col("tb"), 6).alias("share_base"),
            F.round(F.col("n_new") / F.col("tn"), 6).alias("share_new"),
            F.round(
                F.abs(
                    F.col("n_new") / F.col("tn")
                    - F.col("n_base") / F.col("tb")
                )
                / 2,
                6,
            ).alias("tvd_contrib"),
            (
                (
                    F.col("n_new") * F.col("tb")
                    > 2 * F.col("n_base") * F.col("tn")
                )
                | (
                    F.col("n_base") * F.col("tn")
                    > 2 * F.col("n_new") * F.col("tb")
                )
            ).alias("drifted"),
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    def drain() -> None:
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(monitor)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    b1 = new_docs.where(F.col("doc_id") % 2 == 0)
    b2 = new_docs.where(F.col("doc_id") % 2 == 1)
    b1.write.mode("append").parquet(in_dir)
    drain()
    b2.write.mode("append").parquet(in_dir)
    drain()

    def rows_of(df):
        return sorted(tuple(r) for r in df.collect())

    final = rows_of(spark.read.parquet(f"{out_dir}/batch=1"))
    expected = rows_of(QUERIES["q_diag_token_drift"](spark, SF_MED))
    assert final == expected
    # replay of the last micro-batch: identical log state -> identical
    # output, and the accumulated partials still sum to the batch
    # shard's true counts (no double-append)
    monitor(b2, 1)
    assert rows_of(spark.read.parquet(f"{out_dir}/batch=1")) == expected
    acc = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(log_dir + "/batch")
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )
    truth = tok_counts(new_docs)
    assert rows_of(acc) == rows_of(truth)
