"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only state is the residual BTreeMap inside one sync
run (/root/reference/src/main.rs:227-282) — rebuilt from scratch every
day. This operator shows the engine's continuous form: per-key state
that survives across micro-batches with timeout-based finalization.

Operator: running per-user counters (event count, decimal-cents value
sum, last event time) emitted on every batch; state evicted after an
idle timeout — the streaming analogue of the reference's "converged
mirror" per user. State size is O(active keys) and is persisted in the
checkpoint's state store, so a 1000-executor job shards it by the
grouping key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_cents long, last_ts timestamp"
STATE_SCHEMA = "n_events long, value_cents long"


def _make_update_fn(idle_timeout: bool) -> Callable[..., Iterator[pd.DataFrame]]:
    """Build the per-group update function with the timeout flag bound
    into the closure. The flag MUST be captured this way: a module
    global mutated on the driver is not shipped to executors — workers
    re-import the module and see the default, so setTimeoutDuration
    would never run and idle state would grow unboundedly (round-1
    advisor finding)."""

    def update_user_totals(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Accumulate (count, value-in-cents) per user. Values convert
        to integer cents before summation — the streaming rendering of
        the engine-wide decimal determinism rule (float accumulation
        across micro-batches would drift)."""
        if state.hasTimedOut:
            state.remove()
            return
        n, cents = state.get if state.exists else (0, 0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, cents))
        if idle_timeout:
            state.setTimeoutDuration(3600 * 1000)  # evict after 1h idle
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": [cents],
                "last_ts": [last_ts],
            }
        )

    return update_user_totals


def user_totals_stream(
    events: DataFrame, idle_timeout: bool = False
) -> DataFrame:
    """Apply the stateful operator to a streaming events DataFrame
    (columns: user_id, ts, value). Output mode: append — the file
    sinks that can resume from a checkpoint only support append, and
    resumability is the point of a stateful operator; consumers take
    the row with the highest n_events per user as current.

    ``idle_timeout=True`` enables 1h idle-state eviction for
    continuous jobs; leave False for AvailableNow drains (a
    ProcessingTimeTimeout query never self-terminates after the drain
    — it waits for the next timeout trigger)."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
