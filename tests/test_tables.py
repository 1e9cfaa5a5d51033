"""Loader-level tests: events.ts vintage independence + conf hygiene.

The round-2 advisor flagged two defects in ``tables.load``:

1. the legacy-nanos branch yielded TIMESTAMP (LTZ) while the native-micros
   path yields TIMESTAMP_NTZ, so downstream schemas depended on which
   generator vintage produced events.parquet;
2. ``spark.sql.legacy.parquet.nanosAsLong`` was set unconditionally and
   session-wide, silently turning any future nanos column in *other*
   tables into bigint.

Both are fixed in ``tables._load_events``; these tests pin the fix.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fhir2sql_spark.tables import _load_events, load

CONF_KEY = "spark.sql.legacy.parquet.nanosAsLong"

ROWS = [
    (dt.datetime(2024, 1, 1, 0, 0, 0), 1),
    (dt.datetime(2024, 1, 2, 3, 4, 5), 2),
]


def _write_events(path: str, unit: str) -> None:
    t = pa.table(
        {
            "ts": pa.array([r[0] for r in ROWS], type=pa.timestamp(unit)),
            "v": pa.array([r[1] for r in ROWS], type=pa.int64()),
        }
    )
    # version 2.6 + no coercion preserves nanos physical type
    pq.write_table(t, path, coerce_timestamps=None, version="2.6")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_ts_type_is_vintage_independent(spark, tmp_path, unit):
    path = str(tmp_path / "events.parquet")
    _write_events(path, unit)
    df = _load_events(spark, path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted((r["ts"], r["v"]) for r in df.collect())
    assert got == ROWS


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_nanos_conf_does_not_leak(spark, tmp_path, unit):
    prior = spark.conf.get(CONF_KEY, None)
    path = str(tmp_path / "events.parquet")
    _write_events(path, unit)
    _load_events(spark, path).collect()
    assert spark.conf.get(CONF_KEY, None) == prior


def test_load_real_events_is_ntz(spark, sf_dir):
    assert dict(load(spark, sf_dir, "events").dtypes)["ts"] == "timestamp_ntz"
