"""Oracle-differential test (SURVEY.md §5.2-1) at sf0.001 — the same
compare the driver runs at sf0.01 (tools/compare.py is the shared
implementation)."""

from __future__ import annotations

import duckdb
import pytest

from fhir2sql_spark import registry
from fhir2sql_spark.tables import TABLES
from tools.compare import rows_hash

registry.load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(registry.ORACLE[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    assert rows_hash(s_rows, s_order) == rows_hash(d_rows, d_order)


def test_timestamp_queries_survive_hostile_session_timezone(spark, sf_dir):
    """The driver supplies its OWN SparkSession with arbitrary confs
    (verify-skill gotcha). tables.load repins UTC per call, so every
    timestamp-emitting query must produce identical rows even when the
    consuming session starts pinned to another zone. newSession()
    shares the JVM but has independent SQLConf — the realistic
    simulation available in-process."""
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")
    for name in ["q_date_funcs", "q_tumble", "q_session",
                 "q_downsample_m4", "q_agg_decay", "q_cdc_scd2",
                 # round-5 epoch/probe-time queries
                 "q_rolling_median", "q_interval_coverage",
                 "q_join_asof_nearest"]:
        base = sorted(map(tuple, registry.QUERIES[name](spark, sf_dir).collect()))
        got = sorted(map(tuple, registry.QUERIES[name](hostile, sf_dir).collect()))
        assert got == base, f"{name} drifted under a non-UTC session"
