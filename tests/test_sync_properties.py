"""Metamorphic/property tests for the diff core (SURVEY §5.2-2):
randomized snapshot pairs (hypothesis) checked against the invariants
stated in the reference's doc comment (src/main.rs:159-175)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from fhir2sql_spark.sync.diff import (
    OP_DELETE,
    OP_INSERT,
    OP_NOOP,
    OP_UPDATE,
    diff_snapshots,
)

keys = st.integers(min_value=0, max_value=60)
versions = st.integers(min_value=1, max_value=4)
snapshot = st.dictionaries(keys, versions, max_size=40)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _dfs(spark, src: dict[int, int], mir: dict[int, int]):
    s = spark.createDataFrame(
        [(k, v) for k, v in src.items()] or [], "res_key int, src_version int"
    )
    m = spark.createDataFrame(
        [(k, v, k) for k, v in mir.items()] or [],
        "res_key int, mir_version int, pk_id int",
    )
    return s, m


def _tags(spark, src, mir) -> dict[int, str]:
    s, m = _dfs(spark, src, mir)
    return {
        r["res_key"]: r["op"] for r in diff_snapshots(s, m).collect()
    }


@pytest.mark.slow
@_SETTINGS
@given(src=snapshot, mir=snapshot)
def test_tags_partition_key_universe(spark, src, mir):
    tags = _tags(spark, src, mir)
    assert set(tags) == set(src) | set(mir)
    for k, op in tags.items():
        if op == OP_INSERT:
            assert k in src and k not in mir
        elif op == OP_DELETE:
            assert k in mir and k not in src
        elif op == OP_UPDATE:
            assert src[k] != mir[k]  # source-wins on ANY difference
        else:
            assert op == OP_NOOP and src[k] == mir[k]


@_SETTINGS
@given(src=snapshot, mir=snapshot)
def test_applying_diff_converges(spark, src, mir):
    tags = _tags(spark, src, mir)
    new_mirror = dict(mir)
    for k, op in tags.items():
        if op == OP_INSERT or op == OP_UPDATE:
            new_mirror[k] = src[k]
        elif op == OP_DELETE:
            del new_mirror[k]
    assert new_mirror == src


@_SETTINGS
@given(snap=snapshot)
def test_self_diff_is_all_noop(spark, snap):
    tags = _tags(spark, snap, snap)
    assert all(op == OP_NOOP for op in tags.values())


def test_idempotence_after_convergence(spark):
    src = {i: 1 + i % 3 for i in range(50)}
    mir = {i: 1 for i in range(40)}
    tags = _tags(spark, src, mir)
    converged = dict(mir)
    for k, op in tags.items():
        if op in (OP_INSERT, OP_UPDATE):
            converged[k] = src[k]
        elif op == OP_DELETE:
            converged.pop(k)
    retags = _tags(spark, src, converged)
    assert all(op == OP_NOOP for op in retags.values())
