"""interval_overlap_join: equality with the naive theta join, plan
shape (no nested loop), and exactly-once emission."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir2sql_spark.operators.interval import interval_overlap_join
from fhir2sql_spark.tables import load


def _intervals(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    left = o.where(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("a_id"),
        F.col("o_orderdate").cast("date").alias("a_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 14).alias("a_e"),
    )
    right = o.where(F.col("o_orderkey") % 89 == 0).select(
        F.col("o_orderkey").alias("b_id"),
        F.col("o_orderdate").cast("date").alias("b_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("b_e"),
    )
    return left, right


def test_equals_naive_theta_join(spark, sf_dir):
    left, right = _intervals(spark, sf_dir)
    banded = interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e")
    naive = left.join(
        right, (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e"))
    )
    got = sorted((r.a_id, r.b_id) for r in banded.select("a_id", "b_id").collect())
    want = sorted((r.a_id, r.b_id) for r in naive.select("a_id", "b_id").collect())
    assert got == want
    assert len(got) > 0  # the fixture actually produces overlaps


def test_exactly_once_without_distinct(spark, sf_dir):
    left, right = _intervals(spark, sf_dir)
    out = interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e")
    pairs = [(r.a_id, r.b_id) for r in out.select("a_id", "b_id").collect()]
    assert len(pairs) == len(set(pairs))


def test_plan_has_no_nested_loop(spark, sf_dir):
    left, right = _intervals(spark, sf_dir)
    out = interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_bucket_width_invariance(spark, sf_dir):
    """The bucket width is a physical knob only: any width yields the
    same pair set (coverage + canonical-bucket pin are width-independent)."""
    left, right = _intervals(spark, sf_dir)
    a = interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e", bucket_days=16)
    b = interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e", bucket_days=5)
    ga = sorted((r.a_id, r.b_id) for r in a.select("a_id", "b_id").collect())
    gb = sorted((r.a_id, r.b_id) for r in b.select("a_id", "b_id").collect())
    assert ga == gb


# Pure-logic property: the bucket-coverage + canonical-pin argument
# holds for ALL closed intervals, not just the fixture's. No Spark —
# this replays the operator's arithmetic directly.
from hypothesis import given, strategies as st


@given(
    st.integers(0, 2000), st.integers(0, 60),
    st.integers(0, 2000), st.integers(0, 60),
    st.integers(1, 40),
)
def test_bucket_math_exactly_once(a_s, a_len, b_s, b_len, width):
    a_e, b_e = a_s + a_len, b_s + b_len
    overlaps = a_s <= b_e and b_s <= a_e
    a_buckets = set(range(a_s // width, a_e // width + 1))
    b_buckets = set(range(b_s // width, b_e // width + 1))
    shared = a_buckets & b_buckets
    pin = max(a_s, b_s) // width
    # the equi-join emits one candidate per shared bucket; the residual
    # + pin must keep exactly one iff the intervals overlap
    kept = [b for b in shared if overlaps and b == pin]
    assert len(kept) == (1 if overlaps else 0)
