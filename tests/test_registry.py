"""Registry-level invariants + smoke execution of every query at
sf0.001 (the t1-scale gate; oracle parity runs in
tests/test_oracle_parity.py at the same scale)."""

from __future__ import annotations

import pytest

from fhir2sql_spark import registry

registry.load_all()


def test_all_queries_have_unique_names():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))


def test_oracle_keys_subset_of_queries():
    assert set(registry.ORACLE) <= set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_runs_and_has_rows(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    # stable schema + executable plan + non-negative rows
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_showcase_covers_never_driver_checked():
    """Rotation invariant (data-driven so it survives future windows):
    every registered query that has NO row in any CORRECTNESS_r*.json
    must occupy a window slot (the driver gate samples a 50-query
    prefix); remaining slots re-confirm changed/oldest queries."""
    import glob
    import json
    from pathlib import Path

    assert len(registry.SHOWCASE) == 50
    assert len(set(registry.SHOWCASE)) == 50
    assert set(registry.SHOWCASE) <= set(registry.QUERIES)
    repo = Path(__file__).resolve().parent.parent
    confirmed: set[str] = set()
    for f in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        confirmed |= set(json.load(open(f)))
    never_checked = set(registry.QUERIES) - confirmed
    missing = never_checked - set(registry.SHOWCASE)
    assert not missing, f"never-driver-checked queries outside window: {missing}"


def test_unpartitioned_window_parser():
    """The explain-audit sweep must flag single-task windows and pass
    partitioned, partition-only, and __pid-whitelisted forms."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from explain_audit import unpartitioned_windows

    unpart = (
        "+- Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS r#4], [id#0L ASC NULLS FIRST]"
    )
    part = (
        "+- Window [row_number() windowspecdefinition(k#1L, id#0L ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS r#7], [k#1L], [id#0L ASC NULLS FIRST]"
    )
    part_only = (
        "+- Window [sum(_w0#1) windowspecdefinition(l_partkey#2L, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS s#3], [l_partkey#2L]"
    )
    pid_offset = (
        "+- Window [sum(__cnt#5L) windowspecdefinition(__pid#4 ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) "
        "AS __off#6L], [__pid#4 ASC NULLS FIRST]"
    )
    assert unpartitioned_windows(unpart)          # flagged
    assert not unpartitioned_windows(part)        # partitioned: fine
    assert not unpartitioned_windows(part_only)   # whole-frame agg: fine
    assert not unpartitioned_windows(pid_offset)  # O(partitions) rows: fine
    combined = "\n".join([part, unpart, pid_offset])
    assert len(unpartitioned_windows(combined)) == 1


def test_doc_counts_match_registry():
    """VERDICT r6 #8: README/SURVEY count claims must equal the
    registry truth (tools/counts.py is the single source; regenerate
    the doc lines from its output when this fails)."""
    from pathlib import Path

    from tools.counts import counts

    c = counts()
    n, e, r = c["queries"], c["exact_oracles"], c["rows_only"]
    repo = Path(__file__).resolve().parent.parent
    readme = (repo / "README.md").read_text()
    survey = (repo / "SURVEY.md").read_text()
    assert f"({e} hash-checked + {r} rows-only)" in readme
    assert f"{n}/{n} strict-matched ({e} exact hashes" in survey
    assert f"{e}/{e} oracles hash-identical" in survey
