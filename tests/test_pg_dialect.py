"""Golden-SQL pins + grammar validation for the PostgreSQL sink
dialect (VERDICT r5 "What's missing" #1: the PG wire surface was the
one part of the reference contract no test could falsify — the
container has no PG server, so the closest falsifier is (a) verbatim
statement pins and (b) the vendored PG-subset parser in
sinks/pg_lint.py)."""

from __future__ import annotations

import pytest

from fhir2sql_spark.sinks import jdbc_upsert
from fhir2sql_spark.sinks.pg_dialect import pg_statements
from fhir2sql_spark.sinks.pg_lint import PgSyntaxError, validate_pg


def test_every_pg_statement_parses():
    for name, sql in pg_statements("patient", stage="patient_stage").items():
        validate_pg(sql)  # raises on failure


def test_pg_golden_pins():
    st = pg_statements("patient", stage="patient_stage")
    assert st["insert"] == (
        "INSERT INTO patient (id, resource) VALUES (%s, %s::jsonb)"
    )
    assert st["update"] == (
        "UPDATE patient SET resource = %s::jsonb,"
        " last_updated_at = CURRENT_TIMESTAMP WHERE id = %s"
    )
    assert st["delete"] == "DELETE FROM patient WHERE id = %s"
    assert st["upsert"] == (
        "INSERT INTO patient (id, resource) VALUES (%s, %s::jsonb)"
        " ON CONFLICT (id) DO UPDATE SET resource = EXCLUDED.resource,"
        " last_updated_at = CURRENT_TIMESTAMP"
    )
    # reference shape: UPDATE ... SET resource = <...>::jsonb FROM ...
    # WHERE <stage>.id = <table>.id  (src/main.rs:86), staged variant
    assert "FROM patient_stage s" in st["merge_stage"]
    assert "s.resource::jsonb" in st["merge_stage"]
    assert st["ddl"].startswith("CREATE TABLE IF NOT EXISTS patient")
    assert "JSONB NOT NULL" in st["ddl"]
    assert "$$" in st["touch_fn"] and "plpgsql" in st["touch_fn"]
    assert "BEFORE UPDATE ON patient" in st["touch_trigger"]


def test_generic_templates_are_not_pg():
    """The ANSI qmark templates must FAIL PG validation — proves the
    linter actually discriminates paramstyles (and that the PG path
    can't silently fall back to them)."""
    with pytest.raises(PgSyntaxError, match="qmark"):
        validate_pg(jdbc_upsert.INSERT_SQL.format(table="patient"))


def test_generic_stage_merge_is_pg_compatible():
    """The generic set-based merge statements contain no placeholders
    and are dialect-neutral: they must pass the PG grammar as-is (they
    are what merge_stage_into_target sends to any engine)."""
    for tpl in (
        jdbc_upsert.MERGE_FROM_STAGE_SQL,
        jdbc_upsert.INSERT_FROM_STAGE_SQL,
        jdbc_upsert.DELETE_FROM_STAGE_SQL,
    ):
        validate_pg(tpl.format(table="patient", stage="patient_stage"))
    validate_pg(jdbc_upsert.MIRROR_DDL.format(table="patient"))


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("INSERT INTO t (id) VALUES (?)", "qmark"),
        ("INSERT INTO `t` (id) VALUES (%s)", "backtick"),
        ("CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT)",
         "non-PostgreSQL"),
        ("UPDATE t SET resource = %s WHERE id = %s)", "trailing"),
        ("UPDATE t SET resource = %s WHERE id IN (SELECT x FROM", "expected"),
        ("DELETE FROM t WHERE id = %s extra_garbage", "trailing"),
        ("INSERT INTO t (id, resource) SELECT 1", None),  # ok: no raise
        ("CREATE TABLE t (id BLOB)", "unknown column type"),
        ("UPDATE t SET resource %s", "expected '='"),
        # ADVICE r6: cast targets must be PG types (the old check was
        # vacuously true for identifier tokens, letting these through)
        ("UPDATE t SET resource = %s::blob WHERE id = %s", "bad cast"),
        ("INSERT INTO t (id, resource) VALUES (%s, %s::varchar2)",
         "bad cast"),
        ("UPDATE t SET resource = %s::jsonb WHERE id = %s", None),  # ok
    ],
)
def test_lint_catches_rot(bad, msg):
    if msg is None:
        validate_pg(bad)
        return
    with pytest.raises(PgSyntaxError, match=msg):
        validate_pg(bad)


def test_paramstyle_counts_match_changeset_contract():
    """apply_changeset feeds (pk_id, resource) / (resource, pk_id) /
    (pk_id,) tuples positionally; the PG statements must carry exactly
    that many placeholders in that order."""
    st = pg_statements("t")
    assert st["insert"].count("%s") == 2
    assert st["update"].count("%s") == 2
    assert st["delete"].count("%s") == 1
    assert st["upsert"].count("%s") == 2
