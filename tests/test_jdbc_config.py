"""JDBC source/sink configuration assembly (no driver jar in this
container — the options contract is what's testable; see
sources/jdbc.py docstring)."""

from __future__ import annotations

import pytest

from fhir2sql_spark.sources.jdbc import JdbcMirrorConfig, append_writer, mirror_reader


def _cfg(**kw) -> JdbcMirrorConfig:
    base = dict(
        url="jdbc:postgresql://pg:5432/mirror",
        table="patient",
        user="u",
        password="p",
    )
    base.update(kw)
    return JdbcMirrorConfig(**base)


def test_reader_options_assembled(spark):
    reader = mirror_reader(spark, _cfg(num_partitions=16), 1, 500_000)
    # building the reader must not touch the network; loading must
    # raise (no JDBC driver jar in this container)
    with pytest.raises(Exception):
        reader.load()


def test_config_validation():
    with pytest.raises(ValueError):
        _cfg(url="postgresql://no-jdbc-prefix").validate()
    with pytest.raises(ValueError):
        _cfg(num_partitions=0).validate()
    with pytest.raises(ValueError):
        _cfg(batch_size=0).validate()
    _cfg().validate()


def test_writer_builds_without_connection(spark):
    df = spark.range(3).selectExpr("id AS pk_id", "CAST(id AS STRING) AS resource")
    writer = append_writer(df, _cfg())
    with pytest.raises(Exception):
        writer.save()


def test_connect_with_retry_semantics():
    from fhir2sql_spark.sinks.jdbc_upsert import connect_with_retry

    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise ConnectionError("down")
        return "conn"

    assert connect_with_retry(flaky, attempts=5, sleep=sleeps.append) == "conn"
    assert calls["n"] == 4 and sleeps == [5.0, 5.0, 5.0]

    import pytest as _pytest

    with _pytest.raises(ConnectionError):
        connect_with_retry(
            lambda: (_ for _ in ()).throw(ConnectionError("dead")),
            attempts=3,
            sleep=sleeps.append,
        )
