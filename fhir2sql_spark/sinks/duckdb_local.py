"""DuckDB local-engine DBAPI adapter for the sync sink.

The sink layer (``jdbc_upsert``) talks plain DBAPI: ``cursor() /
execute / executemany / commit / rollback / close``. DuckDB's Python
API diverges in two ways that matter to it:

- ``conn.cursor()`` opens a *separate* connection with its own
  transaction scope, so DML executed on the cursor would not be
  covered by ``conn.commit()``;
- the connection is autocommit-by-default and raises on
  ``commit()``/``rollback()`` with no open transaction.

``DuckDBConn`` hands the same underlying connection out as its own
cursor and makes commit/rollback tolerant, so every ``jdbc_upsert``
code path (parameterized executemany batches, staged set-based merge)
runs unmodified against DuckDB. Because DuckDB's SQL parser is derived
from Postgres' grammar (libpg_query), executing the sink's templates
here doubles as the closest in-container check of PG compatibility
(see tests/test_merge_duckdb.py; reference write path:
/root/reference/src/main.rs:78-138).

DuckDB files are single-writer across OS processes, while
``foreach_partition_write`` opens one connection per executor
partition — separate Python worker processes under local[N]. The
optional ``lock_path`` serializes open->close spans with an OS flock
so concurrent partitions queue instead of failing. A real warehouse
target (PG via JDBC) takes concurrent writers and needs no lock.
"""

from __future__ import annotations

import fcntl


class DuckDBConn:
    def __init__(self, db_path: str, lock_path: str | None = None):
        import duckdb

        self._lock = None
        if lock_path is not None:
            self._lock = open(lock_path, "w")
            fcntl.flock(self._lock, fcntl.LOCK_EX)
        try:
            self._conn = duckdb.connect(db_path)
        except Exception:
            self._release_lock()
            raise

    def _release_lock(self) -> None:
        if self._lock is not None:
            fcntl.flock(self._lock, fcntl.LOCK_UN)
            self._lock.close()
            self._lock = None

    def cursor(self):
        return self._conn

    def execute(self, *args):
        return self._conn.execute(*args)

    def commit(self) -> None:
        try:
            self._conn.commit()
        except Exception:
            pass  # autocommit: no transaction open

    def rollback(self) -> None:
        try:
            self._conn.rollback()
        except Exception:
            pass

    def close(self) -> None:
        try:
            self._conn.close()
        finally:
            self._release_lock()


def duckdb_connect_fn(db_path: str, lock_path: str | None = None):
    """Picklable connect_fn factory for ``sync_resources`` /
    ``foreach_partition_write`` against a local DuckDB file."""

    def connect() -> DuckDBConn:
        return DuckDBConn(db_path, lock_path)

    return connect
