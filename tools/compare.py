"""Local oracle-differential harness mimicking the driver's t2 gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, sorted column names, and an
order-insensitive value-hash over canonicalized rows. Usage:

    python tools/compare.py [--sf /root/testdata/sf0.01] [query ...]

Exit code 0 iff every compared query matches.
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from fhir2sql_spark import registry  # noqa: E402
from fhir2sql_spark.session import get_spark  # noqa: E402
from fhir2sql_spark.tables import TABLES  # noqa: E402


def canon(v) -> str:
    """Canonical string for one value; both engines' Python values meet
    here (Decimal scale preserved; floats via repr; naive timestamps)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def rows_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted("|".join(canon(r[i]) for i in col_order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry.load_all()
    names = args.names or sorted(registry.QUERIES)

    spark = get_spark("oracle-compare")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        sdf = fn(spark, args.sf)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0

        if name not in registry.ORACLE:
            print(f"  {name:24s} rows-only: {len(s_rows)} rows [{t_spark:.2f}s]")
            continue

        t0 = time.time()
        res = con.execute(registry.ORACLE[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        t_duck = time.time() - t0

        ok = True
        msgs = []
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if ok:
            s_order = [s_cols.index(c) for c in sorted(s_cols)]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            hs, hd = rows_hash(s_rows, s_order), rows_hash(d_rows, d_order)
            if hs != hd:
                ok = False
                msgs.append("value-hash mismatch")
                # show a diff sample
                ss = {"|".join(canon(r[i]) for i in s_order) for r in s_rows}
                dd = {"|".join(canon(r[i]) for i in d_order) for r in d_rows}
                for x in list(ss - dd)[:3]:
                    msgs.append(f"  spark-only: {x}")
                for x in list(dd - ss)[:3]:
                    msgs.append(f"  duck-only : {x}")
        status = "OK " if ok else "FAIL"
        print(
            f"  {name:24s} {status} {len(s_rows):7d} rows "
            f"[spark {t_spark:.2f}s duck {t_duck:.3f}s]"
        )
        for m in msgs:
            print(f"      {m}")
        if not ok:
            failures.append(name)

    print(
        f"\n{len(names) - len(failures)}/{len(names)} matched"
        + (f"; FAILED: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
