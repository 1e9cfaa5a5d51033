"""Oracle-determinism sweep: run every registered DuckDB oracle N
times (fresh connection each run, default thread count — the exact
setup tools/compare.py and the driver's correctness gate use) and
flag any oracle whose value hash is not identical across runs.

Why this exists (round 6): q_embed_ivfpq's oracle produced 2 distinct
hashes over 10 identical runs — DuckDB parallelizes SUM(double) and
the thread-dependent accumulation order flipped a 4-dp rounding. That
class of flake (order-sensitive float aggregate -> round -> hash) is
invisible to a single-run gate and surfaces as a spurious CORRECTNESS
failure one round in ten. The fix pattern is an ordered fold
(``list_sum(list(x ORDER BY k))``) or integer arithmetic; this sweep
is the regression net that catches new members of the class.

Usage: python tools/oracle_stability.py [--sf DIR] [--runs N] [names...]
Exit 1 if any oracle is unstable.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from fhir2sql_spark import registry  # noqa: E402
from fhir2sql_spark.tables import TABLES  # noqa: E402
from tools.compare import rows_hash  # noqa: E402


def oracle_hashes(sql: str, sf_dir: str, runs: int) -> set[str]:
    hashes = set()
    for _ in range(runs):
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
            order = [cols.index(c) for c in sorted(cols)]
            hashes.add(rows_hash(rows, order))
        finally:
            con.close()
    return hashes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry.load_all()
    names = args.names or sorted(registry.ORACLE)
    unstable = []
    for name in names:
        hs = oracle_hashes(registry.ORACLE[name], args.sf, args.runs)
        status = "OK" if len(hs) == 1 else f"UNSTABLE ({len(hs)} hashes)"
        print(f"  {name:30s} {status}", flush=True)
        if len(hs) != 1:
            unstable.append(name)
    print(
        f"\n{len(names) - len(unstable)}/{len(names)} oracles stable over "
        f"{args.runs} runs"
    )
    if unstable:
        print("UNSTABLE:", ", ".join(unstable))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
