"""Time the DuckDB oracle for the headline queries at a given sf dir.

Mirrors BASELINE.md's methodology (in-process DuckDB, warm cache,
best-of-2) so Spark-vs-DuckDB numbers at sf1 are apples-to-apples with
the sf0.1 baseline table.

Usage: python tools/bench_duckdb.py [--sf-dir /root/repo/.data/sf1] \
           [--queries q_agg_basic,q_join_inner,...]
Prints one JSON line {query: best_sec}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from fhir2sql_spark import registry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

HEADLINE = [
    "q_agg_basic", "q_join_inner", "q_window_rank",
    "q_limit_topk", "q_tumble", "q_sync_diff_full",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.data/sf1")
    ap.add_argument("--queries", default=",".join(HEADLINE))
    args = ap.parse_args()

    registry.load_all()
    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    out: dict = {}
    for q in args.queries.split(","):
        sql = registry.ORACLE[q]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        out[q] = round(best, 3)
    # host factor vs the pinned 2026-08-13 §B constants when the
    # measured set covers them (bench.py embeds the same A/B per run)
    from bench import DUCKDB_PINNED_S

    if set(DUCKDB_PINNED_S) <= set(out):
        meas = sum(out[q] for q in DUCKDB_PINNED_S)
        out["host_factor"] = round(meas / sum(DUCKDB_PINNED_S.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
