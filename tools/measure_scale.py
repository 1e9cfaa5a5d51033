"""Decade measurements for SCALE.md: run named queries at one scale
directory, warm best-of-2, one fresh session per invocation (the
SCALE.md methodology: serial, fresh-session, so ContextCleaner races
and page-cache state can't skew the numbers).

Usage: python tools/measure_scale.py --sf .data/sf1 q_a q_b ...
Prints one line per query: name, best-of-2 seconds, row count.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from fhir2sql_spark import registry
    from fhir2sql_spark.session import get_spark

    registry.load_all()
    spark = get_spark("measure-scale")
    for name in args.names:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.monotonic()
            # noop sink = bench.py's methodology: FULL materialization
            # of every output column (a bare .count() lets Catalyst
            # prune aggregate columns and eliminate unique-keyed left
            # joins, silently under-measuring)
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        print(f">>SCALE {name} {args.sf} {best:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
