"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> <suffix> q_name [q_name ...]

Writes plans/<tag>/<q_name>_<suffix>.txt for each query — the
before/after evidence files the optimization rounds commit alongside
code changes (OPTIMIZATION_r11.md contract).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fhir2sql_spark import registry  # noqa: E402
from fhir2sql_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    outdir = REPO / "plans" / tag
    outdir.mkdir(parents=True, exist_ok=True)
    registry.load_all()
    spark = get_spark("dump-plans")
    jvm = spark.sparkContext._jvm
    for name in names:
        df = registry.QUERIES[name](spark, SF)
        text = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} chars)")


if __name__ == "__main__":
    main()
