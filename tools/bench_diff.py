"""Per-query delta between two bench artifacts (VERDICT r6 #3's
consumer): compare any two of BENCH_HISTORY.jsonl records (by run_id),
BENCH_FULL.json, or BENCH_r{N}.json driver captures, and print the
queries whose time moved beyond a noise band.

Usage:
    python tools/bench_diff.py OLD NEW [--band 0.25] [--abs 0.3]

OLD/NEW are file paths, or ``history:<run_id>`` to pick a record out
of BENCH_HISTORY.jsonl. A query regresses when it is slower by more
than ``band`` (fractional) AND ``abs`` seconds — both, so toy-scale
jitter on 0.2 s queries and ±5% drift on big ones are ignored. Host
stamps (loadavg, cache warmth) are printed when present: a wholesale
shift with a loadavg jump is environment, not regression (SCALE.md's
same-day-A/B rule).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Queries whose WORKLOAD changed between rounds — a cross-round delta
# on these is a definition change, not a speedup/regression (ADVICE
# r9). Flagged with a footnote whenever they appear in the diff.
WORKLOAD_CHANGES = {
    "q_udf_scalar": (
        "r9: input narrowed to a deterministic 1/20 l_orderkey slice "
        "(oracle updated in lockstep) — the r9 timing drop is a "
        "workload change"
    ),
    "q_basket_pairs": (
        "r10 second block: PLAN change, not workload — the basket "
        "self-join became array pair generation + a DISK_ONLY persist "
        "(sf100 412 -> 222 s, OOM class removed); costs ~+3 s at "
        "sf0.1 by design (SCALE.md round-10 second block)"
    ),
}


def load_run(spec: str) -> dict:
    if spec.startswith("history:"):
        run_id = spec.split(":", 1)[1]
        hits = []
        with (REPO / "BENCH_HISTORY.jsonl").open() as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("run_id") == run_id:
                    hits.append(rec)
        if len(hits) > 1:
            # legacy second-resolution run_ids could collide; a silent
            # first-match here would diff against the wrong run
            raise SystemExit(
                f"run_id {run_id!r} is ambiguous: {len(hits)} history "
                "records share it (pre-ADVICE-r7 second-resolution id)"
            )
        if hits:
            return hits[0]
        raise SystemExit(f"run_id {run_id!r} not in BENCH_HISTORY.jsonl")
    data = json.loads(Path(spec).read_text())
    # driver BENCH_r{N}.json wraps the parsed stdout line
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    return data


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=0.25)
    ap.add_argument("--abs", dest="abs_s", type=float, default=0.3)
    ap.add_argument(
        "--raw",
        action="store_true",
        help="compare raw walls even when both runs carry host_factor",
    )
    args = ap.parse_args()

    old, new = load_run(args.old), load_run(args.new)
    factors = {}
    for tag, rec in (("old", old), ("new", new)):
        host = rec.get("host", {})
        hf = rec.get("host_factor")
        factors[tag] = hf
        norm = (
            f" norm_total={round(rec['value'] / hf, 1)}s (/{hf})"
            if hf and rec.get("value")
            else ""
        )
        print(
            f"{tag}: total={rec.get('value')}s n={len(rec.get('queries', {}))}"
            f" sf={rec.get('sf')} run_id={rec.get('run_id', '-')}"
            f" loadavg={host.get('loadavg_1m', '-')}"
            f" scan_mb_s={host.get('scan_mb_s', '-')}{norm}"
        )
    qo, qn = old.get("queries", {}), new.get("queries", {})
    # normalized comparison (round 10): when BOTH runs carry a
    # host_factor, per-query times are divided by each run's factor
    # before the band test, so host drift between the two runs does
    # not read as regression. --raw disables.
    if not args.raw and factors["old"] and factors["new"]:
        qo = {k: v / factors["old"] for k, v in qo.items()}
        qn = {k: v / factors["new"] for k, v in qn.items()}
        print(
            f"comparing HOST-NORMALIZED times "
            f"(old/{factors['old']}, new/{factors['new']})"
        )
    common = sorted(set(qo) & set(qn))
    print(f"comparable queries: {len(common)}")
    regressions, improvements = [], []
    for q in common:
        a, b = qo[q], qn[q]
        if b > a * (1 + args.band) and b - a > args.abs_s:
            regressions.append((b - a, q, a, b))
        elif a > b * (1 + args.band) and a - b > args.abs_s:
            improvements.append((a - b, q, a, b))
    flagged = []
    for title, rows in (("REGRESSED", regressions), ("improved", improvements)):
        print(f"{title}: {len(rows)}")
        for d, q, a, b in sorted(rows, reverse=True):
            mark = " [workload-change]" if q in WORKLOAD_CHANGES else ""
            print(f"  {q:32s} {a:7.2f}s -> {b:7.2f}s  ({b - a:+.2f}s){mark}")
            if q in WORKLOAD_CHANGES:
                flagged.append(q)
    for q in flagged:
        print(f"note: {q}: {WORKLOAD_CHANGES[q]}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
