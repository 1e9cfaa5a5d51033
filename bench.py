"""Benchmark harness — runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization is via the noop sink (full execution, no driver
collect) — the same measurement a cluster job would see. Session
startup is excluded and each query reports best-of-2 — the identical
methodology BASELINE.md's DuckDB numbers use ("warm cache, best-of-2"),
so the comparison is apples-to-apples: first runs pay one-time
whole-stage-codegen compilation that a warm session amortizes.

Artifacts (VERDICT r6 #3 — each round's record must be
self-contained):
 - stdout: the compact headline line the driver tail-captures into
   BENCH_r{N}.json, carrying ``run_id`` so it links to…
 - BENCH_HISTORY.jsonl: one appended line per run with the FULL
   per-query map plus a host-state stamp (loadavg, free memory, and a
   page-cache warmth proxy), so any later round computes per-query
   deltas against any earlier run without archaeology, and the
   SCALE.md same-day-A/B rule has the data it needs (this host swings
   2-5x with cache state).
 - BENCH_FULL.json: the latest full map (overwritten; kept for the
   tools that read it).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from fhir2sql_spark import registry  # noqa: E402
from fhir2sql_spark.session import get_spark  # noqa: E402


def host_stamp(sf_dir: str) -> dict:
    """Host-state snapshot recorded with every run. ``scan_mb_s`` is a
    page-cache warmth proxy: buffered re-read throughput of the
    largest input file — RAM-speed (>1000 MB/s) when the fixture is
    cached, disk-speed when cold."""
    stamp: dict = {
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
    }
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    stamp["mem_available_mb"] = int(line.split()[1]) // 1024
                    break
    except OSError:
        pass
    try:
        biggest = max(
            Path(sf_dir).glob("*.parquet"), key=lambda p: p.stat().st_size
        )
        n, t0 = 0, time.time()
        with open(biggest, "rb") as f:
            while n < 64 * 1024 * 1024:
                chunk = f.read(8 * 1024 * 1024)
                if not chunk:
                    break
                n += len(chunk)
        dt = max(time.time() - t0, 1e-6)
        stamp["scan_mb_s"] = round(n / 1024 / 1024 / dt, 1)
    except (OSError, ValueError):
        pass
    return stamp


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # pid suffix disambiguates two runs started in the same second —
    # otherwise BENCH_HISTORY.jsonl holds duplicate run_ids and
    # tools/bench_diff.py's history:<run_id> lookup silently returns
    # the first match (ADVICE r7)
    run_id = f"{time.strftime('%Y%m%dT%H%M%S')}-p{os.getpid()}"
    stamp = host_stamp(sf_dir)

    registry.load_all()
    spark = get_spark("bench")

    # warmup: prime codegen/JIT on a trivial plan (not timed)
    registry.QUERIES["q_scan_count"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    full = {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "run_id": run_id,
        "host": stamp,
    }
    # Full per-query detail goes to repo files; the stdout JSON line
    # must stay under the driver's 2000-char tail capture (round 1:
    # the full 103-query dict was ~2900 chars, the captured tail
    # started mid-line, and the driver recorded "parsed": null).
    (REPO / "BENCH_FULL.json").write_text(
        json.dumps(full, indent=1, sort_keys=True)
    )
    with (REPO / "BENCH_HISTORY.jsonl").open("a") as f:
        f.write(json.dumps(full, sort_keys=True, separators=(",", ":")))
        f.write("\n")

    headline = {
        n: timings[n] for n in registry.SHOWCASE_BENCH if n in timings
    }
    line = json.dumps(
        {
            "metric": "suite_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": headline,
            "n_queries": len(timings),
            "run_id": run_id,
            "detail": "BENCH_HISTORY.jsonl",
            "sf": sf,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, f"bench JSON line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
