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

Host-factor normalization (VERDICT r9 #1): every run also measures
the BASELINE.md §B six-query DuckDB oracle set in-process BEFORE and
AFTER the Spark suite and emits ``host_factor`` — the ratio of the
measured oracle sum to the pinned 2026-08-13 constants. This VM's
wall clock drifts up to ~5x with load/cache state, and the drift hits
BOTH engines uniformly, so the gate (BASELINE.md §C) reads the
NORMALIZED wall ``value / host_factor`` ≤ 240 s rather than the raw
wall. The factor rides in the stdout line (``host_factor``,
``norm_value``) so every BENCH_r{N}.json is self-normalizing — no
prose appendix needed to read a noisy-host round correctly.
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

#: BASELINE.md §B constants — DuckDB oracle, warm best-of-2, measured
#: 2026-08-13 on an idle host (seconds). The same six queries re-run
#: in-process at bench time; the ratio of the two sums is the
#: HOST FACTOR that normalizes the suite wall for host drift
#: (VERDICT r9 #1: this VM swings up to ~5x through a day, so a raw
#: wall time is uninterpretable without a same-run oracle A/B).
DUCKDB_PINNED_S = {
    "q_agg_basic": 0.049,
    "q_join_inner": 0.021,
    "q_window_rank": 0.051,
    "q_limit_topk": 0.009,
    "q_tumble": 0.011,
    "q_sync_diff_full": 0.099,
}

#: The constants above were measured on THIS dataset — the host
#: factor must hold the workload constant, so the A/B always probes
#: the pinned directory even when the suite runs at another sf
#: (first smoke run at sf0.01 produced a nonsense 0.36 factor by
#: timing a 10x-smaller oracle workload against sf0.1 constants).
DUCKDB_PINNED_DIR = "/root/testdata/sf0.1"

_ORACLE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_headline(sf_dir: str) -> dict[str, float]:
    """Run the BASELINE.md §B headline oracles through in-process
    DuckDB (registry must be loaded), warm best-of-2 — the identical
    methodology the pinned constants were measured with
    (tools/bench_duckdb.py is the standalone CLI form). Returns
    {query: best_sec}."""
    import duckdb

    con = duckdb.connect()
    try:
        for t in _ORACLE_TABLES:
            p = Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{p}')"
                )
        out: dict[str, float] = {}
        for q in DUCKDB_PINNED_S:
            sql = registry.ORACLE[q]
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            out[q] = round(best, 4)
        return out
    finally:
        con.close()


#: Mid-suite probe cadence (VERDICT r11 #3): the whole-run host factor
#: cannot absorb WITHIN-run load spikes (r11: one contended window made
#: 65 untouched queries read as raw regressions). Probing the pinned
#: DuckDB set every N queries brackets each query between two factor
#: measurements; ``norm_queries`` interpolates between them. The probe
#: itself is ~0.5 s and runs BETWEEN timed regions — per-query timings
#: and the suite ``value`` are computed exactly as before (additive
#: change only).
PROBE_EVERY = 24


def _probe_factor(pinned_sum: float) -> float | None:
    """One guarded DuckDB oracle measurement -> host factor now."""
    try:
        vals = duckdb_headline(DUCKDB_PINNED_DIR)
    except Exception:  # noqa: BLE001 — bench must still emit
        return None
    if not vals:
        return None
    return round(sum(vals.values()) / pinned_sum, 3)


def _interp_factor(x: float, pts: list) -> float | None:
    """Piecewise-linear host factor at suite position ``x`` from the
    (position, factor) probe points; clamps outside the probed range."""
    if not pts:
        return None
    if x <= pts[0][0]:
        return pts[0][1]
    if x >= pts[-1][0]:
        return pts[-1][1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x0 <= x <= x1:
            return y0 + (y1 - y0) * (x - x0) / (x1 - x0)
    return pts[-1][1]


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

    # same-run DuckDB oracle A/B (VERDICT r9 #1): measure the §B
    # headline set BEFORE and AFTER the Spark suite so the host
    # factor brackets any drift across the run. Guarded — a DuckDB
    # failure must not take the bench down with it.
    try:
        ddb_before = duckdb_headline(DUCKDB_PINNED_DIR)
    except Exception:  # noqa: BLE001 — bench must still emit
        ddb_before = {}

    spark = get_spark("bench")

    # warmup: prime codegen/JIT on a trivial plan (not timed)
    registry.QUERIES["q_scan_count"](spark, sf_dir).collect()

    pinned_sum = sum(DUCKDB_PINNED_S.values())
    # (suite position, host factor) probe points bracketing every
    # query (VERDICT r11 #3). Probes run BETWEEN timed regions; the
    # per-query timings and the suite total are untouched.
    probe_pts: list = []
    if ddb_before:
        probe_pts.append(
            (0.0, round(sum(ddb_before.values()) / pinned_sum, 3))
        )

    names = sorted(registry.QUERIES)
    timings: dict[str, float] = {}
    for qi, name in enumerate(names):
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        if (qi + 1) % PROBE_EVERY == 0 and qi + 1 < len(names):
            f = _probe_factor(pinned_sum)
            if f:
                probe_pts.append((float(qi + 1), f))

    total = round(sum(timings.values()), 3)

    try:
        ddb_after = duckdb_headline(DUCKDB_PINNED_DIR)
    except Exception:  # noqa: BLE001
        ddb_after = {}
    # host_factor: mean of the before/after oracle sums over the
    # pinned 2026-08-13 sum. 1.0 = the host the constants were
    # measured on; >1 = this run's host is that much slower, and the
    # gate reads suite_wall / host_factor (BASELINE.md §C, round 10).
    sums = [sum(d.values()) for d in (ddb_before, ddb_after) if d]
    host_factor = (
        round(sum(sums) / len(sums) / pinned_sum, 3) if sums else None
    )
    if ddb_after:
        probe_pts.append(
            (float(len(names)), round(sum(ddb_after.values()) / pinned_sum, 3))
        )
    # per-query normalized seconds (VERDICT r11 #3): each query's raw
    # time divided by the host factor interpolated at its suite
    # position, so a load spike hitting one window of the run no
    # longer reads as a plan regression in that window's queries.
    norm_queries = {}
    for qi, name in enumerate(names):
        f = _interp_factor(qi + 0.5, probe_pts)
        if f:
            norm_queries[name] = round(timings[name] / f, 3)

    full = {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "run_id": run_id,
        "host": stamp,
        "duckdb_headline_s": {
            "before": ddb_before,
            "after": ddb_after,
            "pinned": DUCKDB_PINNED_S,
        },
        "host_factor": host_factor,
        # r12 additions (VERDICT r11 #3) — nothing above changed:
        "probe_factors": [
            {"after_n": int(x), "factor": f} for x, f in probe_pts
        ],
        "norm_queries": norm_queries,
        "norm_total": (
            round(sum(norm_queries.values()), 3) if norm_queries else None
        ),
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
    # stdout carries only the FACTOR and the normalized wall (the
    # 2000-char tail cap — full before/after maps live in
    # BENCH_FULL.json / BENCH_HISTORY.jsonl)
    line = json.dumps(
        {
            "metric": "suite_wall_seconds",
            "value": total,
            "unit": "sec",
            "host_factor": host_factor,
            "norm_value": (
                round(total / host_factor, 1) if host_factor else None
            ),
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
