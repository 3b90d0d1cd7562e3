"""Scaling-efficiency evidence for the north rule: the same job at two
parallelism levels (local[8] = N, local[32] = 4N — the sandbox proxy for
N vs 4N executors), throughput at both, efficiency = (tps_4N/tps_N)/4.

Runs bench.py in subprocesses (one SparkContext per JVM), writes
BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [sf_dir] [amplify]
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(
    sf_dir: str, cpus: int, amplify: int, repeat: int = 3, master: str | None = None
) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_AMPLIFY=str(amplify),
        SPARK_GRAFT_REPEAT=str(repeat),
    )
    # the docs-ops / media-codec / bucketed-pair sections are throughput
    # benchmarks, not part of the N-vs-4N job; skip them in scaling arms
    # unless explicitly requested (they roughly double each arm's wall)
    env.setdefault("SPARK_GRAFT_DOCS_AMPLIFY", "0")
    env.setdefault("SPARK_GRAFT_JPEG_BENCH", "0")
    env.setdefault("SPARK_GRAFT_BUCKETED_PAIR", "0")
    env.setdefault("SPARK_GRAFT_CHUNK_BENCH", "0")
    if master:
        # e.g. local-cluster[4,8,14336]: real SEPARATE executor JVMs —
        # own heap/GC each, netty shuffle between processes (the faithful
        # N-vs-4N-executor topology); taskset still bounds total cores
        env["SPARK_GRAFT_MASTER"] = master
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    # local[N] bounds TASK SLOTS only — GC, netty, parquet writer threads
    # and Python workers spill onto other cores, flattering the small
    # level. taskset pins the whole process tree to exactly N cores, which
    # is what "an N-core executor" means.
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _capacity_note(n_big: int) -> str:
    if n_big < 32:
        return (
            "Both levels fit in the machine's spare capacity so the ratio "
            "measures the engine, not the neighbors."
        )
    return (
        "The 4N arm is the WHOLE shared box, so its wall times include "
        "co-tenant contention; the CPU-based figure below is the "
        "contention-resistant one."
    )


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # N vs 4N parallelism. Default 2 vs 8 rather than 8 vs 32: this box is
    # shared — a 32-thread job fights co-tenants for every core (observed:
    # local[32] slower than local[8] under load), while 2 and 8 threads
    # both fit in spare capacity, so the ratio measures the ENGINE's
    # scaling, not the neighbors'. Override with SCALE_LEVELS=8,32.
    levels = tuple(
        int(x) for x in os.environ.get("SCALE_LEVELS", "2,8").split(",")
    )
    # SCALE_MASTERS="local-cluster[1,8,14336];local-cluster[4,8,14336]"
    # pairs a master topology with each level (total cores must equal the
    # SCALE_LEVELS entry so taskset pinning stays correct)
    masters_env = os.environ.get("SCALE_MASTERS")
    masters: dict[int, str] = {}
    if masters_env:
        parts = masters_env.split(";")
        # zip() would silently drop/mispair on a count mismatch and label
        # a run with the wrong topology (ADVICE r3)
        assert len(parts) == len(levels), (
            f"SCALE_MASTERS has {len(parts)} entries but SCALE_LEVELS has "
            f"{len(levels)} — they must pair 1:1"
        )
        for lvl, m in zip(levels, parts):
            masters[lvl] = m

    # Interleave the two parallelism levels across rounds so co-tenant CPU
    # noise (2-5x wall variance on this box) hits both equally; keep the
    # best (min job_total -> max tps) observation per level.
    results: dict[int, dict] = {}
    loads: list[float] = []
    for rnd in range(rounds):
        for cpus in levels:
            loads.append(loadavg())
            lbl = masters.get(cpus) or f"local[{cpus}]"
            print(f"round {rnd}: {lbl} (loadavg {loads[-1]}) ...", flush=True)
            r = run_bench(sf_dir, cpus, amplify, repeat=2, master=masters.get(cpus))
            print(json.dumps(r), flush=True)
            if cpus not in results or r["value"] > results[cpus]["value"]:
                prev = results.get(cpus)
                if prev:
                    r["queries"]["job_total_all_runs"] = (
                        prev["queries"]["job_total_all_runs"]
                        + r["queries"]["job_total_all_runs"]
                    )
                results[cpus] = r
            else:
                results[cpus]["queries"]["job_total_all_runs"] += r["queries"][
                    "job_total_all_runs"
                ]

    n_small, n_big = levels
    lbl_small = masters.get(n_small, f"local[{n_small}]")
    lbl_big = masters.get(n_big, f"local[{n_big}]")
    tps8 = results[n_small]["value"]
    tps32 = results[n_big]["value"]
    factor = n_big / n_small
    eff = (tps32 / tps8) / factor if tps8 else 0.0
    # CPU-based efficiency (co-tenant-IMMUNE): turns-per-CPU-second at 4N
    # vs N. Wall time on this shared box depends on the neighbors; CPU
    # seconds consumed by our own process tree do not. 1.0 = the engine
    # does the same total work at both widths (no parallelism overhead).
    cpu_small = min(results[n_small]["queries"]["job_cpu_all_runs"])
    cpu_big = min(results[n_big]["queries"]["job_cpu_all_runs"])
    eff_cpu = cpu_small / cpu_big if cpu_big else 0.0
    tpc_small = results[n_small]["queries"]["turns_per_cpu_sec"]
    tpc_big = results[n_big]["queries"]["turns_per_cpu_sec"]

    md = f"""# BENCH/BASELINE — measured numbers (graded targets in /BASELINE.md)

Generated {datetime.date.today().isoformat()} by `scripts/scaling_bench.py`
on local mode. This sandbox is a SHARED 32-core box (loadavg during runs:
{[round(x,1) for x in loads]}); identical jobs vary 2-5x in wall time with
co-tenant load, so each level reports the min over {rounds}x2 interleaved
full-job runs, and the levels are {lbl_small} vs {lbl_big},
each PINNED with `taskset -c 0-(N-1)` so the whole process tree (task
slots, GC, shuffle/netty and Python workers) really uses N cores — the
honest proxy for an N-core executor. {_capacity_note(n_big)}

## End-to-end pipeline throughput (writes included)

Input: {results[n_big]["n_turns"]:,} turns derived+amplified (x{amplify}) from
`{sf_dir}/events.parquet`; job = classified-hub write -> partitioned infra
write -> logging (MELT) write, exactly plans/job.py minus chunk stage.

| parallelism | turns/sec | job wall (best) | turns per CPU-sec | job CPU-sec (min) | stage timings (s) |
|---|---|---|---|---|---|
| {lbl_small}  (N)  | {tps8:,.0f} | {results[n_small]["queries"]["job_total"]:.1f}s | {tpc_small:,.0f} | {cpu_small:.1f} | hub {results[n_small]["queries"]["hub_write"]:.1f} / infra {results[n_small]["queries"]["infra_write"]:.1f} / logging {results[n_small]["queries"]["logging_write"]:.1f} |
| {lbl_big} (4N) | {tps32:,.0f} | {results[n_big]["queries"]["job_total"]:.1f}s | {tpc_big:,.0f} | {cpu_big:.1f} | hub {results[n_big]["queries"]["hub_write"]:.1f} / infra {results[n_big]["queries"]["infra_write"]:.1f} / logging {results[n_big]["queries"]["logging_write"]:.1f} |

**Scaling efficiency (N -> 4N): wall-based {eff:.2f}, CPU-based {eff_cpu:.2f}**
(target >= 0.8, BASELINE.json north rule; sandbox proxy for N vs 4N executor
clusters — no real cluster available here). CPU-based = (turns/CPU-sec at
4N) / (turns/CPU-sec at N) = min-CPU(N)/min-CPU(4N), counting ONLY this
process tree's CPU via /proc — immune to co-tenant wall noise: it asks
"does the engine burn more total work per turn when 4x wider?", which is
exactly what would cap throughput scaling on a real dedicated cluster.

All job wall times observed (noise visibility):
{lbl_small}: {results[n_small]["queries"]["job_total_all_runs"]} —
{lbl_big}: {results[n_big]["queries"]["job_total_all_runs"]}

## Per-sink routed-row counts (identical at both levels — parity gate)

| sink | rows |
|---|---|
| infra-lambda (filtered) | {results[n_big]["sink_counts"]["infra_lambda_rows"]:,} |
| infra-vpc | {results[n_big]["sink_counts"]["infra_vpc_rows"]:,} |
| infra-other | {results[n_big]["sink_counts"]["infra_other_rows"]:,} |
| logging (unfiltered tee) | {results[n_big]["sink_counts"]["logging_rows"]:,} |

Counts equal at both levels: {results[n_small]["sink_counts"] == results[n_big]["sink_counts"]}.

## Chunk replay (grouped applyInPandas, 5% conversation sample)

{lbl_big}: {results[n_big]["queries"]["chunk_replay_5pct"]:.1f}s —
{lbl_small}: {results[n_small]["queries"]["chunk_replay_5pct"]:.1f}s.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # Raw generated reports ACCUMULATE in BENCH/scaling_runs.md;
    # BENCH/BASELINE.md is the hand-curated summary (a past default-run
    # overwrote its three-pair evidence table — never clobber it again).
    target = os.path.join(REPO, "BENCH", "scaling_runs.md")
    # SCALE_SECTION=<title> labels this campaign in the run log
    section = os.environ.get("SCALE_SECTION") or (
        f"Campaign {datetime.date.today().isoformat()}: "
        f"{lbl_small} vs {lbl_big}"
    )
    body = "\n\n---\n\n# " + section + "\n" + md.split("\n", 1)[1]
    with open(target, "a") as f:
        f.write(body)
    print(md)


if __name__ == "__main__":
    main()
