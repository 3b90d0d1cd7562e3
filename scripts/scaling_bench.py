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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, amplify: int, repeat: int = 3) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_AMPLIFY=str(amplify),
        SPARK_GRAFT_REPEAT=str(repeat),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # Interleave the two parallelism levels across rounds so co-tenant CPU
    # noise (2-5x wall variance on this box) hits both equally; keep the
    # best (min job_total -> max tps) observation per level.
    results: dict[int, dict] = {}
    for rnd in range(rounds):
        for cpus in (8, 32):
            print(f"round {rnd}: local[{cpus}] ...", flush=True)
            r = run_bench(sf_dir, cpus, amplify, repeat=2)
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

    tps8 = results[8]["value"]
    tps32 = results[32]["value"]
    eff = (tps32 / tps8) / 4 if tps8 else 0.0

    md = f"""# BENCH/BASELINE — measured numbers (graded targets in /BASELINE.md)

Generated {datetime.date.today().isoformat()} by `scripts/scaling_bench.py`
on local mode (single JVM, co-tenant CPU noise mitigated by min-of-
{results[32]["repeat"]} full-job repetitions; see bench.py docstring).

## End-to-end pipeline throughput (writes included)

Input: {results[32]["n_turns"]:,} turns derived+amplified (x{amplify}) from
`{sf_dir}/events.parquet`; job = classified-hub write -> partitioned infra
write -> logging (MELT) write, exactly plans/job.py minus chunk stage.

| parallelism | turns/sec | job wall (best) | stage timings (s) |
|---|---|---|---|
| local[8]  (N)  | {tps8:,.0f} | {results[8]["queries"]["job_total"]:.1f}s | hub {results[8]["queries"]["hub_write"]:.1f} / infra {results[8]["queries"]["infra_write"]:.1f} / logging {results[8]["queries"]["logging_write"]:.1f} |
| local[32] (4N) | {tps32:,.0f} | {results[32]["queries"]["job_total"]:.1f}s | hub {results[32]["queries"]["hub_write"]:.1f} / infra {results[32]["queries"]["infra_write"]:.1f} / logging {results[32]["queries"]["logging_write"]:.1f} |

**Scaling efficiency (N -> 4N): {eff:.2f}** (target >= 0.8, BASELINE.json
north rule; sandbox proxy for N vs 4N executor clusters — no real cluster
available here).

All job wall times observed (noise visibility):
local[8]: {results[8]["queries"]["job_total_all_runs"]} —
local[32]: {results[32]["queries"]["job_total_all_runs"]}

## Per-sink routed-row counts (identical at both levels — parity gate)

| sink | rows |
|---|---|
| infra-lambda (filtered) | {results[32]["sink_counts"]["infra_lambda_rows"]:,} |
| infra-vpc | {results[32]["sink_counts"]["infra_vpc_rows"]:,} |
| infra-other | {results[32]["sink_counts"]["infra_other_rows"]:,} |
| logging (unfiltered tee) | {results[32]["sink_counts"]["logging_rows"]:,} |

Counts equal at local[8] and local[32]: {results[8]["sink_counts"] == results[32]["sink_counts"]}.

## Chunk replay (grouped applyInPandas, 5% conversation sample)

local[32]: {results[32]["queries"]["chunk_replay_5pct"]:.1f}s —
local[8]: {results[8]["queries"]["chunk_replay_5pct"]:.1f}s.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
