"""Measure incremental-ingest economics: bootstrap over the full corpus
vs ingesting a +1% conversation batch into the existing state.

    SPARK_GRAFT_CPUS=32 python scripts/incremental_bench.py \
        [sf_dir] [amplify] [pct_new]

Prints one JSON line: bootstrap wall/CPU, increment wall/CPU, and the
ratio — the evidence for "per-run work proportional to the NEW data"
(plans/incremental.py). Conversations are amplified exactly like
bench.py (conv_id suffix per copy); the new batch is a conversation-
aligned 1% slice, the realistic growth unit.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_log_ingestion_spark.config import PipelineConfig
from aws_log_ingestion_spark.plans.incremental import run_incremental
from aws_log_ingestion_spark.session import get_spark
from aws_log_ingestion_spark.sources import derive


def tree_cpu() -> float:
    import glob

    procs = {}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as f:
                s = f.read()
        except OSError:
            continue
        pid = int(s.split(" ", 1)[0])
        rest = s[s.rindex(")") + 2 :].split(" ")
        ticks = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        procs[pid] = (int(rest[1]), ticks)
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [os.getpid()]
    while stack:
        p = stack.pop()
        if p in procs:
            total += procs[p][1]
            stack.extend(children.get(p, []))
    return total / os.sysconf("SC_CLK_TCK")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    pct_new = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("incremental-bench", cores=cpus, shuffle_partitions=cpus)

    work = tempfile.mkdtemp(prefix="incbench_")
    in_dir = os.path.join(work, "input")
    os.makedirs(in_dir)
    t = derive.transcripts_from_events(spark, sf_dir)
    if amplify > 1:
        k = F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("k")
        t = (
            t.select("*", k)
            .withColumn("conv_id", F.concat("conv_id", F.lit("_"), F.col("k")))
            .drop("k")
        )
    # conversation-aligned split: crc32 % 100 picks the "new" slice
    slice_col = F.crc32("conv_id") % 100
    cut = int(round(pct_new))
    t.filter(slice_col >= cut).repartition(64).write.parquet(f"{work}/stage_base")
    t.filter(slice_col < cut).repartition(4).write.parquet(f"{work}/stage_new")

    def publish(stage: str, prefix: str) -> int:
        n = 0
        for fname in sorted(os.listdir(stage)):
            if fname.endswith(".parquet"):
                shutil.copy(
                    os.path.join(stage, fname),
                    os.path.join(in_dir, f"{prefix}_{n}.parquet"),
                )
                n += 1
        return n

    cfg = PipelineConfig(logging_enabled=True)
    out = os.path.join(work, "out")
    report: dict = {"sf": sf_dir, "amplify": amplify, "pct_new": pct_new, "cpus": cpus}

    publish(f"{work}/stage_base", "base")
    w0, c0 = time.time(), tree_cpu()
    boot = run_incremental(spark, in_dir, out, cfg)
    report["bootstrap_wall"] = round(time.time() - w0, 2)
    report["bootstrap_cpu"] = round(tree_cpu() - c0, 2)
    report["bootstrap_rows"] = sum(boot["counts"].values())

    publish(f"{work}/stage_new", "inc")
    w1, c1 = time.time(), tree_cpu()
    inc = run_incremental(spark, in_dir, out, cfg)
    report["increment_wall"] = round(time.time() - w1, 2)
    report["increment_cpu"] = round(tree_cpu() - c1, 2)
    report["increment_rows"] = sum(inc["counts"].values()) - report["bootstrap_rows"]
    report["superseded_convs"] = inc["superseded_convs"]
    report["wall_ratio"] = round(report["increment_wall"] / report["bootstrap_wall"], 4)
    report["cpu_ratio"] = round(report["increment_cpu"] / report["bootstrap_cpu"], 4)

    print(json.dumps(report))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
