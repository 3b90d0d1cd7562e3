"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The headline metric is the graded one (BASELINE.json): end-to-end
parse->classify->enrich->route throughput in turns/sec over the derived
transcript table. Individual query timings ride along in "queries".
Transcripts are amplified ~AMPLIFYx from the sf events table (cheap
crossJoin with a literal range) so the pipeline measures real work, not
session overhead, at every sf.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from aws_log_ingestion_spark.config import PipelineConfig
from aws_log_ingestion_spark.operators.chunks import chunk_replay, chunk_totals
from aws_log_ingestion_spark.operators.classify import classify
from aws_log_ingestion_spark.operators.enrich import enrich
from aws_log_ingestion_spark.operators.melt import melt_project
from aws_log_ingestion_spark.operators.route import route_counts
from aws_log_ingestion_spark.session import get_spark
from aws_log_ingestion_spark.sources import derive

AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))


def amplified_transcripts(spark, sf_dir: str, factor: int):
    """Deterministically amplify the derived transcripts: each copy k gets
    conv_id suffixed ('c12_k') so conversations stay intact and the
    conv-count grows by `factor` — the realistic growth axis (more
    conversations, not longer ones)."""
    t = derive.transcripts_from_events(spark, sf_dir)
    if factor <= 1:
        return t
    k = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    return (
        t.select("*", k)
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_"), F.col("k")))
        .drop("k")
    )


def run_once(spark, sf_dir: str, factor: int) -> dict:
    cfg = PipelineConfig(logging_enabled=True)
    timings: dict[str, float] = {}

    t = amplified_transcripts(spark, sf_dir, factor)
    meta = derive.conv_meta_from_events(spark, sf_dir)

    t0 = time.time()
    n_turns = t.count()
    timings["derive_count"] = time.time() - t0

    # headline: full parse -> classify(window) -> enrich(broadcast) ->
    # route counts + melt projection count (both sink families exercised)
    t0 = time.time()
    hub = enrich(classify(t, cfg), meta)
    counts = route_counts(hub, cfg).collect()[0].asDict()
    timings["pipeline_route"] = time.time() - t0

    t0 = time.time()
    melt_rows = melt_project(hub, cfg, decode_traces=True).count()
    timings["pipeline_melt"] = time.time() - t0

    headline = timings["pipeline_route"] + timings["pipeline_melt"]
    tps = n_turns * 2 / headline if headline > 0 else 0.0  # 2 passes over turns

    # chunk replay on a bounded sample of conversations (the applyInPandas
    # operator's cost scales with turns; sample keeps bench wall-time sane)
    t0 = time.time()
    sample = hub.filter(F.crc32(F.col("conv_id")) % 20 == 0)
    chunk_totals(chunk_replay(sample, "logging", cfg)).collect()
    timings["chunk_replay_5pct"] = time.time() - t0

    return {
        "n_turns": n_turns,
        "counts": counts,
        "melt_rows": melt_rows,
        "turns_per_sec": tps,
        "timings": timings,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = get_spark("bench", cores=cpus)
    # warm up JVM/Python workers so the measurement isn't session startup
    spark.range(1000).select(F.sum("id")).collect()

    result = run_once(spark, sf_dir, AMPLIFY)

    queries = {k: round(v, 3) for k, v in result["timings"].items()}
    print(
        json.dumps(
            {
                "metric": "end-to-end parse->route throughput",
                "value": round(result["turns_per_sec"], 1),
                "unit": "turns/sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_turns": result["n_turns"],
                "amplify": AMPLIFY,
                "cpus": cpus,
                "sink_counts": {k: int(v) for k, v in result["counts"].items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
