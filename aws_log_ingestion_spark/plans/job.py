"""End-to-end pipeline plan: scan -> parse -> classify -> enrich -> route
-> chunk-aggregate -> checkpoint.

The Spark lifecycle equivalent of ``lambda_handler`` ->
``_send_log_entry`` (/root/reference/src/function.py:626-656,223-283),
per SURVEY.md §3.1: narrow regex ops fuse into one codegen stage; the
conv_id window (classification any() + both forward fills) is the single
wide exchange; the enrich join is broadcast (no shuffle); the parsed &
classified frame is cached once and fanned out to all sinks.

Run via spark-submit:
    spark-submit --py-files dist/aws_log_ingestion_spark.zip \
        -m aws_log_ingestion_spark.plans.job <in_sf_dir> <out_dir>
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import PipelineConfig
from ..operators import checkpoint as ckpt
from ..operators import chunks as chunk_op
from ..operators.classify import classify
from ..operators.enrich import enrich
from ..operators.melt import melt_project
from ..operators.route import INFRA_SINKS, infra_rows, route_counts
from ..sources.derive import conv_meta_from_events, transcripts_from_events


def prepare(
    transcripts: DataFrame,
    conv_meta: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Parse + classify + enrich (the cached hub DataFrame)."""
    cfg = cfg or PipelineConfig()
    return enrich(classify(transcripts, cfg), conv_meta)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    conv_meta: DataFrame,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    resume: bool = True,
) -> dict:
    """Execute the full fan-out; returns the manifest dict.

    Idempotent: re-running with the same out_dir skips sinks whose
    checkpoint record exists (kill-and-resume converges to identical
    counts — BASELINE.md "Resume idempotency")."""
    cfg = cfg or PipelineConfig()
    log = ckpt.CheckpointLog(out_dir)
    if not resume:
        log.clear()

    hub = prepare(transcripts, conv_meta, cfg).cache()

    counts: dict[str, int] = {}
    if cfg.infra_enabled:
        for sink in INFRA_SINKS:
            rows = infra_rows(hub, sink, cfg)
            counts[f"infra_{sink}_rows"] = ckpt.observed_write(
                rows, f"{out_dir}/infra_{sink}", log, f"infra_{sink}"
            )
    if cfg.logging_enabled:
        melted = melt_project(hub, cfg)
        counts["logging_rows"] = ckpt.observed_write(
            melted, f"{out_dir}/logging", log, "logging"
        )

    # chunk aggregate: infra per sink (filtered for lambda) + logging
    if not log.is_done("chunks"):
        stats_frames = []
        if cfg.infra_enabled:
            infra_all = None
            for sink in INFRA_SINKS:
                part = infra_rows(hub, sink, cfg)
                infra_all = part if infra_all is None else infra_all.unionByName(part)
            stats_frames.append(chunk_op.chunk_replay(infra_all, "infra", cfg))
        if cfg.logging_enabled:
            stats_frames.append(chunk_op.chunk_replay(hub, "logging", cfg))
        if stats_frames:
            stats = stats_frames[0]
            for extra in stats_frames[1:]:
                stats = stats.unionByName(extra)
            stats.write.mode("overwrite").parquet(f"{out_dir}/chunk_stats")
            totals = chunk_op.chunk_totals(
                spark.read.parquet(f"{out_dir}/chunk_stats")
            ).collect()
            log.record(
                "chunks",
                {
                    "totals": [r.asDict() for r in totals],
                    "rows": int(sum(r["n_chunks"] for r in totals)),
                },
            )

    hub.unpersist()
    manifest = ckpt.read_manifest(spark, out_dir)
    return {"counts": counts, "manifest": manifest}


def main(argv: list[str]) -> None:
    from ..session import get_spark

    in_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    out_dir = argv[2] if len(argv) > 2 else "/tmp/pipeline_out"
    spark = get_spark("transcript-log-pipeline")
    cfg = PipelineConfig(logging_enabled=True)
    transcripts = transcripts_from_events(spark, in_dir)
    conv_meta = conv_meta_from_events(spark, in_dir)
    result = run_pipeline(spark, transcripts, conv_meta, out_dir, cfg)
    print(result["counts"])


if __name__ == "__main__":
    main(sys.argv)
