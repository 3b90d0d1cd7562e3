"""Structured Streaming skin over the batch pipeline.

The reference is invocation-driven — each Lambda call is an isolated
micro-batch with no cross-invocation state, no event-time windows, no
late-data policy (SURVEY.md §2 "Streaming-only": none). That maps 1:1
onto ``foreachBatch``: every micro-batch runs the SAME batch functions
(classify -> enrich -> route), so batch/stream semantics cannot drift.
Forward-fills stay correct because a conversation arrives within one
invocation in the reference model; a cross-batch fill variant would use
``applyInPandasWithState`` (not needed for parity, noted for extension).

Sinks are append-mode parquet (Iceberg in production); the checkpoint
location gives exactly-once per micro-batch — the streaming analog of
the batch job's checkpoint table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..operators.classify import classify
from ..operators.enrich import enrich
from ..operators.melt import melt_project
from ..operators.route import infra_union


def make_batch_processor(conv_meta: DataFrame, out_dir: str, cfg: PipelineConfig | None = None):
    """The foreachBatch function: identical dataflow to plans/job.py."""
    cfg = cfg or PipelineConfig()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        hub = enrich(classify(batch_df, cfg), conv_meta)
        if cfg.infra_enabled:
            infra_union(hub, cfg).sortWithinPartitions(
                "sink", "conv_id", "turn_idx"
            ).write.mode("append").partitionBy("sink").parquet(f"{out_dir}/infra")
        if cfg.logging_enabled:
            melt_project(hub, cfg).write.mode("append").parquet(f"{out_dir}/logging")

    return process


def run_stream(
    spark: SparkSession,
    input_dir: str,
    conv_meta: DataFrame,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    trigger_once: bool = True,
):
    """File-source stream of transcript parquet -> routed sinks.

    ``trigger_once`` drains available input and stops (test/batch-catchup
    mode); otherwise a continuous micro-batch trigger."""
    from ..sources.datagen import to_spark_df  # for schema only

    schema = to_spark_df(spark, []).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(make_batch_processor(conv_meta, out_dir, cfg))
        .option("checkpointLocation", f"{out_dir}/_stream_checkpoint")
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()
