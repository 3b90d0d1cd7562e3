"""Sink router — the fan-out that replaces the reference's dual HTTP send.

The reference tees every entry to up to two families (infra default-on,
logging default-off; /root/reference/src/function.py:251-275), with the
infra URL path picked by EntryType (:384-393) and the infra-LAMBDA branch
dropping non-(REPORT|lambda-message) lines first (:252-257). Here each
family/EntryType combination is a filtered write to its own table —
separate tables (not a partition column) because the sinks carry
different schemas, exactly like the reference's differently-shaped
payloads (SURVEY.md §2 row 15).

Writes sort within partitions by (conv_id, turn_idx) so per-turn order —
load-bearing in the reference's tests — is physically preserved and
run-length encodes well in parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..functions import patterns as P
from .classify import SINK_LAMBDA, SINK_OTHER, SINK_VPC

INFRA_SINKS = (SINK_LAMBDA, SINK_VPC, SINK_OTHER)

# EntryType -> ingest path segment (/root/reference/src/function.py:113-117),
# kept as routing metadata on the manifest.
INFRA_SERVICE_PATHS = {SINK_LAMBDA: "/aws/lambda", SINK_VPC: "/aws/vpc", SINK_OTHER: "/aws"}


def _survives_col(classified: DataFrame) -> F.Column:
    """The lambda-sink survival predicate, reusing the parse-flag columns
    when the classifier already materialised them (is_report |
    is_lambda_msg IS the predicate — ``with_parse_flags`` computed it
    from the same text), so the router/counter never re-runs the three
    regexes over 10^12 rows (guide §2.3: don't recompute what a prior
    stage already shuffled/stored). Falls back to the text regexes for
    frames without the flags."""
    if "is_report" in classified.columns and "is_lambda_msg" in classified.columns:
        return F.col("is_report") | F.col("is_lambda_msg")
    return P.survives_lambda_filter(F.col("text"))


def infra_url(sink: str, cfg: PipelineConfig | None = None) -> str:
    """Full ingest URL for one infra sink: region endpoint + EntryType
    path + version (reference _get_infra_url
    /root/reference/src/function.py:384-393; pinned by
    test/entry_type_test.py:57-84)."""
    from ..config import INGEST_SERVICE_VERSION, resolve_infra_endpoint

    cfg = cfg or PipelineConfig()
    return resolve_infra_endpoint(cfg) + INFRA_SERVICE_PATHS[sink] + "/" + INGEST_SERVICE_VERSION


def infra_rows(classified: DataFrame, sink: str, cfg: PipelineConfig | None = None) -> DataFrame:
    """Rows reaching the given infra sink.

    LAMBDA applies the survival filter (+ optional .NET reformat of the
    SURVIVORS — format_agent_logs runs inside the filter loop, reference
    :199-202); VPC/OTHER pass through unfiltered (:259-261).
    """
    cfg = cfg or PipelineConfig()
    df = classified.filter(F.col("sink") == sink)
    if sink == SINK_LAMBDA:
        df = df.filter(_survives_col(classified))
        if cfg.format_logs:
            df = df.withColumn("text", P.format_agent_logs(F.col("text")))
    return df


def write_sink(df: DataFrame, path: str, order_cols=("conv_id", "turn_idx")) -> None:
    """Overwrite-write one sink table, order preserved within files.

    Parquet + overwrite here; on a real deployment this is an Iceberg
    ``writeTo(...).overwritePartitions()`` whose atomic snapshot commit
    provides the idempotency the reference approximates with HTTP retries
    (SURVEY.md §2 row 17)."""
    from .checkpoint import parquet_text_options

    df.sortWithinPartitions(*order_cols).write.mode("overwrite").options(
        **parquet_text_options(df)
    ).parquet(path)


def infra_union(classified: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """All infra rows in ONE pass, keeping ``sink`` as a partition column.

    The three infra sinks share a schema, so a single write with
    ``partitionBy('sink')`` replaces three filtered jobs — one scan, one
    sort, one commit instead of three (the reference's three URL paths
    map to the three partition directories). The lambda filter and
    optional reformat apply only to lambda-sink rows.
    """
    cfg = cfg or PipelineConfig()
    # The hub may carry the MELT fill columns (materialised for the
    # logging sink); the infra payload is the raw filtered entry and
    # never attaches them (/root/reference/src/function.py:255-261) —
    # drop to keep the infra schema (and write bytes) unchanged.
    survives = _survives_col(classified)
    classified = classified.drop("trace_id", "lambda_request_id")
    is_lambda = F.col("sink") == SINK_LAMBDA
    keep = ~is_lambda | survives
    df = classified.filter(keep)
    if cfg.format_logs:
        df = df.withColumn(
            "text",
            F.when(is_lambda, P.format_agent_logs(F.col("text"))).otherwise(F.col("text")),
        )
    return df


def route_counts(classified: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Per-sink routed-row counts (the graded aggregate) in ONE pass.

    Instead of 4 filtered count() jobs, compute a conditional aggregation:
    infra-lambda counts only surviving rows, vpc/other count all rows,
    logging counts every row (the unfiltered tee, reference :270).
    """
    cfg = cfg or PipelineConfig()
    survives = _survives_col(classified)
    agg = classified.agg(
        F.sum(((F.col("sink") == SINK_LAMBDA) & survives).cast("long")).alias("infra_lambda_rows"),
        F.sum((F.col("sink") == SINK_VPC).cast("long")).alias("infra_vpc_rows"),
        F.sum((F.col("sink") == SINK_OTHER).cast("long")).alias("infra_other_rows"),
        F.count(F.lit(1)).alias("logging_rows"),
    )
    if not cfg.infra_enabled:
        agg = agg.withColumn("infra_lambda_rows", F.lit(0).cast("long")).withColumn(
            "infra_vpc_rows", F.lit(0).cast("long")
        ).withColumn("infra_other_rows", F.lit(0).cast("long"))
    if not cfg.logging_enabled:
        agg = agg.withColumn("logging_rows", F.lit(0).cast("long"))
    return agg
