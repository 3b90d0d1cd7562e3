"""Broadcast metadata enrichment + common-attribute attachment.

The reference attaches (a) the Lambda execution context — four strings —
to every infra payload (/root/reference/src/function.py:231-236), and
(b) a ``common.attributes`` block {plugin, aws:{logGroup, logStream}} to
every logging payload (:549-562), then merges NR_TAGS env tags (:335-350).

The north rule promotes (a)+(b) from constant-attach to a real broadcast
equi-join on ``(conv_id, tool)`` against the ``conv_meta`` lookup table.
The lookup is small (≤10^4 rows per FIXTURES.md §2) so ``broadcast()`` is
honest: zero shuffle on the 10^12-row fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PLUGIN_TYPE, PLUGIN_VERSION, PipelineConfig


CONTEXT_COLS = [
    "function_name",
    "invoked_function_arn",
    "log_group_name",
    "log_stream_name",
]


def enrich(df: DataFrame, conv_meta: DataFrame) -> DataFrame:
    """Left broadcast join on (conv_id, tool) -> owner + 4 context columns.

    Left join: a transcript row with no metadata still flows (the
    reference never drops events for missing context — context is always
    present there; absence here yields NULL context columns).
    """
    meta = conv_meta.select("conv_id", "tool", "owner", *CONTEXT_COLS)
    return df.join(F.broadcast(meta), ["conv_id", "tool"], "left")


def with_common_attributes(df: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Attach the MELT ``common.attributes`` block as flat columns.

    plugin type/version are constants (:124-125); logGroup/logStream come
    from the enrichment join (:555-558). NR tags (:335-350) are job config
    parsed once on the driver and attached as literal columns — exactly
    the reference's merge-into-common semantics, minus per-row work.
    """
    cfg = cfg or PipelineConfig()
    out = (
        df.withColumn("plugin_type", F.lit(PLUGIN_TYPE))
        .withColumn("plugin_version", F.lit(PLUGIN_VERSION))
    )
    for k, v in sorted(cfg.tags.items()):
        out = out.withColumn(f"tag_{k}", F.lit(v))
    return out
