"""Pipeline configuration.

Mirrors the reference's environment-variable surface (see
``/root/reference/src/function.py:86-88,342-343,366-371,463-468``) as a
plain dataclass: configuration is job-level, not data-level, so it never
appears as DataFrame columns except where attached as literal metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Reference: MAX_PAYLOAD_SIZE = 1000 * 1024 (/root/reference/src/function.py:76)
MAX_PAYLOAD_SIZE = 1000 * 1024

# Reference: LOGGING_LAMBDA_VERSION / LOGGING_PLUGIN_METADATA
# (/root/reference/src/function.py:124-125)
PLUGIN_TYPE = "lambda"
PLUGIN_VERSION = "2.11.2"


def parse_tags(tags_str: str, delimiter: str = ";") -> dict[str, str]:
    """Parse ``k:v;k2:v2`` tag strings, dropping ``aws:``/``plugin:`` keys.

    Semantics of ``_get_newrelic_tags`` (/root/reference/src/function.py:335-350):
    items are split on the delimiter, each item split on the FIRST colon is
    a (key, value) pair, and any item whose text starts with ``aws:`` or
    ``plugin:`` is discarded before merging.
    """
    if not tags_str:
        return {}
    return dict(
        item.split(":", 1)
        for item in tags_str.split(delimiter)
        if item and not item.startswith(("aws:", "plugin:"))
    )


@dataclass(frozen=True)
class PipelineConfig:
    """Job-level switches, defaulted to the reference's defaults."""

    # NR_LAMBDA_LOG_GROUP_PREFIX (/root/reference/src/function.py:86)
    lambda_prefix: str = "/aws/lambda"
    # NR_VPC_LOG_GROUP_PREFIX (/root/reference/src/function.py:87)
    vpc_prefix: str = "/aws/vpc/flow-logs"
    # NEW_RELIC_FORMAT_LOGS (/root/reference/src/function.py:88) — .NET agent
    # 4-part tab reformat of surviving infra-lambda lines.
    format_logs: bool = False
    # INFRA_ENABLED default true (/root/reference/src/function.py:366-371)
    infra_enabled: bool = True
    # LOGGING_ENABLED default false (/root/reference/src/function.py:463-468)
    logging_enabled: bool = False
    # NR_TAGS / NR_ENV_DELIMITER (/root/reference/src/function.py:342-343)
    tags: dict[str, str] = field(default_factory=dict)
    # payload cap for the chunk-split replay (reference :76)
    max_payload_size: int = MAX_PAYLOAD_SIZE
