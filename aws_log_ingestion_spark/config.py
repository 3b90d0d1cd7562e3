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

# Region endpoint tables (/root/reference/src/function.py:107-112).
# This engine does no network IO — the resolved endpoint is ROUTING
# METADATA recorded on the job manifest, the analog of the reference
# picking an ingest URL per send (:384-393,422-434,494-508).
LOGGING_ENDPOINTS = {
    "us": "https://log-api.newrelic.com/log/v1",
    "eu": "https://log-api.eu.newrelic.com/log/v1",
    "jp": "https://log-api.jp.newrelic.com/log/v1",
}
INFRA_ENDPOINTS = {
    "us": "https://cloud-collector.newrelic.com",
    "eu": "https://cloud-collector.eu01.nr-data.net",
    "jp": "https://cloud-collector.jp.nr-data.net",
}
# INGEST_SERVICE_VERSION (/root/reference/src/function.py:118)
INGEST_SERVICE_VERSION = "v1"


def debug_logging_enabled(env_value: str | None) -> bool:
    """DEBUG_LOGGING_ENABLED semantics (/root/reference/src/function.py:
    353-359): case-insensitive 'true' enables, anything else (or unset)
    is false. Drives the Spark log level in session.get_spark."""
    return (env_value or "false").lower() == "true"


def region_for_license_key(license_key: str) -> str:
    """License-key prefix -> ingest region (reference :429-434,500-508):
    'eu'/'jp' prefixes pick those regions, anything else is US."""
    if license_key.startswith("eu"):
        return "eu"
    if license_key.startswith("jp"):
        return "jp"
    return "us"


def resolve_infra_endpoint(cfg: "PipelineConfig") -> str:
    """NR_INFRA_ENDPOINT override wins, else the license-key region
    (reference _get_infra_endpoint :422-434). The reference checks env-var
    PRESENCE (``'NR_INFRA_ENDPOINT' in os.environ``), so a set-but-empty
    override is honored verbatim — model that as None-vs-set, not truthiness."""
    if cfg.infra_endpoint is not None:
        return cfg.infra_endpoint
    return INFRA_ENDPOINTS[region_for_license_key(cfg.license_key)]


def resolve_logging_endpoint(cfg: "PipelineConfig", ingest_url: str | None = None) -> str:
    """Precedence: explicit ingest_url > NR_LOGGING_ENDPOINT override >
    license-key region (reference _get_logging_endpoint :494-508).
    ``ingest_url`` is truthiness-tested (reference ``if ingest_url:``) but
    the env-var override is a PRESENCE check — '' set is honored."""
    if ingest_url:
        return ingest_url
    if cfg.ingest_url:
        return cfg.ingest_url
    if cfg.logging_endpoint is not None:
        return cfg.logging_endpoint
    return LOGGING_ENDPOINTS[region_for_license_key(cfg.license_key)]


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
    # LICENSE_KEY (reference :326-332) — only its region prefix matters here
    license_key: str = ""
    # NR_INFRA_ENDPOINT / NR_LOGGING_ENDPOINT overrides (reference :427,502)
    infra_endpoint: str | None = None
    logging_endpoint: str | None = None
    # explicit ingest_url argument (reference _get_logging_endpoint :498)
    ingest_url: str | None = None
