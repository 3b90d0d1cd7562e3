"""Retry/backoff budget arithmetic — config-level parity.

The reference derives a 13 s session budget from its retry schedule
(/root/reference/src/function.py:209-220, pinned by
test/log_ingestion_test.py:475-495). The Spark engine has no HTTP
session, but the same arithmetic bounds a sink-commit SLA: task attempt
timeout x retry schedule + processing reserve. Kept as a pure function
so the parity test can pin it against the reference.
"""

from __future__ import annotations

# reference constants (/root/reference/src/function.py:68-84)
MAX_RETRIES = 3
INITIAL_BACKOFF = 1
BACKOFF_MULTIPLIER = 2
INDIVIDUAL_REQUEST_TIMEOUT = 3
SESSION_MAX_PROCESSING_TIME = 1


def session_timeout_seconds(
    max_retries: int = MAX_RETRIES,
    initial_backoff: float = INITIAL_BACKOFF,
    backoff_multiplier: float = BACKOFF_MULTIPLIER,
    request_timeout: float = INDIVIDUAL_REQUEST_TIMEOUT,
    processing_reserve: float = SESSION_MAX_PROCESSING_TIME,
) -> float:
    """First attempt + (backoff_i + attempt) per retry + reserve."""
    total = request_timeout
    backoff = initial_backoff
    for _ in range(max_retries - 1):
        total += backoff + request_timeout
        backoff *= backoff_multiplier
    return total + processing_reserve
