"""Regex predicates & extractors as native Catalyst column expressions.

These are the Spark translations of the reference's five compiled patterns
(/root/reference/src/function.py:90-97,119-122). Python ``re.match``
anchors at position 0 while Spark ``rlike`` is an unanchored search, so
every *match*-semantics pattern is ``^``-anchored here; ``re.DOTALL``
becomes the inline ``(?s)`` flag. The unescaped ``.`` before ``\\d+Z`` in
the timeout pattern is kept bug-compatible (reference :93). All patterns
are simultaneously valid Java regex (Spark) and RE2 (DuckDB oracle).

Staying in native expressions keeps the whole parse stage inside
whole-stage codegen — no Python worker hop for the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# '.*"NR_LAMBDA_MONITORING' via re.match (/root/reference/src/function.py:90)
NR_MONITORING = r'^.*"NR_LAMBDA_MONITORING'
# 'REPORT RequestId:' via re.match (:91)
REPORT = r"^REPORT RequestId:"
# timeout pattern (:92-94); the `.` before \d+Z is the reference's own
# unescaped any-char — preserved.
TIMEOUT = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}.\d+Z\s[\d\w-]+"
    r"\sTask timed out after [\d.]+ seconds"
)
# runtime-kill pattern, re.DOTALL (:97)
RUNTIME_KILL = r"(?s)^RequestId:\s[-a-zA-Z0-9]{36}\s"
# unanchored uuid extractor, re.search semantics (:119-122)
REQUEST_ID = (
    r"RequestId:\s([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
    r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})"
)


def is_report(text: Column) -> Column:
    """REPORT_PATTERN.match (/root/reference/src/function.py:91,199).

    The pattern is a ^-anchored literal (no metachars, no MULTILINE), so
    ``startswith`` computes the identical boolean without the regex
    engine — a plain prefix memcmp in codegen (guide §1.2 "per-task
    work": the parse flags run once per row at 10^12 rows)."""
    return text.startswith("REPORT RequestId:")


def is_nr_marker(text: Column) -> Column:
    """LAMBDA_NR_MONITORING_PATTERN.match (:90,402,522).

    Guarded: the regex can only match when the literal marker substring
    is present, so a cheap ``contains`` (SIMD-friendly substring search)
    short-circuits the regex scan for the overwhelming non-marker
    majority. ``contains`` is implied by the pattern — identical result.
    """
    return text.contains('"NR_LAMBDA_MONITORING') & text.rlike(NR_MONITORING)


def is_timeout(text: Column) -> Column:
    """TIMEOUT_PATTERN.match (:92-94,403). Guarded by the pattern's own
    required literal (same result, regex runs only on candidates)."""
    return text.contains("Task timed out after ") & text.rlike(TIMEOUT)


def is_runtime_kill(text: Column) -> Column:
    """REQUEST_ID_PATTERN.match — DOTALL, anchored (:97,404). Guarded by
    the anchored literal prefix (implied by the pattern)."""
    return text.startswith("RequestId:") & text.rlike(RUNTIME_KILL)


def is_lambda_message(text: Column) -> Column:
    """``_is_lambda_message`` (:396-405): NR marker | timeout | runtime-kill.

    REPORT lines are deliberately NOT sufficient (reference docstring:
    "REPORT lines are not sufficient, just nice to have").
    """
    return is_nr_marker(text) | is_timeout(text) | is_runtime_kill(text)


def survives_lambda_filter(text: Column) -> Column:
    """``_filter_log_lines`` keep-predicate (:199): REPORT | lambda message."""
    return is_report(text) | is_lambda_message(text)


def extract_request_id(text: Column) -> Column:
    """LAMBDA_REQUEST_ID_REGEX.search (:119-122,539-541).

    ``regexp_extract`` is already search (unanchored); returns NULL when
    absent (reference: no match -> attribute not set) via nullif('').
    Guarded on the pattern's required literal: rows without
    'RequestId:' yield NULL through the when() exactly as the
    empty-extract -> nullif path did, without running the regex.
    """
    return F.when(
        text.contains("RequestId:"),
        F.nullif(F.regexp_extract(text, REQUEST_ID, 1), F.lit("")),
    )


def format_agent_logs(text: Column) -> Column:
    """``format_agent_logs`` (:180-189): if the message splits on TAB into
    exactly 4 parts, replace it with part 4; otherwise unchanged.

    Pure Catalyst — split/size/element_at stay in codegen. The -1 limit
    keeps trailing empty strings, matching Python ``str.split("\\t")``.
    """
    parts = F.split(text, r"\t", -1)
    return F.when(F.size(parts) == 4, F.element_at(parts, 4)).otherwise(text)
