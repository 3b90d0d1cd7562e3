"""Deterministic transcript derivation from the driver's ``events`` table.

The graded input is a transcript table ``(conv_id, turn_idx, role, text,
tool, ts)`` (BASELINE.json input_hint). The driver's correctness oracle
runs over the TPC-H-ish parquet tables only, so we synthesise transcripts
*deterministically in SQL* from ``events`` — the SAME SQL text runs in
Spark and in DuckDB (single source of truth; only the string-type token
differs per dialect), which makes every downstream operator oracle-able.

Archetype lines come verbatim from the reference's test corpus
(/root/reference/test/log_ingestion_test.py:145-181,261-265 and
test/events/*.json); see FIXTURES.md §3. Conversations are keyed on
``user_id``; ``user_id % 8`` picks the conversation template:

  0      lambda conv with .NET 4-part tab line        -> sink lambda
  1      lambda conv with a Task-timed-out line       -> sink lambda
  2      lambda conv with a runtime-kill (OOM) line   -> sink lambda
  3      lambda log-group but NO lambda message       -> sink other
         (prefix alone is insufficient, reference src/function.py:415-418)
  4,5    VPC flow-log conv                            -> sink vpc
  6      RDS enhanced-metrics conv                    -> sink other
  7      custom app conv                              -> sink other

Request-ids rotate every 5 turns within a conversation so the
forward-fill (reference :538-545) is non-trivial.

NR marker lines (turn_idx % 5 == 1 in lambda conversations) come in two
forms: user_id%8==0 conversations carry the DECODABLE blob literal
(``DECODABLE_NR_MARKER`` -> trace id ``trace-fixed-0001``); user_id%8==1
alternates decodable/undecodable every other marker so the decode ->
carry -> ''-clear transitions all occur on real rows; user_id%8==2 keeps
the undecodable short marker. The oracle SQL knows the literal's trace id
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Precomputed DECODABLE NR marker (datagen.nr_marker_with_trace output,
# frozen as a literal so the Spark and DuckDB derivations are byte-equal):
# base64(gzip(json)) carrying traceId at data.analytic_event_data[2][0][0]
# — the path the reference decodes (/root/reference/src/function.py:607-615).
# gzip.compress writes MTIME=0 (Python >= 3.11), so the blob is stable.
DECODABLE_NR_TRACE_ID = "trace-fixed-0001"
DECODABLE_NR_MARKER = (
    '[1, "NR_LAMBDA_MONITORING", "H4sIAIXFgWoC/6tWSkksSVSyUqhWSsxLzKksyUyOTy1L'
    'zSuJh4pH55Xm5OgoQMjo6GqlkqLE5FTPFKAUhKmbllmRmqJrYGBgqFQbGxtbWwsAWc+WV1QAAAA="]'
)

# {STR} -> STRING (Spark) | VARCHAR (DuckDB). Everything else is common SQL.
_DERIVE_TEMPLATE = """
WITH __base AS (
  SELECT
    'c' || CAST(user_id AS {STR}) AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
    user_id, ts
  FROM {EVENTS}
),
__shaped AS (
  SELECT
    conv_id, turn_idx, user_id, ts,
    CASE turn_idx % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                      WHEN 2 THEN 'tool' ELSE 'system' END AS role,
    CASE user_id % 8 WHEN 4 THEN 'vpc' WHEN 5 THEN 'vpc' WHEN 6 THEN 'rds'
                     WHEN 7 THEN 'custom' ELSE 'lambda' END AS tool,
    LPAD(CAST((user_id * 31 + CAST(FLOOR(turn_idx / 5.0) AS INT)) % 100000000 AS {STR}), 8, '0')
      || '-0000-4000-8000-' || LPAD(CAST(user_id % 1000000 AS {STR}), 12, '0') AS req_uuid
  FROM __base
)
SELECT conv_id, turn_idx, role,
  CASE
    WHEN tool = 'vpc' THEN '2 463657938898 eni-9f825df9 - - - - - - - 1548934870 1548934929 - NODATA'
    WHEN tool = 'rds' THEN '{{"engine":"POSTGRES","instanceID":"instance-' || CAST(user_id AS {STR}) || '"}}'
    WHEN tool = 'custom' THEN 'custom app line ' || CAST(turn_idx AS {STR})
    WHEN user_id % 8 = 3 THEN 'plain log line with no markers ' || CAST(turn_idx AS {STR})
    WHEN turn_idx % 5 = 0 THEN 'START RequestId: ' || req_uuid || ' Version: $LATEST'
    WHEN turn_idx % 5 = 1 AND user_id % 8 = 0 THEN '{NRD}'
    WHEN turn_idx % 5 = 1 AND user_id % 8 = 1 AND turn_idx % 10 = 1 THEN '{NRD}'
    WHEN turn_idx % 5 = 1 THEN '[1,"NR_LAMBDA_MONITORING","H4sIAImox"]'
    WHEN turn_idx % 5 = 2 AND user_id % 8 = 0 THEN 'info' || CHR(9) || '2024-01-01T00:00:00Z' || CHR(9) || 'MyLogger' || CHR(9) || '{{"actual":"payload"}}'
    WHEN turn_idx % 5 = 2 AND user_id % 8 = 1 THEN '2020-02-04T00:26:18.068Z ' || req_uuid || ' Task timed out after 3.00 seconds'
    WHEN turn_idx % 5 = 2 AND user_id % 8 = 2 THEN 'RequestId: ' || req_uuid || ' Error: Runtime exited with error: signal: killed' || CHR(10) || 'Runtime.ExitError'
    WHEN turn_idx % 5 = 3 THEN 'END RequestId: ' || req_uuid
    ELSE 'REPORT RequestId: ' || req_uuid || CHR(9) || 'Duration: 124.59 ms' || CHR(9) || 'Billed Duration: 125 ms'
  END AS text,
  tool, ts
FROM __shaped
"""

# Broadcast lookup table: the analog of the Lambda execution context +
# entry owner (/root/reference/src/function.py:231-236;
# /root/reference/test/aws_log_events.py:21). Keyed (conv_id, tool),
# exactly one row per key.
_CONV_META_TEMPLATE = """
SELECT conv_id, tool,
  '463657938898' AS owner,
  'fn-' || conv_id AS function_name,
  'arn:aws:lambda:us-east-1:463657938898:function:fn-' || conv_id AS invoked_function_arn,
  CASE tool WHEN 'lambda' THEN '/aws/lambda/fn-' || conv_id
            WHEN 'vpc' THEN '/aws/vpc/flow-logs'
            WHEN 'rds' THEN 'RDSOSMetrics'
            ELSE '/custom/app-' || conv_id END AS log_group_name,
  '2019/01/31/[$LATEST]' || LPAD(SUBSTRING(conv_id, 2), 32, '0') AS log_stream_name
FROM (SELECT DISTINCT conv_id, tool FROM ({TRANSCRIPTS}) __t) __k
"""

# Same tool -> log_group mapping as conv_meta, as a per-row column
# (classification input; reference reads log_entry["logGroup"] at :412).
LOG_GROUP_CASE = (
    "CASE tool WHEN 'lambda' THEN '/aws/lambda/fn-' || conv_id "
    "WHEN 'vpc' THEN '/aws/vpc/flow-logs' "
    "WHEN 'rds' THEN 'RDSOSMetrics' "
    "ELSE '/custom/app-' || conv_id END"
)


def derive_sql(dialect: str, events: str = "events") -> str:
    """Transcript derivation SQL for ``dialect`` in {'spark','duckdb'}."""
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return _DERIVE_TEMPLATE.format(STR=str_t, EVENTS=events, NRD=DECODABLE_NR_MARKER)


def conv_meta_sql(dialect: str, events: str = "events") -> str:
    """Lookup-table derivation SQL (same dialects)."""
    return _CONV_META_TEMPLATE.format(TRANSCRIPTS=derive_sql(dialect, events))


def transcripts_cte(dialect: str, events: str = "events") -> str:
    """The derivation as a parenthesised subquery for embedding in CTEs."""
    return "(" + derive_sql(dialect, events) + ")"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcript DataFrame from ``events.parquet`` in sf_dir."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(derive_sql("spark"))


def conv_meta_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the (conv_id, tool) broadcast lookup from the same events."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(conv_meta_sql("spark"))


def conv_meta_from_transcripts(transcripts: DataFrame) -> DataFrame:
    """The same lookup derived from a transcript DataFrame directly —
    for inputs that arrive as transcript files (plans/incremental.py)
    rather than via the events derivation. Deterministic per (conv_id,
    tool), so meta rows built batch-by-batch agree across batches."""
    transcripts.createOrReplaceTempView("__conv_meta_src")
    return transcripts.sparkSession.sql(
        _CONV_META_TEMPLATE.format(TRANSCRIPTS="SELECT * FROM __conv_meta_src")
    )
