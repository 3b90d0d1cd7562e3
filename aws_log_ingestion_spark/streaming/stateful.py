"""Cross-batch stateful forward-fill — applyInPandasWithState.

The reference never carries state across invocations (each Lambda call is
closed over one log entry), so the batch pipeline doesn't need this. It
exists for the streaming deployment where ONE conversation can span
micro-batches: the request-id carry (reference semantics
/root/reference/src/function.py:538-545) must survive the batch boundary.
State per conv_id = (last_request_id, last_turn_idx); each micro-batch's
rows are filled in turn order starting from the stored carry.

Within a micro-batch, rows for a key arrive possibly unsorted — they are
sorted by turn_idx inside the state function. Rows older than the stored
last_turn_idx are late data; the reference has no late policy (SURVEY.md
§2 streaming notes), so they are filled with the current carry and do not
rewind state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("lambda_request_id", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_request_id", StringType()),
        StructField("last_turn_idx", LongType()),
    ]
)


def _fill_func(key, pdfs, state):
    import re

    import pandas as pd

    rid_re = re.compile(
        r"RequestId:\s([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})"
    )
    carry, last_turn = state.get if state.exists else (None, -1)

    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        fills = []
        for text, turn in zip(pdf["text"], pdf["turn_idx"]):
            m = rid_re.search(text or "")
            if m and turn > last_turn:
                carry = m.group(1)
            if turn > last_turn:
                last_turn = int(turn)
            fills.append(carry)
        yield pd.DataFrame(
            {
                "conv_id": key[0],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "lambda_request_id": fills,
            }
        )

    state.update((carry, int(last_turn)))


def stateful_request_fill(stream_df: DataFrame) -> DataFrame:
    """turns stream (conv_id, turn_idx, text, ...) -> filled stream.

    Append mode, no timeout: conversation state lives for the stream's
    lifetime (bounded key space; a production deployment sets a TTL via
    GroupStateTimeout once conversations are known-closed).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream_df.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fill_func,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Combined MELT carry: trace id + request id across micro-batches.
# Batch semantics live in operators/melt.py (window forward-fill); this is
# the streaming equivalent for when ONE conversation spans micro-batches.

MELT_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("trace_id", StringType()),
        StructField("lambda_request_id", StringType()),
    ]
)

MELT_STATE_SCHEMA = StructType(
    [
        StructField("last_trace_raw", StringType()),
        StructField("last_request_id", StringType()),
        StructField("last_turn_idx", LongType()),
    ]
)


def _melt_fill_factory(passthrough: tuple[str, ...] = ()):
    """Build the per-conversation carry function for (trace raw, request
    id) in turn order, emitting ``passthrough`` input columns unchanged
    alongside the fills.

    Trace semantics mirror the batch MELT fill (operators/melt.py:62-70,
    reference /root/reference/src/function.py:519-532): every NR-marker
    line RESETS the carry to its decode result — '' on a failed decode —
    and the emitted ``trace_id`` is NULL while the carry is ''/unset.
    Request ids carry independently (reference :538-545). Late rows
    (turn_idx <= stored last_turn_idx) are emitted with the current carry
    and do not rewind state, matching ``_fill_func``'s policy.
    """

    def func(key, pdfs, state):
        import re

        import pandas as pd

        from ..functions.tracing import decode_trace_id_str

        # LAMBDA_NR_MONITORING_PATTERN.match (reference src/function.py:90):
        # re.match semantics — anchored at 0, `.` does not cross newlines.
        nr_re = re.compile(r'.*"NR_LAMBDA_MONITORING')
        rid_re = re.compile(
            r"RequestId:\s([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
            r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})"
        )
        trace_raw, rid_carry, last_turn = (
            state.get if state.exists else (None, None, -1)
        )

        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx")
            trace_fills, rid_fills = [], []
            for text, turn in zip(pdf["text"], pdf["turn_idx"]):
                text = text or ""
                fresh = turn > last_turn
                if fresh and nr_re.match(text):
                    trace_raw = decode_trace_id_str(text)  # '' clears the carry
                m = rid_re.search(text)
                if fresh and m:
                    rid_carry = m.group(1)
                if fresh:
                    last_turn = int(turn)
                trace_fills.append(trace_raw if trace_raw else None)
                rid_fills.append(rid_carry)
            out = {
                "conv_id": key[0],
                "turn_idx": pdf["turn_idx"].astype("int32"),
            }
            for c in passthrough:
                out[c] = pdf[c]
            out["trace_id"] = trace_fills
            out["lambda_request_id"] = rid_fills
            yield pd.DataFrame(out)

        state.update((trace_raw, rid_carry, int(last_turn)))

    return func


_melt_fill_func = _melt_fill_factory()


def stateful_melt_fill(stream_df: DataFrame) -> DataFrame:
    """Streaming MELT id-carry: (conv_id, turn_idx, text) stream -> rows
    with ``trace_id`` and ``lambda_request_id`` filled with cross-batch
    state, so a conversation whose NR marker lands in one micro-batch and
    whose later turns land in the next still gets the reference's
    forward-fill semantics."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream_df.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _melt_fill_func,
            MELT_OUTPUT_SCHEMA,
            MELT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stateful_melt_fill_full(stream_df: DataFrame) -> DataFrame:
    """``stateful_melt_fill`` with the full transcript row passed through
    (role, text, tool, ts) — the streaming analog of
    ``melt.with_melt_fills``: downstream ``melt_project`` then runs as a
    pure per-batch projection, so the composed streaming job matches the
    batch job per turn even when one conversation spans micro-batches
    (pinned by tests/test_stateful_streaming.py stream-vs-batch parity).

    NOTE the request-id extract here is NOT yet gated on the lambda
    log-group prefix (the state function sees only text); the caller
    masks ``lambda_request_id`` on non-lambda log groups — log_group is
    conversation-constant, so the post-hoc mask is exactly the batch
    gate (see stream_job.melt_stream_fills)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    passthrough = ("role", "text", "tool", "ts")
    fields = [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
    ]
    in_schema = {f.name: f.dataType for f in stream_df.schema.fields}
    fields += [StructField(c, in_schema[c]) for c in passthrough]
    fields += [
        StructField("trace_id", StringType()),
        StructField("lambda_request_id", StringType()),
    ]
    return (
        stream_df.select("conv_id", "turn_idx", *passthrough)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _melt_fill_factory(passthrough),
            StructType(fields),
            MELT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
