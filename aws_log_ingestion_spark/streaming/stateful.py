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
