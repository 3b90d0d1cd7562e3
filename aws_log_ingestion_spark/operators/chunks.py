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
# hub-materialised MELT fills (melt.with_melt_fills) — when present and
# path == 'logging', _with_pos_and_state reuses them instead of paying a
# second trace-decode UDF pass + refill window
_FILLS = ["trace_id", "lambda_request_id"]


def _select_cols(df: DataFrame, path: str) -> list[str]:
    cols = [c for c in _REQUIRED + _META if c in df.columns]
    if "log_group" not in df.columns and "tool" in df.columns:
        cols.append("tool")  # with_log_group derives log_group from tool
    if path == "logging" and all(c in df.columns for c in _FILLS):
        cols += _FILLS
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"chunk stage missing columns: {missing}")
    return cols


def _group_stats_factory(path: str, cfg: PipelineConfig):
    """Build the per-group pandas function (driver-side closure; only the
    config scalars are captured, not DataFrames)."""
    max_size = cfg.max_payload_size
    lambda_prefix = cfg.lambda_prefix
    tags = dict(cfg.tags)

    def stats(pdf):
        import numpy as np
        import pandas as pd

        # Per-group pandas overhead is the replay's floor (~37k groups of
        # ~7 rows in the 5% bench sample): argsort on the numpy column +
        # scalar .iat lookups replace sort_values (whole-frame copy) and
        # iloc[0] (per-group Series materialization). turn_idx is unique
        # per conversation, so sort stability is irrelevant — identical
        # event order, identical bytes.
        tv = pdf["turn_idx"].to_numpy()
        order = np.argsort(tv)
        i0 = int(order[0])
        conv_id = pdf["conv_id"].iat[0]
        sink = pdf["sink"].iat[i0]

        def meta(name):
            return (pdf[name].iat[i0] if name in pdf.columns else "") or ""

        conv_ordinal = int("".join(ch for ch in conv_id if ch.isdigit()) or 0)

        ts_v = pdf["ts_millis"].to_numpy()[order]
        txt_v = pdf["text"].to_numpy()[order]
        events = [
            {
                "id": C.make_event_id(conv_ordinal, int(t)),
                "timestamp": int(ts),
                "message": m,
            }
            for t, ts, m in zip(tv[order], ts_v, txt_v)
        ]
        entry = C.build_entry(
            conv_id,
            meta("log_group"),
            meta("log_stream_name"),
            meta("owner"),
            events,
        )
        if path == "infra":
            context = {
                "function_name": meta("function_name"),
                "invoked_function_arn": meta("invoked_function_arn"),
                "log_group_name": meta("log_group"),
                "log_stream_name": meta("log_stream_name"),
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
    # Explicit conv_id repartition at the session's shuffle-partition
    # count: the replay shuffles FEW BYTES but burns heavy Python CPU
    # (json+gzip per conversation), exactly the shape AQE's byte-based
    # coalescing mis-sizes — measured here: the 5% replay collapsed to a
    # handful of post-shuffle partitions and ran 17 CPU-s in 4.5-6 s of
    # wall on 32 cores. A user-specified partition count is exempt from
    # AQE coalescing, and the grouped applyInPandas reuses the hash
    # clustering (no second exchange). Scale-adaptive: the count comes
    # from spark.sql.shuffle.partitions (sized per deployment), not a
    # constant (guide §2.5/§2.2).
    try:
        n_parts = int(slim.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = slim.sparkSession.sparkContext.defaultParallelism
    return slim.repartition(n_parts, "conv_id").groupBy("conv_id").applyInPandas(
        _group_stats_factory(path, cfg), CHUNK_STATS_SCHEMA
    )


def chunk_replay_independent(
    df: DataFrame, path: str, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Second, independently-plumbed gzip replay — exists to
    machine-verify ``chunk_replay``'s distributed plumbing inside the
    driver artifact (``q_chunk_gz_parity``).

    Everything Spark-side is deliberately different from
    ``chunk_replay``: conversations are assembled JVM-side with
    ``groupBy().agg(sort_array(collect_list(struct(...))))`` (hash
    aggregate + JVM lexicographic struct sort) instead of
    ``applyInPandas`` grouping + pandas ``sort_values``; the stats run
    through ``mapInPandas`` over pre-assembled rows instead of a grouped
    pandas call. A bug in either side's grouping, ordering, Arrow
    transfer, or timestamp handling shows up as a totals mismatch. Only
    the leaf recursion (functions/chunking.py) is shared — that leaf is
    pinned byte-for-byte against the reference's ``_generate_payloads``
    (src/function.py:309-323) in tests/test_chunks_vs_reference.py."""
    cfg = cfg or PipelineConfig()
    cols = [c for c in _REQUIRED + _META if c in df.columns]
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise ValueError(f"chunk_replay_independent missing columns: {missing}")
    slim = df.select(*cols).withColumn(
        "ts_millis", F.unix_millis(F.col("ts").cast("timestamp"))
    ).drop("ts")
    meta_cols = [c for c in slim.columns if c not in ("conv_id", "turn_idx", "ts_millis", "text")]
    # turn_idx is unique per conversation, so the lexicographic struct
    # sort IS the turn order; meta rides in the struct so the first
    # element's meta is exactly chunk_replay's sorted-first-row meta
    g = slim.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(F.struct("turn_idx", "ts_millis", "text", *meta_cols))
        ).alias("evs")
    )
    max_size = cfg.max_payload_size
    lambda_prefix = cfg.lambda_prefix
    tags = dict(cfg.tags)
    out_cols = [f.name for f in CHUNK_STATS_SCHEMA.fields]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for conv_id, evs in zip(pdf["conv_id"], pdf["evs"]):
                evs = list(evs)
                first = evs[0]
                conv_ordinal = int(
                    "".join(ch for ch in conv_id if ch.isdigit()) or 0
                )
                events = [
                    {
                        "id": C.make_event_id(conv_ordinal, int(e["turn_idx"])),
                        "timestamp": int(e["ts_millis"]),
                        "message": e["text"],
                    }
                    for e in evs
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
                        "invoked_function_arn": first.get(
                            "invoked_function_arn", ""
                        )
                        or "",
                        "log_group_name": first.get("log_group", "") or "",
                        "log_stream_name": first.get("log_stream_name", "")
                        or "",
                    }
                    obj = C.build_infra_data(context, entry)
                    split_fn = C.split_infra
                else:
                    obj = C.build_melt_payload(
                        entry, lambda_prefix=lambda_prefix, tags=tags
                    )
                    split_fn = C.split_logging
                s = C.chunk_stats(obj, split_fn, max_size)
                out.append(
                    {
                        "conv_id": conv_id,
                        "sink": first["sink"],
                        "path": path,
                        "n_events": len(events),
                        "n_chunks": s["n_chunks"],
                        "total_gz_bytes": s["total_gz_bytes"],
                        "max_chunk_bytes": s["max_chunk_bytes"],
                    }
                )
            yield pd.DataFrame(out, columns=out_cols)

    return g.mapInPandas(gen, CHUNK_STATS_SCHEMA)


FRONTIER_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("lo", LongType()),
        StructField("hi", LongType()),
    ]
)

INTERVAL_STATS_SCHEMA = StructType(
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


def _conv_ordinal(conv_id: str) -> int:
    return int("".join(ch for ch in conv_id if ch.isdigit()) or 0)


def _build_event(conv_id: str, turn_idx: int, ts_millis: int, text: str) -> dict:
    return {
        "id": C.make_event_id(_conv_ordinal(conv_id), int(turn_idx)),
        "timestamp": int(ts_millis),
        "message": text,
    }


def _envelope(first, path: str, cfg: PipelineConfig):
    """(payload-with-no-events, split_fn, message-builder context) for one
    conversation — shared by the cost/frontier pass and interval replay."""
    conv_id = first["conv_id"]
    entry = C.build_entry(
        conv_id,
        first.get("log_group", "") or "",
        first.get("log_stream_name", "") or "",
        first.get("owner", "") or "",
        [],
    )
    if path == "infra":
        context = {
            "function_name": first.get("function_name", "") or "",
            "invoked_function_arn": first.get("invoked_function_arn", "") or "",
            "log_group_name": first.get("log_group", "") or "",
            "log_stream_name": first.get("log_stream_name", "") or "",
        }
        return C.build_infra_data(context, entry), C.split_infra
    payload = C.build_melt_payload(entry, lambda_prefix=cfg.lambda_prefix, tags=dict(cfg.tags))
    return payload, C.split_logging


def _with_pos_and_state(
    df: DataFrame, path: str, cfg: PipelineConfig, with_pos: bool = True
) -> DataFrame:
    """Stage 0 (pure Catalyst): 0-based event position per conversation,
    epoch millis, and — for the logging path — the per-event carried
    trace id / request id (same window fills the MELT projection uses),
    so interval replay is STATELESS per event.

    ``with_pos=False`` (the aggregate-only count/census/raw-cost paths)
    skips BOTH conversation windows here — the row_number position and
    the envelope-meta pinning — so when the fills are already hub
    columns the whole staged frame is a narrow scan-side projection with
    no exchange and no sort (guide §2.4: remove shuffles outright; the
    per-conv aggregation that follows does its own map-side combine).
    Consumers of the no-pos shape must (a) order groups by ``turn_idx``
    instead of ``pos`` and (b) read conversation-level envelope values
    via ``min_by(col, turn_idx)`` — exactly the turn_idx-min row the
    pinned windows used, so results are identical even when meta varies
    mid-conversation."""
    from ..functions import patterns as P
    from ..functions.tracing import trace_id_raw
    from .classify import with_log_group

    if "log_group" not in df.columns:
        df = with_log_group(df, cfg)
    run = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    df = df.withColumn("ts_millis", F.unix_millis(F.col("ts").cast("timestamp")))
    if with_pos:
        df = df.withColumn(
            "pos",
            (F.row_number().over(W.partitionBy("conv_id").orderBy("turn_idx")) - 1).cast("long"),
        )
        # Pin envelope meta to the conversation's turn_idx-min row — the SAME
        # row the unsalted grouped replay reads (pdf.iloc[0] after sort). The
        # cost pass, the rid predicate and every interval's replay then agree
        # on one envelope even if meta varied mid-conversation, preserving the
        # salted==unsalted bit-exactness guarantee unconditionally.
        for m in _META:
            if m in df.columns:
                df = df.withColumn(m, F.first(F.col(m)).over(run))
    if path == "logging":
        if "trace_id" in df.columns and "lambda_request_id" in df.columns:
            # The hub already materialised the MELT fills (plans/job.py
            # prepare()): reuse them — no second trace-decode UDF pass,
            # no refill window. Same values by construction
            # (melt.with_melt_fills is the same window arithmetic).
            df = df.withColumn("trace_fill", F.col("trace_id")).withColumn(
                "rid_fill", F.col("lambda_request_id")
            )
        else:
            t = F.col("text")
            traw = trace_id_raw(t, P.is_nr_marker(t))
            rid = F.when(
                F.col("log_group").startswith(cfg.lambda_prefix),
                P.extract_request_id(t),
            )
            # both fills in one select -> one Window exec (melt.py note)
            df = df.select(
                "*",
                F.last(traw, ignorenulls=True).over(run).alias("__tr_last"),
                F.last(rid, ignorenulls=True).over(run).alias("rid_fill"),
            )
            df = df.withColumn(
                "trace_fill", F.nullif(F.col("__tr_last"), F.lit(""))
            ).drop("__tr_last")
    else:
        df = df.withColumn("trace_fill", F.lit(None).cast("string")).withColumn(
            "rid_fill", F.lit(None).cast("string")
        )
    return df


def _message_for(path: str, row) -> dict:
    if path == "infra":
        return _build_event(row.conv_id, row.turn_idx, row.ts_millis, row.text)
    return C.build_log_message(
        row.text,
        int(row.ts_millis),
        trace_id=row.trace_fill or None,
        lambda_request_id=row.rid_fill or None,
    )


def chunk_replay_salted(
    df: DataFrame,
    path: str,
    cfg: PipelineConfig | None = None,
    ratio: int = C.GZIP_MAX_RATIO,
) -> DataFrame:
    """Two-level EXACT chunk replay — the 100 TB hot-conversation path
    (SURVEY.md §4 item 1; replaces the one-group-per-conversation
    ``chunk_replay`` straggler on 10^7-turn conversations).

      1. per-event serialized byte costs (Arrow-batched, no grouping) —
         json escaping is per-character so interval raw sizes are exact
         prefix-sum arithmetic (functions/chunking.py:event_cost_*)
      2. per-conversation frontier walk over (pos, cost) ONLY (two int64
         columns — the hot conversation's text never ships to one task):
         intervals with raw >= cap*ratio are provably oversized
         (gz >= raw/1032) and split without gzipping
      3. frontier intervals replay independently in parallel
         (groupBy(conv_id, lo)), each bounded to cap*ratio raw bytes;
         per-conversation totals merge associatively.

    Bit-exact vs ``chunk_replay`` for any ``ratio`` that upper-bounds the
    data's true gzip ratio (1032 is the DEFLATE-theoretic bound, always
    safe); pinned by tests/test_chunks_vs_reference.py.
    """
    cfg = cfg or PipelineConfig()
    max_size = cfg.max_payload_size
    staged = _with_pos_and_state(df.select(*_select_cols(df, path)), path, cfg).drop("ts")

    # ---- stage 1: per-event cost + per-conv envelope length (Arrow batch)
    cost_cols = [
        "conv_id", "turn_idx", "ts_millis", "text", "trace_fill", "rid_fill",
        "log_group", "log_stream_name", "owner", "function_name",
        "invoked_function_arn",
    ]
    cost_cols = [c for c in cost_cols if c in staged.columns]

    def cost_gen(batches):
        import pandas as pd

        for pdf in batches:
            costs, empties = [], []
            env_cache: dict[str, int] = {}
            for row in pdf.itertuples(index=False):
                if path == "infra":
                    c = C.event_cost_infra(
                        _build_event(row.conv_id, row.turn_idx, row.ts_millis, row.text)
                    )
                else:
                    c = C.event_cost_logging(_message_for(path, row))
                costs.append(c)
                e = env_cache.get(row.conv_id)
                if e is None:
                    obj, _ = _envelope(row._asdict(), path, cfg)
                    e = env_cache[row.conv_id] = C.empty_payload_len(obj)
                empties.append(e)
            out = pd.DataFrame(
                {"conv_id": pdf["conv_id"], "cost": costs, "empty_len": empties}
            )
            out["pos"] = pdf["pos"].values
            yield out

    cost_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("cost", LongType()),
            StructField("empty_len", LongType()),
            StructField("pos", LongType()),
        ]
    )
    costs = staged.select(*cost_cols, "pos").mapInPandas(cost_gen, cost_schema)

    # ---- stage 2: frontier walk over (pos, cost) per conversation
    def frontier(pdf):
        import pandas as pd

        pdf = pdf.sort_values("pos")
        iv = C.frontier_intervals(
            pdf["cost"].tolist(), int(pdf["empty_len"].iloc[0]), max_size, ratio
        )
        return pd.DataFrame(
            [{"conv_id": pdf["conv_id"].iloc[0], "lo": lo, "hi": hi} for lo, hi in iv]
        )

    frontiers = costs.groupBy("conv_id").applyInPandas(frontier, FRONTIER_SCHEMA)

    # ---- stage 3: parallel exact replay of each frontier interval.
    # No broadcast hint: under the hybrid routing (the production wiring)
    # frontiers is tiny and AQE broadcasts it at runtime anyway; called
    # standalone on a full corpus it is >= 1 row per conversation and a
    # forced broadcast would OOM the driver — let AQE pick the strategy.
    joined = staged.join(
        frontiers,
        (staged["conv_id"] == frontiers["conv_id"])
        & (F.col("pos") >= F.col("lo"))
        & (F.col("pos") < F.col("hi")),
    ).drop(frontiers["conv_id"])

    def replay(pdf):
        import pandas as pd

        pdf = pdf.sort_values("pos")
        first = pdf.iloc[0]
        obj, split_fn = _envelope(first, path, cfg)
        msgs = [_message_for(path, row) for row in pdf.itertuples(index=False)]
        if path == "infra":
            import json

            entry = json.loads(obj["entry"])
            entry["logEvents"] = msgs
            obj = {"context": obj["context"], "entry": json.dumps(entry)}
        else:
            obj = [{"common": obj[0]["common"], "logs": msgs}]
        s = C.chunk_stats(obj, split_fn, max_size)
        return pd.DataFrame(
            [
                {
                    "conv_id": first["conv_id"],
                    "sink": first["sink"],
                    "path": path,
                    "n_events": len(msgs),
                    "n_chunks": s["n_chunks"],
                    "total_gz_bytes": s["total_gz_bytes"],
                    "max_chunk_bytes": s["max_chunk_bytes"],
                }
            ]
        )

    per_interval = joined.groupBy("conv_id", "lo").applyInPandas(
        replay, INTERVAL_STATS_SCHEMA
    )
    return per_interval.groupBy("conv_id", "sink", "path").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("total_gz_bytes").alias("total_gz_bytes"),
        F.max("max_chunk_bytes").alias("max_chunk_bytes"),
    ).select(*[f.name for f in CHUNK_STATS_SCHEMA.fields])


def chunk_replay_hybrid(
    df: DataFrame,
    path: str,
    cfg: PipelineConfig | None = None,
    hot_threshold: int = 100_000,
    ratio: int = C.GZIP_MAX_RATIO,
) -> DataFrame:
    """Production chunk stage: size-routed replay.

    One cheap count aggregate finds conversations above ``hot_threshold``
    events; those go through the two-level ``chunk_replay_salted`` (no
    single-task straggler), everything else through the plain grouped
    replay (lower constant cost — the salted path's extra cost/frontier
    passes aren't worth it for small groups; see BENCH/skew.md). Both
    paths are exact, so the routing threshold is purely a performance
    knob. The hot set is broadcast (it is tiny by construction — at most
    total_rows / hot_threshold conversations).
    """
    cfg = cfg or PipelineConfig()
    hot = (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_threshold)
        .select("conv_id")
    )
    cold_stats = chunk_replay(df.join(F.broadcast(hot), "conv_id", "left_anti"), path, cfg)
    hot_stats = chunk_replay_salted(
        df.join(F.broadcast(hot), "conv_id", "left_semi"), path, cfg, ratio=ratio
    )
    return cold_stats.unionByName(hot_stats)


FAST_STATS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("sink", StringType()),
        StructField("path", StringType()),
        StructField("n_events", LongType()),
        StructField("n_chunks", LongType()),
        StructField("raw_bytes", LongType()),
    ]
)


def _mcol(df: DataFrame, name: str):
    """Meta column or '' when absent — mirrors ``first.get(name, '') or ''``
    in the grouped replay."""
    return F.col(name) if name in df.columns else F.lit("")


def _staged_with_costs(
    df: DataFrame, path: str, cfg: PipelineConfig, with_pos: bool = True
):
    """Stage 0/1 of the arithmetic chunk paths: carried fills (+ pos and
    pinned meta when ``with_pos``, see ``_with_pos_and_state``), then the
    EXACT per-event JSON byte cost and per-conversation empty-envelope
    length as pure Catalyst columns (functions/jsoncost.py) — no Python
    anywhere."""
    from ..functions import jsoncost as jc

    staged = _with_pos_and_state(
        df.select(*_select_cols(df, path)), path, cfg, with_pos=with_pos
    ).drop("ts")
    if path == "infra":
        cost = jc.event_cost_infra_expr(
            F.col("text"), F.col("turn_idx"), F.col("ts_millis")
        )
    else:
        cost = jc.event_cost_logging_expr(
            F.col("text"), F.col("ts_millis"), F.col("trace_fill"), F.col("rid_fill")
        )
    staged = staged.withColumn("__cost", cost)
    if with_pos:
        # the interval-replay paths read __empty per row; the aggregate
        # paths (with_pos=False) compute it once per conversation in
        # _per_conv_raw instead — the envelope fields are conversation-
        # constant, so evaluating their escape-count scans on every turn
        # was pure repetition (measured in OPTIMIZATION_r07.md)
        staged = staged.withColumn("__empty", _empty_expr(staged, path, cfg))
    return staged


def _empty_expr(df: DataFrame, path: str, cfg: PipelineConfig):
    """EXACT empty-envelope byte length from the frame's meta columns
    (functions/jsoncost.py; absent meta = '' exactly like the grouped
    replay's ``first.get(name, '') or ''``)."""
    from ..functions import jsoncost as jc

    if path == "infra":
        return jc.empty_len_infra_expr(
            F.col("conv_id"),
            _mcol(df, "log_group"),
            _mcol(df, "log_stream_name"),
            _mcol(df, "owner"),
            _mcol(df, "function_name"),
            _mcol(df, "invoked_function_arn"),
        )
    return jc.empty_len_logging_expr(
        cfg, _mcol(df, "log_group"), _mcol(df, "log_stream_name")
    )


def _per_conv_raw(staged: DataFrame, path: str, cfg: PipelineConfig) -> DataFrame:
    """Per-conversation raw totals over a ``_staged_with_costs`` frame —
    map-side-combining aggregation, no window and NO SORT: costs are
    order-independent sums, and the conversation-level envelope values
    (sink + the meta fields the empty-envelope length needs) come from
    the turn_idx-min row — exactly the row the old pinned-window
    ``first()`` read, so results are identical even when meta varies
    mid-conversation.

    Two deliberate shapes here:
    * The core aggregation buffers are ALL-LONG: a string-valued
      min_by/first is not a mutable aggregation-buffer type, which
      silently demotes the whole aggregate to SortAggregate —
      re-introducing a full sort of the fact rows, the exact thing this
      path removes (observed in the r7 plan diff). Strings (sink, meta)
      travel as grouping KEYS of a second, keys-only aggregate (keys may
      be strings; only buffer values are restricted) joined back on the
      turn_idx-min row — exactly one match per conversation.
    * ``__empty`` is computed AFTER that join, once per conversation:
      its escape-count scans run over rows = conversations instead of
      rows = turns (the envelope fields are conversation-level)."""
    core = (
        staged.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__cost").alias("__cost_sum"),
            F.min("turn_idx").alias("__min_t"),
        )
    )
    meta_keys = [m for m in _META if m in staged.columns]
    firsts = staged.groupBy("conv_id", "sink", *meta_keys).agg(
        F.min("turn_idx").alias("__t")
    )
    # explicit aliases: core and firsts share lineage (both aggregate the
    # same staged frame), so bare df["col"] references in the self-join
    # condition are ambiguous
    c, f = core.alias("__pcr_c"), firsts.alias("__pcr_f")
    j = c.join(
        f,
        (F.col("__pcr_c.conv_id") == F.col("__pcr_f.conv_id"))
        & (F.col("__pcr_f.__t") == F.col("__pcr_c.__min_t")),
    ).select(
        "__pcr_c.conv_id",
        "__pcr_c.n_events",
        "__pcr_c.__cost_sum",
        "__pcr_f.sink",
        *[f"__pcr_f.{m}" for m in meta_keys],
    )
    j = j.withColumn("__empty", _empty_expr(j, path, cfg)).withColumn(
        "raw_bytes",
        F.col("__empty") + F.col("__cost_sum") + F.lit(2) * (F.col("n_events") - 1),
    )
    return j.drop(*meta_keys)


def chunk_raw_costs(df: DataFrame, path: str, cfg: PipelineConfig | None = None) -> DataFrame:
    """Per-conversation EXACT raw payload size — zero Python, one shuffle.

    ``raw_bytes`` is the byte length of ``json.dumps`` of the
    conversation's full payload (reference ``_send_log_entry`` payload
    construction, /root/reference/src/function.py:223-283): envelope +
    sum of per-event costs + 2 bytes per separator. ``fits_single`` is 1
    when the payload PROVABLY gzips under the cap (gz_len_upper_bound),
    i.e. the reference recursion emits exactly one chunk. Fully
    SQL-expressible, hence exactly oracle-able — this is the arithmetic
    backbone the fast count path and capacity planning share.
    """
    cfg = cfg or PipelineConfig()
    staged = _staged_with_costs(df, path, cfg, with_pos=False)
    from ..functions import jsoncost as jc

    per_conv = _per_conv_raw(staged, path, cfg)
    return per_conv.select(
        "conv_id",
        "sink",
        F.lit(path).alias("path"),
        "n_events",
        "raw_bytes",
        jc.gz_upper_fits_expr(F.col("raw_bytes"), cfg.max_payload_size)
        .cast("int")
        .alias("fits_single"),
    )


def chunk_census(
    df: DataFrame,
    path: str,
    cfg: PipelineConfig | None = None,
    caps: list[tuple[str, int]] | None = None,
    ratio: int = C.GZIP_MAX_RATIO,
) -> DataFrame:
    """Per-sink PROOF census of the chunk recursion at one or more caps —
    the exactly-oracle-able face of the gzip chunk stage (VERDICT r4 #3).

    For each (cap, sink) bucket, classifies every conversation's
    top-level payload by pure raw-byte arithmetic (zero gzip, zero
    Python):

    - ``n_single_proved``: gz_len_upper_bound(raw) < cap — the reference
      recursion (/root/reference/src/function.py:309-323) PROVABLY emits
      exactly one chunk, so these contribute exactly ``n_single_proved``
      chunks (``n_chunks_proved``).
    - ``n_split_proved``: raw >= cap*ratio — gz >= raw/1032 >= cap, the
      recursion provably splits (>= 2 chunks).
    - ``n_ambiguous``: the band between the proofs, where the true count
      genuinely requires compressing bytes (chunk_replay's job — the
      rows-only gz-totals query).

    At the production 1 MB cap every synthetic conversation is proved
    single, so n_chunks_proved == n_convs — the real n_chunks total,
    SQL-oracle-able end to end; at a forced-split cap (2000 B) the same
    arithmetic honestly reports everything ambiguous. One shuffle
    (conv_id agg); each extra cap is a re-aggregation of the tiny
    per-conversation frame, not a rescan.
    """
    cfg = cfg or PipelineConfig()
    caps = caps or [("default", cfg.max_payload_size)]
    from ..functions import jsoncost as jc

    staged = _staged_with_costs(df, path, cfg, with_pos=False)
    per_conv = _per_conv_raw(staged, path, cfg)
    legs = []
    for cap_name, cap in caps:
        fits = jc.gz_upper_fits_expr(F.col("raw_bytes"), cap).cast("long")
        split = (F.col("raw_bytes") >= F.lit(cap * ratio)).cast("long")
        legs.append(
            per_conv.groupBy("sink")
            .agg(
                F.count(F.lit(1)).alias("n_convs"),
                F.sum("n_events").alias("n_events"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum(fits).alias("n_single_proved"),
                F.sum(split).alias("n_split_proved"),
            )
            .select(
                F.lit(cap_name).alias("cap"),
                "sink",
                F.lit(path).alias("path"),
                "n_convs",
                "n_events",
                "raw_bytes",
                "n_single_proved",
                "n_split_proved",
                (
                    F.col("n_convs") - F.col("n_single_proved") - F.col("n_split_proved")
                ).alias("n_ambiguous"),
                F.col("n_single_proved").alias("n_chunks_proved"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "cap", "sink", "path", "n_convs", "n_events", "raw_bytes",
        "n_single_proved", "n_split_proved", "n_ambiguous", "n_chunks_proved",
    )


def chunk_counts_fast(
    df: DataFrame,
    path: str,
    cfg: PipelineConfig | None = None,
    ratio: int = C.GZIP_MAX_RATIO,
) -> DataFrame:
    """EXACT per-conversation chunk counts with gzip only where provably
    necessary — the production chunk stage (SURVEY.md §2 row 16 at scale).

    Pure-Catalyst cost pre-pass -> per-conversation raw totals; every
    conversation whose payload provably fits one chunk
    (``gz_len_upper_bound(raw) < cap`` — the overwhelming majority at the
    1 MB cap) is answered with ZERO Python and ZERO gzip. Only oversized
    conversations route through an Arrow-grouped ``count_chunks_fast``
    walk that gzips nothing but the ambiguous band of the halving tree.
    n_chunks is bit-identical to ``chunk_replay`` (pinned by
    tests/test_chunks_vs_reference.py); the byte stat here is
    ``raw_bytes`` (uncompressed ship volume) — exact gz byte totals
    remain ``chunk_replay``'s job since they require compressing every
    chunk by definition.
    """
    cfg = cfg or PipelineConfig()
    max_size = cfg.max_payload_size
    from ..functions import jsoncost as jc

    staged = _staged_with_costs(df, path, cfg, with_pos=False)
    per_conv = _per_conv_raw(staged, path, cfg)
    fits = jc.gz_upper_fits_expr(F.col("raw_bytes"), max_size)
    singles = per_conv.filter(fits).select(
        "conv_id",
        "sink",
        F.lit(path).alias("path"),
        "n_events",
        F.lit(1).cast("long").alias("n_chunks"),
        "raw_bytes",
    )
    big_ids = per_conv.filter(~fits).select("conv_id")
    # big_ids is tiny by construction (conversations > ~1 MB serialized);
    # AQE broadcasts it at runtime — no hard hint for the same reason as
    # the salted replay's frontier join.
    big = staged.join(big_ids, "conv_id", "left_semi")

    def walk(pdf):
        import gzip
        import json

        import pandas as pd

        # turn order, not pos: the no-window staged frame (with_pos=False)
        # carries no pos column; turn_idx gives the identical ordering and
        # iloc[0] is then exactly the turn_idx-min row the pinned-window
        # shape read its envelope meta / __empty from
        pdf = pdf.sort_values("turn_idx").reset_index(drop=True)
        first = pdf.iloc[0]
        costs = [int(c) for c in pdf["__cost"]]

        # Pre-serialize each event's message JSON ONCE (VERDICT r3 #6):
        # ambiguous-band probes then assemble the payload text by string
        # joins instead of re-dumping the node's whole sub-payload per
        # probe — the per-probe cost drops from O(sub-payload json.dumps)
        # to O(sub-payload strlen), removing the O(n log n) re-serialize
        # over a hot conversation's full text. Bit-exact because
        # json.dumps joins list elements with ', ' and dict construction
        # order is stable; for infra the events live inside the
        # JSON-escaped entry STRING, so each message is escaped once up
        # front (escaping is per-character: escape(a+b) == escape(a) +
        # escape(b), and the ', ' joiner escapes to itself).
        msg_strs = [
            json.dumps(_message_for(path, row)) for row in pdf.itertuples(index=False)
        ]
        obj0, _split = _envelope(first, path, cfg)
        # empty-envelope length from the REAL no-events payload — the
        # ground truth the jsoncost Catalyst expr mirrors (pinned in
        # tests/test_jsoncost.py); the staged frame no longer carries a
        # per-row __empty column (computed per conversation instead)
        empty = C.empty_payload_len(obj0)
        if path == "infra":
            entry0 = json.loads(obj0["entry"])
            entry0["logEvents"] = []
            tmpl = json.dumps(
                {"context": obj0["context"], "entry": json.dumps(entry0)}
            )
            marker = '\\"logEvents\\": []'
            parts = [json.dumps(m)[1:-1] for m in msg_strs]
        else:
            tmpl = json.dumps([{"common": obj0[0]["common"], "logs": []}])
            marker = '"logs": []'
            parts = msg_strs

        if tmpl.count(marker) == 1:
            pre, post = tmpl.split(marker)
            head, tail = marker[:-1], marker[-1]  # '..."...": [' and ']'

            def gz_len(lo: int, hi: int) -> int:
                s = pre + head + ", ".join(parts[lo:hi]) + tail + post
                return len(gzip.compress(s.encode()))

        else:
            # envelope metadata happens to contain the marker text
            # (pathological): fall back to the per-probe re-dump — slower
            # but identical bytes
            def gz_len(lo: int, hi: int) -> int:
                sub = pdf.iloc[lo:hi]
                msgs = [_message_for(path, row) for row in sub.itertuples(index=False)]
                obj, _ = _envelope(first, path, cfg)
                if path == "infra":
                    entry = json.loads(obj["entry"])
                    entry["logEvents"] = msgs
                    obj = {"context": obj["context"], "entry": json.dumps(entry)}
                else:
                    obj = [{"common": obj[0]["common"], "logs": msgs}]
                return len(gzip.compress(json.dumps(obj).encode()))

        n_chunks, raw_total = C.count_chunks_fast(costs, empty, max_size, gz_len, ratio)
        return pd.DataFrame(
            [
                {
                    "conv_id": first["conv_id"],
                    "sink": first["sink"],
                    "path": path,
                    "n_events": len(costs),
                    "n_chunks": n_chunks,
                    "raw_bytes": raw_total,
                }
            ]
        )

    # same AQE-mis-sizing guard as chunk_replay: the ambiguous-band walk
    # is Python-CPU-heavy per conversation, so pin its parallelism to the
    # session's shuffle-partition count rather than its (tiny) byte size
    try:
        n_parts = int(big.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = big.sparkSession.sparkContext.defaultParallelism
    big_stats = big.repartition(n_parts, "conv_id").groupBy("conv_id").applyInPandas(
        walk, FAST_STATS_SCHEMA
    )
    return singles.unionByName(big_stats)


def chunk_totals_fast(stats: DataFrame) -> DataFrame:
    """Per-sink rollup of the fast count stage (the graded aggregate)."""
    return stats.groupBy("sink", "path").agg(
        F.count_distinct("conv_id").alias("n_convs"),
        F.sum("n_events").alias("n_events"),
        F.sum("n_chunks").alias("n_chunks"),
        F.sum("raw_bytes").alias("raw_bytes"),
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
