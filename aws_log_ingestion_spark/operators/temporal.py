"""Point-in-time (as-of) join: enrich fact rows with the most recent
state row at-or-before each fact's timestamp, per key.

The reference Lambda never joins in time (one invocation = one
envelope), but a transcript analytics layer constantly needs "what was
the conversation's last marker/config/agent-state when this turn
happened" — the classic as-of join that Spark's DataFrame API lacks as
a primitive.

Spark-first decomposition: NOT a range join (which explodes to
fact x state pairs before picking the max), but a union + conditional
forward-fill window —

    union(facts tagged 1, states tagged 0)
      -> window last(value, ignorenulls) over
         (partition by key order by ts, tag  rows unbounded preceding..current)
      -> filter back to fact rows

One shuffle on the key (the same conv_id partitioning every other stage
of this pipeline uses), linear in |facts| + |states|, no pair blowup, no
UDFs, whole-stage codegen throughout.  At equal timestamps the state row
sorts BEFORE the fact row (tag 0 < 1), so "at-or-before" includes ties —
matching DuckDB's `ASOF JOIN ... ON f.ts >= s.ts` semantics exactly.

The driver oracle uses DuckDB's NATIVE ASOF JOIN — a completely
different algorithm (per-probe binary search) arriving at the same
semantics, so a driver hash match verifies the window decomposition's
SEMANTICS, not mere determinism.

At 100 TB: facts and states shuffle once on the same key as the rest of
the job (re-usable partitioning); a hot conversation concentrates its
rows on one task but the window is a single linear pass, and states are
typically a tiny fraction of facts, so the union adds negligible skew
beyond what the fact table already has.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    facts: DataFrame,
    states: DataFrame,
    key: str = "conv_id",
    ts: str = "ts_ms",
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every fact row gains ``value_cols`` from the
    latest state row with ``state.ts <= fact.ts`` for the same ``key``
    (NULLs before the first state).

    ``states`` must be unique per (key, ts) — pre-aggregate if not
    (duplicate state timestamps would make "the" latest state ambiguous
    in ANY engine).  ``value_cols`` must not collide with fact columns.
    """
    if not value_cols:
        return facts
    clash = set(value_cols) & set(facts.columns)
    if clash:
        raise ValueError(f"value_cols collide with fact columns: {sorted(clash)}")
    f = facts.withColumn("_is_fact", F.lit(1))
    s = states.select(key, ts, *value_cols).withColumn("_is_fact", F.lit(0))
    # allowMissingColumns: fact-only columns become NULL on state rows and
    # value_cols become NULL on fact rows — exactly the fill targets.
    u = f.unionByName(s, allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_fact").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Fill ONE struct per state row, not each value column independently:
    # if a state row legitimately carries NULL in one value column, that
    # row must still win for ALL columns (every value from the single
    # latest state row — true as-of semantics, and what DuckDB's native
    # ASOF JOIN oracle does). Per-column last(ignorenulls) would instead
    # backfill the NULL column from an OLDER state row (ADVICE r3). The
    # struct is non-null on every state row, so one fill carries the
    # whole row; fact rows contribute NULL structs and never interfere.
    state_struct = F.when(
        F.col("_is_fact") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    filled_struct = F.last(state_struct, ignorenulls=True).over(w)
    out_cols = [F.col(c) for c in facts.columns] + [
        filled_struct[c].alias(c) for c in value_cols
    ]
    return u.select(*out_cols, "_is_fact").filter(F.col("_is_fact") == 1).drop(
        "_is_fact"
    )
