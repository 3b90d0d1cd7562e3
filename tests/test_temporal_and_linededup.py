"""Semantic tests for the as-of join decomposition and corpus-level
line dedup — hand-computable inputs pinning tie, before-first, and
ordering edges, plus plan-shape assertions for the scale contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators.dedup import line_dedup
from aws_log_ingestion_spark.operators.temporal import asof_join


def _facts(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, 5),
            ("c1", 1, 10),   # tie with a state at ts=10 -> state wins (>=)
            ("c1", 2, 15),
            ("c1", 3, 25),
            ("c2", 0, 4),    # conversation with no state before it
        ],
        "conv_id string, turn_idx int, ts_ms long",
    )


def _states(spark):
    return spark.createDataFrame(
        [("c1", 10, "a"), ("c1", 20, "b"), ("c2", 5, "z")],
        "conv_id string, ts_ms long, state string",
    )


def test_asof_join_semantics(spark):
    out = asof_join(
        _facts(spark), _states(spark), key="conv_id", ts="ts_ms",
        value_cols=("state",),
    )
    got = {(r.conv_id, r.turn_idx): r.state for r in out.collect()}
    assert got == {
        ("c1", 0): None,   # before first state
        ("c1", 1): "a",    # equal timestamps -> at-or-before includes
        ("c1", 2): "a",
        ("c1", 3): "b",
        ("c2", 0): None,   # state exists but only after the fact
    }
    assert out.count() == 5  # left semantics: every fact survives


def test_asof_join_null_state_column_comes_from_latest_row(spark):
    """All value columns must come from the SINGLE latest state row, even
    when that row carries a legitimate NULL in one of them — per-column
    independent fills would backfill the NULL from an older state row
    (ADVICE r3; fixed via the one-struct fill)."""
    states = spark.createDataFrame(
        [("c1", 10, "a", "x"), ("c1", 20, None, "y")],
        "conv_id string, ts_ms long, s1 string, s2 string",
    )
    out = asof_join(
        _facts(spark), states, key="conv_id", ts="ts_ms",
        value_cols=("s1", "s2"),
    )
    got = {(r.conv_id, r.turn_idx): (r.s1, r.s2) for r in out.collect()}
    # fact at ts=25: latest state is (20, NULL, 'y') -> s1 must be NULL,
    # NOT 'a' carried from the older ts=10 row
    assert got[("c1", 3)] == (None, "y")
    assert got[("c1", 2)] == ("a", "x")
    assert got[("c1", 1)] == ("a", "x")
    assert got[("c1", 0)] == (None, None)


def test_asof_join_rejects_column_clash(spark):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            _facts(spark), _states(spark).withColumnRenamed("state", "turn_idx"),
            value_cols=("turn_idx",),
        )


def _plan_of(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_join_single_exchange(spark):
    """The decomposition must cost ONE conv_id shuffle (the fill window)
    — no range-join pair explosion, no cartesian.  The union's two
    branches may each show the exchange header, but there is no second
    shuffle stage."""
    import re

    out = asof_join(_facts(spark), _states(spark), value_cols=("state",))
    plan = _plan_of(out)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges <= 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_first_occurrence_wins(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha\nshared line\nbeta"),
            (2, "shared line\ngamma"),
            (3, "delta\nshared line"),
        ],
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].text_dedup == "alpha\nshared line\nbeta"
    assert got[2].text_dedup == "gamma"
    assert got[3].text_dedup == "delta"
    assert (got[1].n_lines, got[1].n_kept) == (3, 3)
    assert (got[2].n_lines, got[2].n_kept) == (2, 1)
    assert (got[3].n_lines, got[3].n_kept) == (2, 1)


def test_line_dedup_within_doc_and_whitespace(spark):
    docs = _docs(
        spark,
        [
            # duplicate WITHIN one doc; blank lines always survive;
            # trailing-space variants normalize to the same key but the
            # kept line keeps its original bytes
            (1, "x\n\nx\nx \ny"),
            (2, "only gone"),
            (3, "only gone"),
        ],
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].text_dedup == "x\n\ny"
    assert (got[1].n_lines, got[1].n_kept) == (5, 3)
    assert got[2].text_dedup == "only gone"
    # doc 3 fully deduplicated -> still present, empty
    assert (got[3].n_kept, got[3].text_dedup) == (0, "")
    assert got[3].n_lines == 1


def test_line_dedup_corpus_invariants(spark):
    """On the real sf0.001 corpus (8-words-per-line fold): dedup never
    grows a doc, keeps every singleton line, and the multiset of kept
    non-blank lines is exactly the distinct normalized line set."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            F.regexp_replace(F.col("text"), r"((\S+ ){7}\S+) ", "$1\n").alias(
                "text"
            ),
        )
    )
    out = line_dedup(docs).cache()
    assert out.count() == docs.count()
    assert out.filter(F.col("n_kept") > F.col("n_lines")).count() == 0
    n_distinct = (
        docs.select(
            F.explode(F.split("text", "\n")).alias("line")
        )
        .select(F.trim("line").alias("k"))
        .filter(F.col("k") != "")
        .distinct()
        .count()
    )
    kept_nonblank = (
        out.select(F.explode(F.split("text_dedup", "\n")).alias("line"))
        .filter(F.trim("line") != "")
        .count()
    )
    # every distinct line key kept exactly once (docs fully deduped
    # contribute an empty text_dedup, filtered by the blank guard)
    assert kept_nonblank == n_distinct


def test_key_skew_stats(spark):
    from aws_log_ingestion_spark.operators.sessions import key_skew_stats

    rows = (
        [("hot", i, "u", "x", "m", 1_000 + i) for i in range(250)]
        + [("warm", i, "u", "x", "m", 1_000 + i) for i in range(100)]
        + [("cold", 0, "u", "x", "m", 1_000)]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, "
        "text string, ts_ms long"
    )
    out = key_skew_stats(df, top_k=2, target_rows_per_task=100).collect()
    assert [(r.skew_rank, r.conv_id, r.n_rows) for r in out] == [
        (1, "hot", 250),
        (2, "warm", 100),
    ]
    hot = out[0]
    assert hot.total_rows == 351
    assert hot.share_ppm == 250 * 1_000_000 // 351
    assert hot.suggested_salts == 3  # ceil(250/100)
    assert out[1].suggested_salts == 1


def test_rarity_score_hand_computed(spark):
    from aws_log_ingestion_spark.operators.text_analysis import rarity_score

    docs = _docs(
        spark,
        [(1, "aa aa bb"), (2, "aa cc"), (3, "dd"), (4, "")],
    )
    got = {r.doc_id: r for r in rarity_score(docs).collect()}
    # n_docs=4 -> weight = 4000 DIV df; df: aa=2, bb=cc=dd=1
    assert (got[1].n_tokens, got[1].rarity_sum) == (3, 2 * 2000 + 4000)
    assert got[1].rarity_avg == (2 * 2000 + 4000) // 3
    assert got[2].rarity_avg == (2000 + 4000) // 2
    assert got[3].rarity_avg == 4000  # all-rare vocabulary scores highest
    assert (got[4].n_tokens, got[4].rarity_sum, got[4].rarity_avg) == (0, 0, 0)
    assert got[3].rarity_avg > got[2].rarity_avg > got[1].rarity_avg


def test_curate_plan_shapes(spark):
    """Both dedup shapes keep the wide signal row off the exchange rail.

    window (default): exactly ONE Exchange (the content-hash window),
    no join — measured faster on this corpus (see curate docstring).
    broadcast: exactly ONE narrow Exchange — the map-side-combined
    (text_hash, doc_id) agg; the join back is a BroadcastHashJoin, so
    the per-row signal projection never shuffles. And the two shapes
    agree row-for-row."""
    import re

    from aws_log_ingestion_spark.operators.text_analysis import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan_w = _plan_of(curate(docs))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan_w)) == 1, plan_w
    assert "Join" not in plan_w

    plan = _plan_of(curate(docs, dedup_join="broadcast"))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # partial agg before the exchange = map-side combine is in place
    assert re.search(r"HashAggregate.*partial_min", plan, re.S), plan

    a = curate(docs).orderBy("doc_id").collect()
    b = curate(docs, dedup_join="broadcast").orderBy("doc_id").collect()
    assert a == b


def test_quantile_stats_hand_computed(spark):
    from aws_log_ingestion_spark.operators.text_analysis import quantile_stats

    rows = [(i, "x" * (10 * (i + 1)), "en") for i in range(10)]  # 10..100
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = quantile_stats(docs).collect()[0]
    # percentile_disc over {10..100}: rank ceil(q/100*10)
    assert (got.lang, got.n_docs) == ("en", 10)
    assert got.p50_chars == 50   # rank 5
    assert got.p90_chars == 90   # rank 9
    assert got.p99_chars == 100  # rank ceil(9.9)=10
