"""Known-answer tests for connected-component dedup clustering and the
round-3 text operators (repetition stats, tf-idf top-k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators import text_analysis
from aws_log_ingestion_spark.operators.graph import connected_components, dup_clusters


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference oracle: plain union-find, label = min id in component."""
    parent = {x: x for x in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in n_nodes}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def test_connected_components_vs_union_find(spark):
    """Chains, a cycle, a star, duplicate/reversed edges — labels must
    equal a sequential union-find's min-id labels exactly."""
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11), (11, 12), (12, 10),    # cycle
        (20, 21), (20, 22), (20, 23),    # star
        (30, 31), (31, 30), (30, 31),    # dup + reversed edges
        (5, 5),                          # self-loop (dropped)
    ]
    nodes = {x for e in edges for x in e if e[0] != e[1]}
    want = _union_find(nodes, [e for e in edges if e[0] != e[1]])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == want


def test_connected_components_long_path(spark):
    """A 64-node path has diameter 63: plain label propagation would need
    ~63 rounds; star alternation must converge inside the default
    max_iter=25 (O(log^2 n)) and still label every node with the root."""
    edges = [(i, i + 1) for i in range(63)]
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_dup_clusters_transitive_closure(spark):
    """A~B and B~C (but never A~C as a pair) must collapse into ONE
    cluster with a single canonical doc — the under-deletion case raw
    pair lists get wrong."""
    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = _pairs_df(spark, [(0, 1), (1, 2), (4, 5)])
    got = {r["doc_id"]: r for r in dup_clusters(docs, pairs).collect()}
    assert {got[i]["cluster_id"] for i in (0, 1, 2)} == {0}
    assert [got[i]["cluster_size"] for i in (0, 1, 2)] == [3, 3, 3]
    assert [got[i]["is_canonical"] for i in (0, 1, 2)] == [1, 0, 0]
    # singleton keeps itself
    assert got[3]["cluster_id"] == 3 and got[3]["cluster_size"] == 1
    assert got[3]["is_canonical"] == 1
    assert got[4]["cluster_id"] == 4 and got[5]["cluster_id"] == 4
    # exactly one canonical per cluster ({0,1,2}, {3}, {4,5})
    assert sum(r["is_canonical"] for r in got.values()) == 3


def test_dup_clusters_plan_no_cartesian(spark):
    import io
    from contextlib import redirect_stdout

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    df = dup_clusters(docs, _pairs_df(spark, [(0, 1)]))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_stats_known_answers(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a a a"),
            # long enough that no single 2-gram covers >20% of the chars
            (1, "the quick brown fox jumps over one lazy dog while birds sing near quiet rivers under golden evening light"),
            (2, "word"),
            (3, ""),
            (4, "x y x y x y x y"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_analysis.repetition_stats(docs).collect()}

    r0 = got[0]  # "a a a a a": 5 words, 1 distinct, top gram "a a" x4
    assert r0["n_words"] == 5 and r0["n_distinct_words"] == 1
    assert r0["top_2gram"] == "a a" and r0["top_2gram_count"] == 4
    assert r0["dup_word_frac_x1000"] == 800       # floor(4*1000/5)
    assert r0["top_2gram_char_frac_x1000"] == 1333  # floor(4*3*1000/9) — overlap > 1
    assert r0["is_repetitive"] == 1

    r1 = got[1]  # all distinct words
    assert r1["dup_word_frac_x1000"] == 0 and r1["is_repetitive"] == 0

    # single word / empty: no 2-grams
    for i in (2, 3):
        assert got[i]["top_2gram"] == "" and got[i]["top_2gram_count"] == 0
        assert got[i]["top_2gram_char_frac_x1000"] == 0

    r4 = got[4]  # "x y" x4 vs "y x" x3 -> tie broken by count first
    assert r4["top_2gram"] == "x y" and r4["top_2gram_count"] == 4
    assert r4["n_distinct_words"] == 2
    assert r4["is_repetitive"] == 1


def test_tfidf_topk_ranking(spark):
    docs = spark.createDataFrame(
        [
            # "spark" tf=2 beats everything; "rare" (df=1) must outrank
            # "shared" (df=2) at equal tf=1; stopword "the" never appears
            (0, "the spark spark rare shared"),
            (1, "the shared other words here"),
        ],
        "doc_id long, text string",
    )
    rows = text_analysis.tfidf_topk(docs, k=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    assert [r["term"] for r in d0] == ["spark", "rare", "shared"]
    assert [r["tf"] for r in d0] == [2, 1, 1]
    assert [r["doc_freq"] for r in d0] == [1, 1, 2]
    assert all(r["term"] != "the" for r in rows)
    assert all(len(v) <= 3 for v in by_doc.values())


def test_corpus_stats_rollup(spark):
    docs = spark.createDataFrame(
        [
            (0, "one two three", "en", "web"),
            (1, "four five", "en", "web"),
            (2, "sechs", "de", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {(r["lang"], r["source"]): r for r in text_analysis.corpus_stats(docs).collect()}
    en = got[("en", "web")]
    assert en["n_docs"] == 2 and en["total_tokens"] == 5
    assert en["total_chars"] == len("one two three") + len("four five")
    assert en["mean_tokens_x100"] == 250
    assert got[("de", "web")]["n_docs"] == 1


def test_boilerplate_stats_shared_fraction(spark):
    # docs 0 and 1 share the shingle "a b c"; doc 2 is all-novel;
    # doc 3 is too short for any 3-shingle
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "a b c e"),
            (2, "p q r s"),
            (3, "xy"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in text_analysis.boilerplate_stats(docs, n=3, df_min=2).collect()
    }
    # doc 0 shingles: "a b c", "b c d" -> 1 of 2 shared
    assert got[0]["n_shingles"] == 2 and got[0]["n_shared_shingles"] == 1
    assert got[0]["shared_frac_x1000"] == 500
    assert got[1]["shared_frac_x1000"] == 500
    assert got[2]["n_shared_shingles"] == 0 and got[2]["shared_frac_x1000"] == 0
    assert got[3]["n_shingles"] == 0 and got[3]["shared_frac_x1000"] == 0


def test_tfidf_topk_k_cap_and_term_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, "q r p q r p")], "doc_id long, text string"
    )
    rows = sorted(text_analysis.tfidf_topk(docs, k=2).collect(), key=lambda r: r["rank"])
    # all tf=2, df=1 -> lexicographic term order, capped at k=2
    assert [r["term"] for r in rows] == ["p", "q"]
