"""Known-answer tests for the training-data operators: planted exact and
near duplicates, planted embedding clusters, language markers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_log_ingestion_spark.operators import dedup, similarity, text_analysis

DOCS = [
    # planted near-dup pair: 0 and 1 differ by one word at the end
    (0, "the quick brown fox jumps over the lazy dog again and again today", "en"),
    (1, "the quick brown fox jumps over the lazy dog again and again tonight", "en"),
    # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog again and again today", "en"),
    # exact dup modulo whitespace
    (3, "  the quick  brown fox jumps over the lazy dog again and again today ", "en"),
    # unrelated
    (4, "completely different content about spark window aggregation plans", "en"),
    (5, "der hund und die katze laufen durch der garten und der park", "de"),
    (6, "le chat et la souris dansent dans le jardin et la maison", "fr"),
    (7, "short", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    return df.withColumn("doc_id", F.col("doc_id").cast("long")).cache()


def test_exact_dedup_groups(docs):
    got = {r["doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
    # 0, 2, 3 share a normalized hash; keeper is 0
    assert got[0]["keep_id"] == 0 and got[0]["is_duplicate"] == 0
    assert got[2]["keep_id"] == 0 and got[2]["is_duplicate"] == 1
    assert got[3]["keep_id"] == 0 and got[3]["is_duplicate"] == 1
    assert got[1]["is_duplicate"] == 0
    assert got[4]["is_duplicate"] == 0


def test_ngram_jaccard_finds_planted_pair(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_x1000"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    # 0-1 differ in last word only: 11 shingles each, 10 shared -> J=10/12
    assert (0, 1) in pairs and pairs[(0, 1)] == 833
    # exact dups have J=1000
    assert pairs[(0, 2)] == 1000 and pairs[(0, 3)] == 1000 and pairs[(2, 3)] == 1000
    # unrelated docs don't appear
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_lsh_equals_bruteforce_on_planted_dups(docs):
    brute = {
        (r["id_a"], r["id_b"]): r["jaccard_x1000"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard_x1000"]
        for r in dedup.minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
    }
    # identical verdicts (LSH recall at J>=0.8 is ~1; planted pairs are high-J)
    assert lsh == brute


def test_simhash_near_zero_hamming_for_exact_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs, max_hamming=16).collect()
    }
    assert pairs.get((0, 2)) == 0  # identical word multisets
    assert pairs.get((0, 3)) == 0
    if (0, 1) in pairs:
        assert pairs[(0, 1)] <= 16


def test_lang_id_markers(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in text_analysis.lang_id(docs).collect()}
    assert got[0] == "en" and got[5] == "de" and got[6] == "fr"
    assert got[7] == "unknown"  # no marker words


def test_quality_score_dock_rules(docs):
    got = {r["doc_id"]: r for r in text_analysis.quality_score(docs).collect()}
    assert got[7]["quality"] <= 40  # short doc docked for words+chars+stopwords
    assert got[0]["quality"] == 100


def test_token_counts(docs):
    got = {r["doc_id"]: r for r in text_analysis.token_counts(docs).collect()}
    assert got[7]["n_ws_tokens"] == 1
    assert got[0]["n_ws_tokens"] == 13
    assert got[0]["n_bpe_tokens"] == 13  # pure letter runs


def test_winnow_fingerprints_detect_overlap(docs):
    fps = {
        r["doc_id"]: set(r["fingerprints"])
        for r in text_analysis.winnow_fingerprints(docs).collect()
    }
    # exact dups -> identical fingerprint sets
    assert fps[0] == fps[2] == fps[3]
    # near dups share most fingerprints; unrelated share almost none
    sim_near = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    sim_far = len(fps[0] & fps[4]) / len(fps[0] | fps[4])
    assert sim_near > 0.5 > sim_far


def test_brute_force_topk_self_similarity(spark):
    import random

    rng = random.Random(7)
    # 3 clusters of 10 vectors each around distinct centroids
    rows = []
    for vid in range(30):
        c = vid % 3
        base = [1.0 if d // 8 == c else 0.0 for d in range(24)]
        rows.append((vid, [b + rng.uniform(-0.05, 0.05) for b in base], c))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    topk = similarity.brute_force_topk(emb, n_queries=3, k=5).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # every query's top-5 comes from its own cluster
    for q, neighbors in by_q.items():
        assert all(n % 3 == q % 3 for n in neighbors), (q, neighbors)


def test_lsh_topk_matches_bruteforce_within_bucket(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = similarity.lsh_topk(emb, n_queries=3, k=5, n_planes=4).collect()
    assert len(lsh) > 0
    # every LSH hit must also be a true neighbor ordering: ranks ascend
    by_q = {}
    for r in lsh:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_x1e6"]))
    for q, rows in by_q.items():
        rows.sort()
        cos_vals = [c for _, c in rows]
        assert cos_vals == sorted(cos_vals, reverse=True)


def test_multimodal_feature_batch_shape(spark, docs):
    from aws_log_ingestion_spark.operators import multimodal

    media = multimodal.synth_media(docs.select("doc_id", "text"))
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == len(DOCS)
    for r in feats:
        assert len(r["features"]) == 4
        assert r["media_type"] in ("image/png", "audio/wav", "video/mp4")
    # png decode is real now -> junk bytes are a ValueError (fallback
    # isolation); the codec-less format still raises NotImplementedError
    with pytest.raises(ValueError):
        multimodal.decode_media(b"xx", "image/png")
    # mp4 dispatches to the real ISO-BMFF demuxer now: junk bytes are
    # malformed (ValueError, fallback isolation); the genuinely
    # codec-less path moved to unknown media types
    with pytest.raises(ValueError):
        multimodal.decode_media(b"xx", "video/mp4")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "application/x-unknown")


def test_multimodal_resize_metadata_sync(spark, docs):
    from aws_log_ingestion_spark.operators import multimodal

    media = multimodal.synth_media(docs.select("doc_id", "text"))
    resized = multimodal.resize_media(media, target_w=8, target_h=8).collect()
    assert len(resized) == len(DOCS)
    for r in resized:
        assert r["width"] == 8 and r["height"] == 8
        assert r["n_bytes"] == len(r["payload"])


def test_neardup_lsh_planted_recall_and_exactness(spark):
    """neardup_pairs_lsh is the serving query: its pairs must be a SUBSET
    of brute force with identical cosines (exact verification), and in
    the intended regime (true near-dups, cos >= 0.9) multi-probe radius 2
    must find essentially all of them."""
    import random

    rng = random.Random(11)
    dim = 64
    rows = []
    planted = set()
    vid = 0
    for base_i in range(20):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((vid, base))
        # one perturbed near-dup per base vector (cos ~ 0.99)
        dup = [x + rng.uniform(-0.05, 0.05) for x in base]
        rows.append((vid + 1, dup))
        planted.add((vid, vid + 1))
        vid += 2
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    brute = {
        (r["id_a"], r["id_b"]): r["cos_x1e6"]
        for r in similarity.cosine_neardup_pairs(emb, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos_x1e6"]
        for r in similarity.neardup_pairs_lsh(
            emb, threshold=0.9, probe_hamming=2
        ).collect()
    }
    # exactness: every reported pair is a brute-force pair with the same cosine
    for pair, cos in lsh.items():
        assert pair in brute and brute[pair] == cos
    # recall on planted true near-dups
    found_planted = sum(1 for p in planted if p in lsh)
    assert found_planted >= 0.9 * len(planted), (found_planted, len(planted))


def test_neardup_lsh_no_cartesian_plan(spark):
    """The serving plan must be an equi-join on bucket keys, never a
    cartesian/nested-loop product."""
    import io
    from contextlib import redirect_stdout

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = similarity.neardup_pairs_lsh(emb, threshold=0.35, probe_hamming=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lang_id_trigram_fallback_without_markers(spark):
    """Text containing NONE of the marker words is still identified via
    the char-trigram profiles."""
    rows = [
        (0, "ich brauche einen schnellen rechner durchsuchung", "de"),
        (1, "quelques questions entre quarante musiciens parlaient", "fr"),
        (2, "walking through evening weather, something interesting", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {r["doc_id"]: r for r in text_analysis.lang_id(df).collect()}
    assert got[0]["pred_lang"] == "de"
    assert got[1]["pred_lang"] == "fr"
    assert got[2]["pred_lang"] == "en"
    # no marker words present in any of these texts
    from aws_log_ingestion_spark.operators.text_analysis import LANG_MARKERS

    markers = {w for ws in LANG_MARKERS.values() for w in ws}
    assert all(not (set(t.split()) & markers) for _, t, _ in rows)


def test_lang_id_script_classes(spark):
    """Codepoint-script detection: kana beats han (kanji+kana text is
    Japanese, not Chinese), hangul -> ko, Cyrillic -> ru, han-only -> zh;
    script hits override Latin marker words present in the same text."""
    rows = [
        (0, "日本語のテキストです", "ja"),       # kanji + kana -> ja, not zh
        (1, "これは ひらがな だけ", "ja"),        # hiragana only
        (2, "한국어 문서 예시입니다", "ko"),
        (3, "русский текст для теста", "ru"),
        (4, "中文文档没有假名", "zh"),            # han only -> zh
        (5, "the это смешанный text", "ru"),   # Cyrillic beats en markers
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {r["doc_id"]: r["pred_lang"] for r in text_analysis.lang_id(df).collect()}
    assert got == {0: "ja", 1: "ja", 2: "ko", 3: "ru", 4: "zh", 5: "ru"}


def test_curate_verdicts_on_planted_docs(docs):
    got = {r["doc_id"]: r for r in text_analysis.curate(docs, min_quality=60).collect()}
    # exact dups of doc 0: the min-id representative is kept, others dropped
    assert got[0]["verdict"] != "duplicate"
    assert got[2]["verdict"] == "duplicate" and got[2]["keep"] == 0
    assert got[3]["verdict"] == "duplicate"
    # 'short' (1 word) fails the token floor first
    assert got[7]["verdict"] == "too_short"
    # healthy en/de/fr docs are kept
    assert got[1]["verdict"] == "kept" and got[1]["keep"] == 1
    assert got[5]["verdict"] == "kept"
    assert got[6]["verdict"] == "kept"


def test_curate_repetitive_branch(spark):
    """The degenerate-repetition gate fires AFTER quality and BEFORE
    lang: a >80%-duplicate-words doc (token-loop output) that passes the
    quality floor lands 'repetitive'; high-but-natural stopword
    repetition does not trip it."""
    docs = spark.createDataFrame(
        [
            # 21 words, 3 distinct -> dup frac 857
            (0, "the cat and " * 7, "en"),
            (1, "the quick brown fox jumps over one lazy dog near rivers", "en"),
            # heavy stopword repetition (frac ~545) stays kept
            (2, "the cat and the dog and the bird and the fish ran", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in text_analysis.curate(docs).collect()}
    assert got[0]["verdict"] == "repetitive" and got[0]["keep"] == 0
    assert got[0]["dup_word_frac_x1000"] > 800
    assert got[1]["verdict"] == "kept"
    assert got[2]["verdict"] == "kept" and got[2]["dup_word_frac_x1000"] > 400


def test_shard_assign_deterministic_and_complete(docs):
    a = {r["doc_id"]: r for r in text_analysis.shard_assign(docs, n_shards=4).collect()}
    b = {r["doc_id"]: r for r in text_analysis.shard_assign(docs, n_shards=4).collect()}
    assert {k: v["shard"] for k, v in a.items()} == {k: v["shard"] for k, v in b.items()}
    assert all(0 <= r["shard"] < 4 for r in a.values())
    # shard token totals are consistent with membership
    for s in range(4):
        members = [r for r in a.values() if r["shard"] == s]
        if members:
            assert members[0]["shard_tokens"] == sum(m["n_ws_tokens"] for m in members)


def test_stratified_sample_rate_and_stability(spark):
    rows = [(i, f"document number {i} with some words", "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = text_analysis.stratified_sample(df, rate_x1000=200).collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], []).append(r["sampled"])
    for stratum, flags in by_stratum.items():
        rate = sum(flags) / len(flags)
        assert 0.12 < rate < 0.28, (stratum, rate)  # ~0.2 per stratum
    # hash-based: rerun identical
    again = text_analysis.stratified_sample(df, rate_x1000=200).collect()
    assert {r["doc_id"]: r["sampled"] for r in got} == {r["doc_id"]: r["sampled"] for r in again}


def test_redact_pii_known_answers(spark):
    rows = [
        (0, "mail me at a.b@x.co or admin@example.org for details", "en"),
        (1, "server 10.0.0.1 failed, RequestId: 12345678-1234-1234-1234-123456789abc", "en"),
        (2, "call +1 415-555-0199 tomorrow", "en"),
        (3, "nothing sensitive here at all", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {r["doc_id"]: r for r in text_analysis.redact_pii(df).collect()}
    assert got[0]["n_email"] == 2
    assert got[0]["redacted"] == "mail me at <EMAIL> or <EMAIL> for details"
    assert got[1]["n_ipv4"] == 1 and got[1]["n_uuid"] == 1
    assert got[1]["redacted"] == "server <IP> failed, RequestId: <UUID>"
    assert got[2]["n_phone"] == 1
    assert got[2]["redacted"] == "call <PHONE> tomorrow"
    assert got[3]["redacted"] == rows[3][1]
    assert all(
        got[3][f"n_{n}"] == 0 for n in ("email", "uuid", "ipv4", "phone")
    )


def test_pack_sequences_prefix_sums_and_bins(spark):
    """Bins are floor(prefix-sum-before / budget) within each hash shard
    ordered by doc_id — verified against an independent python replay of
    the md5 shard hash and the running sums."""
    import hashlib

    rows = [(i, " ".join(["w"] * (i % 7 + 1)), "en") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    budget = 10
    got = {
        r["doc_id"]: r
        for r in text_analysis.pack_sequences(df, budget=budget, n_shards=4).collect()
    }

    def shard_of(did: int) -> int:
        return int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16) % 4

    by_shard: dict[int, list[int]] = {}
    for did, _, _ in rows:
        by_shard.setdefault(shard_of(did), []).append(did)
    for shard, dids in by_shard.items():
        cum = 0
        for did in sorted(dids):
            r = got[did]
            assert r["shard"] == shard
            assert r["n_ws_tokens"] == did % 7 + 1
            assert r["cum_before"] == cum
            assert r["bin_idx"] == cum // budget
            cum += did % 7 + 1


def test_decontaminate_flags_benchmark_overlap(spark):
    """doc_id 0 and 50 form the benchmark slice; a training doc lifting a
    phrase from doc 0 is contaminated, an unrelated one is not, and
    benchmark docs themselves are excluded from the output."""
    rows = [
        (0, "the secret benchmark question about unusual marsupial biology", "en"),
        (50, "another held out evaluation prompt concerning tidal physics", "en"),
        (1, "training text quoting the secret benchmark question verbatim", "en"),
        (2, "totally unrelated sentence with no overlap whatsoever present", "en"),
        (3, "a phrase evaluation prompt concerning tidal lifted from the eval set", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"]).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {r["doc_id"]: r for r in text_analysis.decontaminate(df, min_shared=2).collect()}
    assert set(got) == {1, 2, 3}  # benchmark rows 0 and 50 excluded
    assert got[1]["contaminated"] == 1 and got[1]["n_shared_shingles"] >= 2
    # doc 3 lifts "evaluation prompt concerning tidal" = exactly 2 shingles
    assert got[3]["contaminated"] == 1 and got[3]["n_shared_shingles"] == 2
    assert got[2]["contaminated"] == 0 and got[2]["n_shared_shingles"] == 0


def _plan_of(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontaminate_plan_broadcasts_blocklist(spark):
    """The blocklist join must be a BroadcastHashJoin — the corpus-side
    shingle stream must never shuffle on the shingle key at 100 TB."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan_of(text_analysis.decontaminate(docs))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_plan_single_exchange(spark):
    """Packing is ONE hash exchange on the shard key + one window — no
    extra shuffle may creep in (the property that holds at 10^12 docs)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan_of(text_analysis.pack_sequences(docs))
    import re as _re

    # formatted explain lists each operator once as a "(n) Exchange" header
    n_exchanges = len(_re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan


def test_sessionize_gap_boundaries(spark):
    from aws_log_ingestion_spark.operators.sessions import sessionize

    rows = [
        # conv a: turns at t=0s, 10s, 400s (gap>300s -> new session), 410s
        ("a", 0, "u", "x", "m0", 0),
        ("a", 1, "u", "x", "m1", 10_000),
        ("a", 2, "u", "x", "m2", 400_000),
        ("a", 3, "u", "x", "m3", 410_000),
        # conv b: single turn
        ("b", 0, "u", "x", "m0", 5_000),
    ]
    df = spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "role", "tool", "text", "ts_ms"]
    ).withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop("ts_ms")
    got = {
        (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["session_start"])
        for r in sessionize(df, gap_ms=300_000).collect()
    }
    assert got[("a", 0)] == (0, 1)
    assert got[("a", 1)] == (0, 0)
    assert got[("a", 2)] == (1, 1)  # 390s gap > 300s -> new session
    assert got[("a", 3)] == (1, 0)
    assert got[("b", 0)] == (0, 1)


def test_conversation_stats_flags_and_span(spark):
    from aws_log_ingestion_spark.operators.sessions import conversation_stats
    from aws_log_ingestion_spark.sources import datagen

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "tool": "lambda",
         "text": datagen.REPORT, "ts_millis": 1_000},
        {"conv_id": "c1", "turn_idx": 1, "role": "agent", "tool": "vpc",
         "text": datagen.NR_SHORT, "ts_millis": 61_000},
        {"conv_id": "c1", "turn_idx": 2, "role": "agent", "tool": "lambda",
         "text": "plain line", "ts_millis": 121_000},
    ]
    df = datagen.to_spark_df(spark, rows)
    got = conversation_stats(df).collect()[0]
    assert got["n_turns"] == 3 and got["n_roles"] == 2 and got["n_tools"] == 2
    assert got["span_ms"] == 120_000
    # REPORT line contains "RequestId:" too -> counted in both tallies
    assert got["n_report"] == 1 and got["n_nr_marker"] == 1
    assert got["n_request_id_lines"] == 1
