"""Text analysis for training-data pipelines over the ``documents`` table.

ALL five operators are pure Catalyst expressions (no UDFs, no Python on
the hot path): language-ID (marker words + char-trigram profiles),
quality scoring, token counting (whitespace + BPE-ish regex), md5
document fingerprinting, and winnowing fingerprints (array higher-order
functions). Each has an exact ANSI-SQL oracle; the computations are
deliberately integer/string-valued so cross-engine hashing is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# BPE-ish tokenizer: letter runs | digit runs | single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]

_ALNUM_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)
_JAVA_WS_CHARS = " \t\n\x0b\f\r"  # Java regex \s, exactly


def _count_punct(text: Column) -> Column:
    """Count of chars matching [^A-Za-z0-9\\s] — the quality signal's
    punctuation count — WITHOUT the regex engine. regexp_count pays
    ~10-20 us per MATCH (it expands to size(regexp_extract_all): a
    string alloc per match), which measured as the single dominant cost
    of the whole curate pass at ~200 punct chars/doc
    (OPTIMIZATION_r07.md). The complement identity
    n_punct = n_chars - n_alnum - n_ws with each positive class counted
    by length(s) - length(translate(s, class_chars, '')) is exact over
    code points (both the regex char class and translate operate on one
    code point at a time; non-ASCII chars stay in both translations and
    are counted as punctuation, exactly like [^A-Za-z0-9\\s])."""
    n = F.length(text)
    n_alnum = n - F.length(F.translate(text, _ALNUM_CHARS, ""))
    n_ws = n - F.length(F.translate(text, _JAVA_WS_CHARS, ""))
    return n - n_alnum - n_ws

# language marker words for the n-gram/keyword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "y"],
}

# Char-trigram profiles (Cavnar & Trenkle-style most-frequent trigrams,
# rank-weighted): the richer lang-id feature set. Leading/trailing
# spaces capture word-boundary trigrams on the space-padded text.
LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", "ing", "ng ", " an", "and", "nd ", "ion",
           " of", "of ", "ed ", " to", "to ", "ent"],
    "de": ["er ", "en ", " de", "der", "ie ", "ch ", "sch", "ein", "die",
           "und", " un", "ich", "cht", "ung", "gen"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "nt ", " la", "la ",
           "que", " qu", "ue ", "ait", "les", " et"],
    "es": [" de", "de ", "os ", " la", "la ", " el", "el ", "que", " qu",
           "ue ", "ión", " en", "en ", "ado", "nte"],
}


def trigram_scores(text: Column) -> dict[str, Column]:
    """Rank-weighted profile-trigram OCCURRENCE counts per language,
    computed as pure Catalyst expressions: for each profile trigram,
    occurrences = (len(t) - len(replace(t, tg, ''))) / 3 on the padded
    normalized text. ~60 replace+length pairs, all whole-stage codegen —
    no explode, no join, no shuffle."""
    norm = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "), F.lit(" ")
    )
    out: dict[str, Column] = {}
    for lang, tgs in LANG_TRIGRAMS.items():
        n = len(tgs)
        score = F.lit(0)
        for rank, tg in enumerate(tgs):
            occ = (F.length(norm) - F.length(F.replace(norm, F.lit(tg)))) / 3
            score = score + occ.cast("int") * F.lit(n - rank)
        out[lang] = score.cast("int")
    return out


def _norm_words(text: Column) -> Column:
    return F.split(F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "), " ")


def _count_word(words: Column, w: str) -> Column:
    return F.size(F.filter(words, lambda x: x == F.lit(w)))


def _count_tokens_in(text: Column, ws: tuple[str, ...]) -> Column:
    """Occurrences among the normalized whitespace tokens of ``text`` of
    ANY word in ``ws`` — equal to sum(_count_word(words, w) for w in ws)
    when the words are distinct, but computed as ONE codegen regex pass
    instead of len(ws) interpreted higher-order array filters (lambda
    expressions are evaluated interpreted per element in Spark — the
    measured bulk of curate/lang-id CPU, OPTIMIZATION_r07.md). The
    normalized text is single-space separated and padded, so zero-width
    lookarounds match exactly the whole-token occurrences; separator
    spaces are not consumed, so consecutive tokens all match. Java-regex
    lookbehind is Spark-side only — the frozen DuckDB oracle SQL keeps
    its per-word arithmetic, values identical."""
    norm = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "), F.lit(" ")
    )
    pat = "(?<= )(" + "|".join(ws) + ")(?= )"
    return F.regexp_count(norm, F.lit(pat))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    words = _norm_words(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(words).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
        F.octet_length(F.col("text")).alias("n_bytes"),
    )


def quality_col(text: Column, words: Column | None = None) -> Column:
    """The 0-100 quality score as a single Column expression — shared by
    ``quality_score`` and the one-pass ``curate`` composition. Pass a
    pre-materialized ``words`` column when composing: the expression
    references the split once per stopword, and when()-guarded uses
    defeat codegen subexpression elimination (the r4 lang-id lesson)."""
    if words is None:
        words = _norm_words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    # translate-based punct count (see _count_punct — the old
    # size(regexp_extract_all) formulation was curate's dominant cost);
    # one-pass token regex replaces 7 interpreted array filters
    # (see _count_tokens_in)
    n_punct = _count_punct(text)
    n_stop = _count_tokens_in(text, tuple(STOPWORDS))
    score = (
        F.lit(100)
        - F.when(n_words < 5, 40).otherwise(0)
        - F.when(n_chars < 20, 20).otherwise(0)
        - F.when(n_punct * 4 > n_chars, 20).otherwise(0)
        - F.when(n_stop == 0, 10).otherwise(0)
    )
    return F.greatest(F.lit(0), score).cast("int")


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic integer quality features + a 0-100 score.

    Features: length, word count, mean word length (x100), punctuation
    count, stopword count. Score: starts at 100, docked for extremes —
    the shape of heuristic quality filters in web-scale corpora.
    """
    words = _norm_words(F.col("text"))
    n_words = F.size(words)
    n_chars = F.length(F.col("text"))
    n_punct = _count_punct(F.col("text"))
    n_stop = _count_tokens_in(F.col("text"), tuple(STOPWORDS))
    # floor, not cast: DuckDB casts double->int by rounding while Spark
    # truncates — floor is the portable choice for the SQL oracle
    mean_word_len_x100 = F.when(
        n_words > 0, F.floor(n_chars * 100 / n_words).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_obs"),
        n_words.alias("n_words"),
        mean_word_len_x100.alias("mean_word_len_x100"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        quality_col(F.col("text")).alias("quality"),
    )


# Script-detecting codepoint classes (same pattern syntax is valid Java
# regex for Spark and RE2 for the DuckDB oracle). Ordered by priority:
# kana decides ja BEFORE the han check (Japanese text mixes kanji with
# kana; Chinese has han but no kana), hangul decides ko, han-only decides
# zh, Cyrillic decides ru.
SCRIPT_CLASSES = [
    ("ja", r"[\x{3040}-\x{30ff}]"),   # hiragana + katakana
    ("ko", r"[\x{ac00}-\x{d7af}]"),   # hangul syllables
    ("zh", r"[\x{4e00}-\x{9fff}]"),   # CJK unified ideographs
    ("ru", r"[\x{0400}-\x{04ff}]"),   # Cyrillic
]


def _lang_counts(text: Column) -> dict[str, Column]:
    tri = trigram_scores(text)
    return {
        lang: (
            _count_tokens_in(text, tuple(markers)) * 100 + tri[lang]
        ).cast("int")
        for lang, markers in LANG_MARKERS.items()
    }


def pred_lang_col(text: Column) -> Column:
    """The predicted-language label as ONE Column expression.

    PERF TRAP (measured 13x): the when-chain references every language
    count (and greatest() references all four) so this single tree
    replicates the ~60-replace trigram arithmetic many times, and
    Catalyst's subexpression elimination cannot hoist expressions out of
    conditional branches — 128 s vs 9.7 s at 100k docs against the
    two-stage form. Use ``pred_from_counts`` over materialized count
    COLUMNS (a projection boundary that CollapseProject keeps, because
    the aliases are non-cheap and multiply referenced) wherever the
    input is a DataFrame; this one-Column form remains only for contexts
    that genuinely need a standalone expression."""
    counts = _lang_counts(text)
    return pred_from_counts(text, {l: c for l, c in counts.items()})


def pred_from_counts(text: Column, counts: dict[str, Column]) -> Column:
    """when-chain + script-class override over ALREADY-MATERIALIZED
    per-language count columns (see pred_lang_col's perf note)."""
    best = F.greatest(*counts.values())
    pred = (
        F.when(best == 0, "unknown")
        .when(counts["en"] == best, "en")
        .when(counts["de"] == best, "de")
        .when(counts["fr"] == best, "fr")
        .otherwise("es")
    )
    for lang, cls in reversed(SCRIPT_CLASSES):
        # existence, not count: rlike stops at the first hit instead of
        # materializing every match (same boolean, incl. NULL-in-NULL-out)
        pred = F.when(text.rlike(cls), lang).otherwise(pred)
    return pred


def lang_id(docs: DataFrame) -> DataFrame:
    """Language ID: codepoint-script classes (ja/ko/zh/ru — kana before
    han so kanji+kana text reads as Japanese), then marker words +
    rank-weighted char-trigram profiles (Cavnar & Trenkle-style) for the
    Latin-script languages, fixed tie-break order en > de > fr > es >
    unknown. Marker-word hits dominate (x100) so unambiguous function
    words decide; the trigram profile scores break ties and cover
    marker-free text."""
    counts = _lang_counts(F.col("text"))
    # two-stage: counts materialize ONCE, the when-chain reads columns
    # (see pred_lang_col's perf note — 13x)
    staged = docs.select(
        "doc_id",
        "text",
        F.col("lang").alias("labeled_lang"),
        *[c.alias(f"c_{lang}") for lang, c in counts.items()],
    )
    pred = pred_from_counts(
        F.col("text"), {lang: F.col(f"c_{lang}") for lang in counts}
    )
    return staged.select(
        "doc_id",
        "labeled_lang",
        *[f"c_{lang}" for lang in counts],
        pred.alias("pred_lang"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Whitespace-normalised md5 fingerprint (exact-dup key) + 16-bit
    prefix bucket (cheap shard key for distributed dedup joins)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    h = F.md5(norm)
    return docs.select(
        "doc_id",
        h.alias("fp_md5"),
        F.substring(h, 1, 4).alias("fp_bucket"),
    )


def winnow_fingerprints(docs: DataFrame, k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD 2003) document fingerprints —
    the plagiarism-detection style local fingerprint set.

    PURE CATALYST (round 2 rewrite of the Python rolling-hash version):
    k-gram hashes are md5_long(substring) built with array higher-order
    functions, window minima via slice+array_min — per-row array math,
    zero shuffle, zero Python, and therefore exactly SQL-oracle-able.
    Semantics match the classic formulation: hash every k-gram of the
    whitespace-normalized text, take the min of every ``window``
    consecutive hashes, emit the distinct minima sorted. Documents
    shorter than k (or with fewer than ``window`` k-grams) fingerprint
    to the empty set.
    """
    from .dedup import md5_long

    s = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    n_grams = F.length(s) - F.lit(k - 1)
    empty = F.array().cast("array<bigint>")
    hs = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams), lambda i: md5_long(F.substring(s, i, k))
        ),
    ).otherwise(empty)
    staged = docs.select("doc_id", hs.alias("hs"))
    n_windows = F.size(F.col("hs")) - F.lit(window - 1)
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda j: F.array_min(F.slice(F.col("hs"), j, window)),
        ),
    ).otherwise(empty)
    return (
        staged.select("doc_id", F.array_sort(F.array_distinct(mins)).alias("fingerprints"))
        .select(
            "doc_id",
            F.size(F.col("fingerprints")).cast("long").alias("n_fingerprints"),
            "fingerprints",
        )
    )


def curate(
    docs: DataFrame,
    min_quality: int = 60,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_dup_word_x1000: int = 800,
    dedup_join: str = "window",
) -> DataFrame:
    """End-to-end training-data curation verdict per document — the
    composition the individual operators exist for: exact-dup removal
    (keep the min-doc_id representative), quality floor, language
    allowlist, token-count band, and a degenerate-repetition gate
    (duplicate-word fraction > 0.8 — token-loop output; NOT a boilerplate
    detector: natural prose runs 0.4-0.6 dup words from stopwords alone,
    so the line/2-gram signals in ``repetition_stats`` cover that). One row per document with the keep verdict and the FIRST
    failing reason (checks ordered cheapest-first), so curation decisions
    are auditable rather than silently dropped.

    All pure Catalyst: quality/lang/tokens/repetition are per-row
    expressions computed in ONE pass over the table (deriving five
    frames and re-joining on doc_id costs five shuffle joins and five
    scans — measured 6x slower at 25k docs, identical output). The dedup
    verdict has two physical shapes (VERDICT r4 #6 asked for the
    measurement):

    * ``dedup_join="window"`` (default): one window over text_hash —
      the wide signal row pays the one exchange. MEASURED FASTER at 100k
      docs (interleaved, pinned 8 cores: 8.3-9.9 s vs 9.6-12.4 s): the
      signal row is a handful of scalars, so the exchange is cheap, and
      the alternative pays a second scan of the text column instead.
    * ``dedup_join="broadcast"``: a NARROW map-side-combined
      ``groupBy(text_hash).min(doc_id)`` filtered to hashes with >= 2
      docs, broadcast-joined back — the signal projection never
      shuffles, at the cost of re-scanning text for the hash. Right when
      the signal row is WIDE (e.g. curate extended with embedding or
      shingle columns) or the input scan is cheap relative to the
      exchange; kept because that regime is real at 100 TB even though
      this corpus measures the window ahead.

    The r4-lesson fix that DID move curate: the normalized word array
    now materializes once in the staged projection (quality + dup-frac
    reference it ~25 times, several behind when()s where codegen CSE
    cannot hoist it) — 9.9 -> 8.3 s best-of-3 at 100k docs.
    """
    from pyspark.sql import Window as W

    words = F.col("__words")
    dup_frac = F.when(
        F.size(words) > 0,
        F.floor((F.size(words) - F.size(F.array_distinct(words))) * 1000 / F.size(words)),
    ).otherwise(0).cast("long")
    # ONE projection computes every per-row signal (quality, lang,
    # tokens, repetition are Column expressions over text — no reason to
    # derive five frames and re-join them on doc_id, which costs five
    # shuffle joins and five scans); the dedup verdict rides a single
    # window over the content hash. Measured 6x faster than the join
    # formulation at 25k docs, identical output.
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    counts = _lang_counts(F.col("text"))
    # lang counts materialize in their own projection, pred reads the
    # columns (pred_lang_col's perf note: the fused form replicates the
    # trigram arithmetic across when-branches — 13x slower)
    staged = docs.select(
        "doc_id",
        "text",
        # the normalized word array materializes ONCE here: quality's
        # stopword counts and the dup-word fraction reference it ~25
        # times, several behind when()s where codegen CSE can't hoist it
        _norm_words(F.col("text")).alias("__words"),
        *[c.alias(f"__c_{lang}") for lang, c in counts.items()],
    )
    base = staged.select(
        "doc_id",
        F.md5(norm).alias("text_hash"),
        quality_col(F.col("text"), words=words).alias("quality"),
        pred_from_counts(
            F.col("text"), {lang: F.col(f"__c_{lang}") for lang in counts}
        ).alias("pred_lang"),
        F.size(words).alias("n_ws_tokens"),
        dup_frac.alias("dup_word_frac_x1000"),
    )
    if dedup_join == "broadcast":
        dups = (
            docs.select(F.md5(norm).alias("text_hash"), "doc_id")
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("__keep"), F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .select("text_hash", "__keep")
        )
        j = (
            base.join(F.broadcast(dups), "text_hash", "left")
            .withColumn("keep_id", F.coalesce(F.col("__keep"), F.col("doc_id")))
            .drop("__keep")
            .withColumn(
                "is_duplicate", (F.col("doc_id") != F.col("keep_id")).cast("int")
            )
        )
    else:
        w = W.partitionBy("text_hash")
        j = base.withColumn("keep_id", F.min("doc_id").over(w)).withColumn(
            "is_duplicate", (F.col("doc_id") != F.col("keep_id")).cast("int")
        )
    reason = (
        F.when(F.col("is_duplicate") == 1, "duplicate")
        .when(F.col("n_ws_tokens") < min_tokens, "too_short")
        .when(F.col("n_ws_tokens") > max_tokens, "too_long")
        .when(F.col("quality") < min_quality, "low_quality")
        .when(F.col("dup_word_frac_x1000") > max_dup_word_x1000, "repetitive")
        .when(~F.col("pred_lang").isin(*langs), "lang_filtered")
        .otherwise("kept")
    )
    return j.select(
        "doc_id",
        "keep_id",
        "quality",
        "pred_lang",
        "n_ws_tokens",
        "dup_word_frac_x1000",
        reason.alias("verdict"),
        (reason == "kept").cast("int").alias("keep"),
    )


# PII patterns — simultaneously valid Java regex (Spark) and RE2 (DuckDB
# oracle): character classes + bounded quantifiers only, no lookaround or
# backreferences. Replacement order matters (emails contain digits a
# phone pattern could partially eat) and is pinned: email -> uuid ->
# ipv4 -> phone, identical in both engines.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "uuid",
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<UUID>",
    ),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{6,}\d\b", "<PHONE>"),
]


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrubbing for training corpora: emails, UUIDs, IPv4s and
    phone-like digit runs replaced with typed placeholder tokens, plus
    per-category match counts (measured on the ORIGINAL text, so counts
    are independent of replacement order). Pure per-row Catalyst — zero
    shuffle, whole-stage codegen; the patterns are dual-dialect so the
    driver oracle replays the exact same rewrite in DuckDB."""
    red = F.col("text")
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(F.col("text"), F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, token)
    return docs.select("doc_id", *counts, red.alias("redacted"))


def pack_sequences(
    docs: DataFrame, budget: int = 512, n_shards: int = 16
) -> DataFrame:
    """Token-budget sequence packing: assign each document to a training
    bin of ~``budget`` whitespace tokens, contiguously within its hash
    shard (bin = floor(tokens-before-me / budget) over the shard's
    doc_id order). This is the distributed formulation of greedy context
    packing: bins are deterministic, contiguous, and computable with ONE
    shuffle (the shard key) + one window — no sequential driver loop, so
    it holds at 10^12 documents. Downstream splicing concatenates each
    (shard, bin) group and truncates at the boundary token.
    """
    from pyspark.sql import Window as W

    from .dedup import md5_long

    toks = token_counts(docs).select("doc_id", "n_ws_tokens")
    assigned = toks.withColumn(
        "shard", (md5_long(F.col("doc_id").cast("string")) % n_shards).cast("int")
    )
    cum_before = (
        F.sum("n_ws_tokens").over(
            W.partitionBy("shard").orderBy("doc_id").rowsBetween(
                W.unboundedPreceding, -1
            )
        )
    )
    return assigned.select(
        "doc_id",
        "shard",
        "n_ws_tokens",
        F.coalesce(cum_before, F.lit(0)).cast("long").alias("cum_before"),
        F.floor(F.coalesce(cum_before, F.lit(0)) / budget).cast("long").alias("bin_idx"),
    )


def decontaminate(
    docs: DataFrame, bench: DataFrame | None = None, min_shared: int = 2
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing >=
    ``min_shared`` word 3-shingles with an evaluation set — the standard
    n-gram-overlap contamination check run before training. ``bench``
    defaults to the doc_id % 50 == 0 slice (a deterministic stand-in for
    an external eval table). The blocklist (distinct benchmark shingles)
    is small relative to the corpus, so it is BROADCAST — at 100 TB the
    corpus-side shingle scan never shuffles; only the tiny per-doc
    overlap counts aggregate.
    """
    from .dedup import word_shingles

    if bench is None:
        bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.join(
        bench.select(F.col("doc_id").alias("__bid")),
        F.col("doc_id") == F.col("__bid"),
        "left_anti",
    )
    block = word_shingles(bench).select("shingle").distinct()
    sh = word_shingles(train)
    shared = (
        sh.join(F.broadcast(block), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        train.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared_shingles"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) >= min_shared)
            .cast("int")
            .alias("contaminated"),
        )
    )


def shard_assign(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic training-shard assignment + per-shard token budget.

    Shard = md5-hash bucket of doc_id (content-independent, stable across
    runs, uniform under any doc_id distribution — the property that makes
    shards balanced at 100 TB without a global sort). Emits per-doc shard
    plus the shard's token totals via a window, so downstream packing can
    split oversized shards. One shuffle on the shard key.
    """
    from pyspark.sql import Window as W

    from .dedup import md5_long

    toks = token_counts(docs).select("doc_id", "n_ws_tokens")
    assigned = toks.withColumn(
        "shard", (md5_long(F.col("doc_id").cast("string")) % n_shards).cast("int")
    )
    w = W.partitionBy("shard")
    return assigned.select(
        "doc_id",
        "shard",
        "n_ws_tokens",
        F.sum("n_ws_tokens").over(w).cast("long").alias("shard_tokens"),
        F.count(F.lit(1)).over(w).cast("long").alias("shard_docs"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1): the
    standard web-corpus quality signals that catch boilerplate and
    degenerate generations.

    Per document: distinct-word ratio, duplicate-word fraction, and the
    character fraction covered by the MOST FREQUENT word 2-gram (count x
    gram length / normalized text length; overlapping occurrences mean
    the ratio can exceed 1 on degenerate text — it is a filter signal,
    not a partition of the text). ``is_repetitive`` applies the
    Gopher-shaped thresholds (dup-word > 0.30 or top-2-gram chars > 0.20).

    Scale shape: word stats are per-row Catalyst (array_distinct — no
    shuffle); the top-2-gram needs one explode + groupBy(doc_id, gram) +
    one window on doc_id — shuffle keys contain doc_id, so hot grams
    never concentrate on one task. All values integer (x1000) for exact
    cross-engine hashing.
    """
    from pyspark.sql import Window as W

    words = _norm_words(F.col("text"))
    norm_len = F.length(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    base = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        norm_len.alias("n_chars_norm"),
        words.alias("__w"),
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n_words") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_words") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("gram"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("gram").alias("top_2gram"), F.col("cnt").alias("top_2gram_count"))
    )
    j = base.drop("__w").join(top, "doc_id", "left")
    dup_frac = F.when(
        F.col("n_words") > 0,
        F.floor((F.col("n_words") - F.col("n_distinct_words")) * 1000 / F.col("n_words")),
    ).otherwise(0).cast("long")
    top_frac = F.when(
        F.col("top_2gram_count").isNotNull() & (F.col("n_chars_norm") > 0),
        F.floor(
            F.col("top_2gram_count") * F.length("top_2gram") * 1000 / F.col("n_chars_norm")
        ),
    ).otherwise(0).cast("long")
    return j.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.coalesce("top_2gram", F.lit("")).alias("top_2gram"),
        F.coalesce("top_2gram_count", F.lit(0)).cast("long").alias("top_2gram_count"),
        dup_frac.alias("dup_word_frac_x1000"),
        top_frac.alias("top_2gram_char_frac_x1000"),
        ((dup_frac > 300) | (top_frac > 200)).cast("int").alias("is_repetitive"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k salient terms per document — tf-idf with an EXACT ordering:
    rank by (tf DESC, document-frequency ASC, term ASC) after stopword
    removal. Lexicographic (tf, -df) ranking is order-equivalent to
    tf-idf with any strictly-decreasing idf within a fixed tf, and being
    integer-only it hashes identically across engines (a float idf would
    make the oracle comparison depend on ln() rounding).

    Scale shape: tf aggregates on (doc_id, term) — skew-free; df
    aggregates the tf table on term (vocabulary-sized output); the join
    back to per-doc terms is keyed on term, and AQE broadcast-converts it
    when the vocabulary fits (typical after stopword removal at any SF);
    the final top-k is one window on doc_id.
    """
    from pyspark.sql import Window as W

    words = _norm_words(F.col("text"))
    terms = docs.select(
        "doc_id",
        F.explode(
            F.filter(words, lambda x: (x != "") & ~x.isin(*STOPWORDS))
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # count(when(tf > 0, 1)) == count(1) (tf >= 1 by construction); the
    # consumed column keeps this branch from being rewritten into a
    # DISTINCT-style aggregate, so its (doc_id, term) exchange stays
    # canonically identical to the scoring branch's and AQE stage reuse
    # dedupes the explode pass (same root cause and fix as
    # rarity_score's — ReusedExchange verified in the executed plan).
    df_t = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, F.lit(1))).alias("doc_freq")
    )
    ranked = tf.join(df_t, "term").withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(
                F.col("tf").desc(), F.col("doc_freq"), F.col("term")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "doc_id", "term", "tf", "doc_freq", F.col("rank").cast("int").alias("rank")
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) corpus rollup: the reporting layer a curation
    pipeline ships with every run (doc counts, token/char totals, mean
    doc length). One partial-aggregating shuffle on a tiny key space;
    integer-only (mean x100, floored) for exact cross-engine hashing."""
    words = _norm_words(F.col("text"))
    per_doc = docs.select(
        "lang",
        "source",
        F.size(words).alias("n_toks"),
        F.length("text").alias("n_chars"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .withColumn(
            "mean_tokens_x100",
            F.floor(F.col("total_tokens") * 100 / F.col("n_docs")).cast("long"),
        )
    )


def boilerplate_stats(docs: DataFrame, n: int = 3, df_min: int = 2) -> DataFrame:
    """CCNet-style boilerplate measurement: the fraction of a document's
    distinct word ``n``-shingles that also occur in at least ``df_min``
    documents corpus-wide. High shared fraction = template/boilerplate
    text (navigation chrome, license headers) — the complement of the
    novelty signal dedup misses when no single pair crosses a Jaccard
    threshold.

    Scale shape: reuses the dedup shingle index — one groupBy(shingle)
    for document frequencies, one join back keyed on shingle, one
    groupBy(doc_id). No pair joins at all, so cost is linear in corpus
    shingle volume.
    """
    from .dedup import word_shingles

    sh = word_shingles(docs, n)
    df_t = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df_t, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") >= df_min).cast("int")).cast("long").alias("n_shared"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared_shingles"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.floor(F.coalesce("n_shared", F.lit(0)) * 1000 / F.col("n_shingles")),
            )
            .otherwise(0)
            .cast("long")
            .alias("shared_frac_x1000"),
        )
    )
    return out


def stratified_sample(docs: DataFrame, rate_x1000: int = 200, strata_col: str = "lang") -> DataFrame:
    """Deterministic per-stratum sampling: keep a document iff its md5
    hash bucket (mod 1000) falls under the stratum's rate. Hash-based
    (not rand()) so the sample is reproducible, join-stable, and exactly
    SQL-oracle-able; stratification keeps minority languages represented
    at the same rate as majority ones. Pure per-row Catalyst — no shuffle.
    """
    from .dedup import md5_long

    bucket = md5_long(F.concat(F.col(strata_col), F.lit(":"), F.col("doc_id").cast("string"))) % 1000
    return docs.select(
        "doc_id",
        F.col(strata_col).alias("stratum"),
        bucket.cast("int").alias("sample_bucket"),
        (bucket < rate_x1000).cast("int").alias("sampled"),
    )


def rarity_score(docs: DataFrame) -> DataFrame:
    """Corpus-statistical rarity signal — the exact-integer analog of
    CCNet's LM-perplexity quality bucketing: every token occurrence is
    weighted by inverse document frequency, so corpus-typical vocabulary
    scores low and rare vocabulary scores high (head/middle/tail
    bucketing then thresholds rarity_avg).

        weight(tok) = n_docs * 1000 DIV df(tok)      -- monotone in idf
        rarity_avg  = sum(cnt * weight) DIV n_tokens -- per document

    All integer arithmetic (DIV both engines), so the oracle is exact —
    no float log/perplexity drift across engines.

    100 TB shape: per-(doc,token) counts first (map-side combine kills
    within-doc repetition), document frequency = a second combine-heavy
    groupBy over those pairs, the one-row corpus total is broadcast, and
    the weight join probes with AT MOST df rows per token (never raw
    occurrences), with AQE skew-split for stopword-grade tokens. No
    Python, no window over a hot key.
    """
    words = _norm_words(F.col("text"))
    # doc_id is the documents table's primary key — never null. Filtering
    # nulls EXPLICITLY here (not just via the optimizer's inference) is
    # what lets both aggregate branches below share one subtree: the
    # final left join makes the optimizer push isnotnull(doc_id) into
    # the scoring branch only, which would otherwise de-canonicalize the
    # two (doc_id, tok) exchanges and defeat the stage reuse this
    # function is shaped for (see the NOTE below).
    toks = docs.select("doc_id", F.explode(words).alias("tok")).filter(
        (F.col("tok") != "") & F.col("doc_id").isNotNull()
    )
    # NOTE (r7): the document-frequency branch and the scoring join both
    # consume per_doc_tok. With a plain count(1) document frequency the
    # optimizer rewrites the df branch into a DISTINCT-style aggregate
    # (cnt pruned away), so the two (doc_id, tok) exchanges stop being
    # canonically equal and the explode+partial-agg pass runs TWICE.
    # Making df consume cnt — count(when(cnt > 0, 1)), value-identical
    # since cnt >= 1 by construction — keeps both subtrees identical and
    # AQE stage reuse dedupes them at runtime (plan-verified: the df
    # branch reads a ReusedExchange of the scoring branch's pair
    # exchange; plans/r07/rarity_after.txt). One full explode pass over
    # the corpus saved; interleaved A/B at 250k amplified docs: quiet
    # rounds 56-61 -> 41-47 CPU-s (~25%), wall min 3.49 -> 2.90 s.
    # Persisting per_doc_tok instead LOST in an interleaved A/B (walls
    # 4.7 vs 4.1 s, 69 vs 61 CPU-s at 100k docs): the in-memory
    # materialization costs more than the saved recompute and adds a
    # stage barrier where the branches otherwise overlap on idle cores.
    per_doc_tok = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    df_tab = per_doc_tok.groupBy("tok").agg(
        F.count(F.when(F.col("cnt") > 0, F.lit(1))).cast("long").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    weights = df_tab.crossJoin(F.broadcast(n_docs)).select(
        "tok", F.expr("n_docs * 1000 DIV df").cast("long").alias("w")
    )
    scored = (
        per_doc_tok.join(weights, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).cast("long").alias("rarity_sum"),
            F.sum("cnt").cast("long").alias("n_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("rarity_sum", F.lit(0)).cast("long").alias("rarity_sum"),
            F.coalesce(F.expr("rarity_sum DIV n_tokens"), F.lit(0))
            .cast("long")
            .alias("rarity_avg"),
        )
    )


def quantile_stats(
    docs: DataFrame, qs: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Exact discrete percentiles (percentile_disc semantics) of document
    length per language — the corpus monitoring rollup.  p_q = the value
    at rank ceil(q/100 * n) in (value, doc_id) order; selecting a fixed
    rank from the sorted multiset is integer-exact in any engine, unlike
    interpolating percentile_cont (float) or approx sketches.

    Shapes: one lang window for ranks riding the same exchange as the
    per-lang counts (count(*) OVER the same partition — no second
    shuffle, no join), then a map-side-combining groupBy picks the
    ranked values.  At 100 TB a per-key sort of the full corpus is the
    honest cost of EXACT percentiles; the approximate path would be a
    t-digest/approx_percentile (one pass, no sort) traded in the same
    place.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = (
        docs.select("doc_id", "lang", F.length("text").alias("n_chars"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(W.partitionBy("lang")))
    )
    aggs = [F.max("n_docs").cast("long").alias("n_docs")]
    for q in qs:
        # integer ceil — no double division anywhere (engine-portable)
        rank = F.expr(f"({q} * n_docs + 99) DIV 100")
        aggs.append(
            F.max(F.when(F.col("rn") == rank, F.col("n_chars")))
            .cast("long")
            .alias(f"p{q}_chars")
        )
    return ranked.groupBy("lang").agg(*aggs)
