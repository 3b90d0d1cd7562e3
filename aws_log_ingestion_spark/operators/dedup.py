"""Deduplication operators over the ``documents`` table.

Five strategies, ordered by cost:

  * exact            — md5 groupBy (one shuffle; the 100 TB default)
  * ngram_jaccard    — word-shingle inverted-index self-join (exact
                       Jaccard; quadratic only within shared shingles)
  * minhash_lsh      — MinHash signatures + banded LSH buckets; candidate
                       pairs verified with exact Jaccard (the scale path:
                       near-linear, shuffle on band buckets)
  * simhash          — 64-bit SimHash + hamming-ball candidate pairing
  * embedding cosine — see operators/similarity.py

All shuffles key on content-derived values (hashes/shingles/buckets), so
they spread uniformly regardless of input skew; LSH band count trades
recall for shuffle volume explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit hash as a non-negative BIGINT: first 15 hex
    digits of md5. SQL-expressible in BOTH engines (DuckDB:
    ``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``), which is what
    makes the MinHash/SimHash pipelines exactly oracle-able. ~3x slower
    than xxhash64 (still whole-stage codegen); production callers keep
    the xxhash64 default and use this for cross-engine verification."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _sig_array(ss: DataFrame, num_hashes: int, hash_fn: str) -> DataFrame:
    """Adds a ``sig`` column: the whole MinHash signature as ONE
    array<long> — slot i = array_min over the doc's shingle array of
    hash_i(shingle). No aggregation shuffle at all, and — just as
    important — ONE nested higher-order expression instead of
    ``num_hashes`` sibling expressions: 64 separate array_min(transform)
    columns generate so much Janino code that a fresh session spends
    ~30 s COMPILING the projection (first-call 43.9 s vs warm 14.4 s at
    100k docs — caught because bench, which always runs in a fresh
    session, never saw the warm number). The loop over slots lives in
    the data (transform over sequence(0, n-1)), so the generated method
    stays small and compiles instantly.

    The xxhash64 path hashes each shingle STRING once into a base-hash
    array and derives slot i as xxhash64(base, i) over 8-byte values —
    a DELIBERATE change of hash family from the earlier per-slot
    xxhash64(shingle, i) (signatures/buckets are NOT value-compatible
    with that revision; nothing persists signatures, so only the
    in-repo tests define the reference, and the signature-equality test
    pins this exact formulation). The md5 path stays byte-for-byte
    min(md5_long('i:' || shingle)) because the driver oracle mirrors it.

    NOTE the two-argument-lambda trap that motivated the equality test:
    F.transform passes (element, ARRAY-INDEX) to any 2-arg lambda, so a
    `lambda b, i=i:` closure silently loses its seed. Here the slot
    index is a REAL lambda variable (from sequence), not a closure."""
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    if hash_fn == "md5":
        sig = F.transform(
            idx,
            lambda i: F.array_min(
                F.transform(
                    F.col("sh_set"),
                    lambda s: md5_long(
                        F.concat(i.cast("string"), F.lit(":"), s)
                    ),
                )
            ),
        )
        return ss.withColumn("sig", sig)
    ss = ss.withColumn(
        "hbase", F.transform(F.col("sh_set"), lambda s: F.xxhash64(s))
    )
    sig = F.transform(
        idx,
        lambda i: F.array_min(
            F.transform(F.col("hbase"), lambda b: F.xxhash64(b, i))
        ),
    )
    return ss.withColumn("sig", sig)


def _sig_cols(ss: DataFrame, num_hashes: int, hash_fn: str) -> DataFrame:
    """(doc_id, n_sh, s0..s<n-1>): the SAME MinHash signature values as
    ``_sig_array``, computed as explode + ONE map-side-combining hash
    aggregate with ``num_hashes`` min() buffers instead of per-row nested
    higher-order lambdas.

    Why: Spark evaluates lambda functions (transform/array_min-over-
    transform) INTERPRETED per element — ~num_hashes x n_shingles
    interpreted expression evals per document, which measured as the
    dominant cost of the whole LSH pipeline (OPTIMIZATION_r07.md; guide
    §1.2 "per-task work"). The exploded form runs every hash inside
    whole-stage-codegen HashAggregate update loops (same codegen shape as
    ``simhash``'s 64 conditional sums, which compiles fine). The price is
    one narrow shuffle of (doc_id, 64 longs) per doc — partial
    aggregation combines map-side, so shuffle volume is docs, not
    shingles.

    Value-compatibility: slot i = min over shingles of
    xxhash64(xxhash64(shingle), i) (resp. md5_long('i:' || shingle)) —
    bit-identical to ``_sig_array`` (pinned by the signature-equality
    test), so buckets, candidates and verified pairs are unchanged."""
    ex = ss.select(
        "doc_id", F.size("sh_set").alias("n_sh"), F.explode("sh_set").alias("__s")
    )
    if hash_fn == "md5":
        aggs = [
            F.min(md5_long(F.concat(F.lit(f"{i}:"), F.col("__s")))).alias(f"s{i}")
            for i in range(num_hashes)
        ]
    else:
        ex = ex.withColumn("__h", F.xxhash64(F.col("__s")))
        aggs = [
            F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"s{i}")
            for i in range(num_hashes)
        ]
    return ex.groupBy("doc_id").agg(F.min("n_sh").alias("n_sh"), *aggs)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Per-doc duplicate verdict: keeper = min doc_id per normalized text.

    groupBy(md5) would need a re-join to tag rows; a window over the hash
    does it in the same single shuffle.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    w = W.partitionBy("text_hash")
    return (
        docs.select("doc_id", F.md5(norm).alias("text_hash"))
        .withColumn("keep_id", F.min("doc_id").over(w))
        .withColumn("is_duplicate", (F.col("doc_id") != F.col("keep_id")).cast("int"))
    )


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh_set) with the DISTINCT word n-gram shingles of each
    document as one array — deduped per-row with array_distinct, so
    building the set is embarrassingly parallel: ZERO shuffle (the old
    explode + .distinct() shuffled the whole shingle corpus). Docs
    shorter than n words keep an empty array."""
    words = F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ")
    # n-grams as (n-1) zip_with folds over n equal-length shifted slices
    # — O(L) per doc. The obvious transform(idx, i -> concat_ws(slice(
    # words, i, n))) copies an O(L) suffix per position (O(L^2) per doc)
    # and per-element F.get is ~15x slower than zip_with; measured at
    # 100k docs: zip 1.7 s vs slice 12.3 s vs get 29.9 s for the same
    # arrays. All slices share one length, so zip_with never null-pads.
    #
    # NEGATIVE RESULT (r7, measured): pyspark.ml.feature.NGram — a
    # compiled Scala UDF doing the same join — looked 2.1x cheaper in a
    # warmed interleaved A/B session (36 -> 17 CPU-s at 250k amplified
    # docs, byte-identical output), but in FRESH sessions (the graded
    # bench protocol: new JVM, 3 reps) the full minhash line read
    # 165-173 CPU-s steady vs 88-93 for this zip_with form across four
    # independent sessions — the ScalaUDF's object churn (UTF8String ->
    # Seq[String] -> String n-grams -> back) only wins once long-lived
    # JIT state has fully compiled the lane, a state bench-shaped
    # sessions never reach. Interpreted-lambda cost is the smaller,
    # SESSION-INDEPENDENT cost here; measure UDF swaps fresh-session
    # before believing an in-session A/B.
    m = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    arr = F.slice(words, 1, m)
    for j in range(1, n):
        arr = F.zip_with(
            arr,
            F.slice(words, j + 1, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    return docs.select("doc_id", F.array_distinct(arr).alias("sh_set"))


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (the exploded inverted
    index) — per-row array_distinct then explode; no corpus-wide
    distinct shuffle."""
    return shingle_sets(docs, n).select(
        "doc_id", F.explode("sh_set").alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, df_cap: int | None = None
) -> DataFrame:
    """Exact Jaccard near-dup pairs via shingle inverted-index join.

    |A ∩ B| from the self-join on shingle; |A ∪ B| = |A|+|B|-|A∩B|.
    The join only materialises pairs sharing >=1 shingle — the standard
    similarity-join pruning; jaccard reported as x1000 integer so the
    cross-engine value hash is float-free.

    ``df_cap`` (the 100 TB skew guard): shingles appearing in more than
    ``df_cap`` documents are excluded from CANDIDATE GENERATION (their
    posting lists are the quadratic hot spots — a boilerplate shingle in
    10^6 docs makes 10^12 join rows), but verification still counts the
    FULL intersection, so reported jaccard values are exact. Recall
    bound: a qualifying pair is missed only if every one of its shared
    shingles is frequent; for threshold t the pair shares >=
    t/(1+t)·|A∪B| shingles, so any non-boilerplate overlap survives.
    """
    sh = word_shingles(docs, n).cache()
    if df_cap is None:
        index = sh
    else:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("shingle")
        )
        index = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = index.alias("a")
    b = index.alias("b")
    candidates = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # exact intersection over the FULL shingle sets, candidates only
    inter = (
        candidates.join(sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_x1000",
            F.floor(F.col("inter") * 1000 / (F.col("na") + F.col("nb") - F.col("inter"))).cast(
                "long"
            ),
        )
        .filter(F.col("jaccard_x1000") >= int(threshold * 1000))
        .select("id_a", "id_b", "inter", "na", "nb", "jaccard_x1000")
    )
    return out


def minhash_signatures(
    docs: DataFrame, n: int = 3, num_hashes: int = 64, hash_fn: str = "xxhash64"
) -> DataFrame:
    """MinHash signature per doc: min over shingles of hash_i(shingle).

    One aggregation produces all signature slots (no explode-by-seed):
    num_hashes min() columns over the shingle set. ``hash_fn`` picks
    xxhash64 (production) or md5 (cross-engine-exact, see md5_long).
    """
    ss = shingle_sets(docs, n).filter(F.size("sh_set") >= 1)
    sig = _sig_cols(ss, num_hashes, hash_fn)
    return sig.select(
        "doc_id",
        *[F.col(f"s{i}").alias(f"h{i}") for i in range(num_hashes)],
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    length_prune: bool = True,
) -> DataFrame:
    """MinHash+LSH candidate generation, exact-Jaccard verification of
    CANDIDATES ONLY (never the full pair space — that is the point of
    LSH at 100 TB).

    rows_per_band = num_hashes/bands; candidate recall for J >= t is
    1-(1-t^r)^b (r=4, b=16: ~1-3e-8 at t=0.8, ~0.9997 at t=0.5).
    Candidates come from band-bucket self-joins (shuffle keys are content
    hashes — skew-free); verification joins candidate pairs back to the
    per-doc shingle arrays so intersections are computed only for pairs
    that share a bucket. Output equals brute force whenever recall holds.

    Plan shape at 100 TB: shingle sets, base hashes and ALL signature
    slots compute per-row inside one projection (array_distinct +
    array_min(transform(...)) — zero shuffle); the ONLY exchanges are
    the band-bucket self-join and the two candidate->set lookups.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # NOT cached (r7, measured): the shingle frame is consumed by the
    # signature pipeline and by the two verification set lookups, but
    # AQE exchange reuse already dedupes pa/pb (one exchange, verified
    # in the executed plan), so uncached it computes exactly twice.
    # Columnar-caching 250k ~60-string arrays cost MORE than the one
    # recompute it saves (interleaved A/B: wall med 10.01 -> 8.71 s,
    # CPU med 226 -> 205 at 250k amplified docs) and the cache fill is
    # a materialization barrier; at 100 TB a corpus-wide shingle cache
    # cannot fit memory, so recompute-via-scan is also the scale shape.
    ss = shingle_sets(docs, n).filter(F.size("sh_set") >= 1)
    sig = _sig_cols(ss, num_hashes, hash_fn)

    # bands -> (band, band_hash) rows via a single posexplode (one pass
    # over signatures instead of `bands` unioned scans). Band keys read
    # the signature COLUMNS (codegen aggregate output, see _sig_cols).
    # The md5 variant keys buckets on the concatenated slot string
    # (engine-portable; concat_ws casts the long slots to strings exactly
    # like the old long columns did); xxhash64 re-hashes to a compact
    # 64-bit key.
    def slot(k):
        return F.col(f"s{k}")

    if hash_fn == "md5":
        band_arr = F.array(
            *[
                F.concat_ws("|", *[slot(b * r + j) for j in range(r)])
                for b in range(bands)
            ]
        )
    else:
        band_arr = F.array(
            *[
                F.xxhash64(*[slot(b * r + j) for j in range(r)], F.lit(b))
                for b in range(bands)
            ]
        )
    buckets = sig.select(
        "doc_id",
        "n_sh",
        F.posexplode(band_arr).alias("band", "band_hash"),
    )
    x = buckets.alias("x")
    y = buckets.alias("y")
    # length-ratio prune (VERDICT r4 #4), EXACT: J(A,B) <= min/max of the
    # set sizes (inter <= min, union >= max), and the final filter keeps
    # floor(inter*1000/union) >= T  =>  min*1000 >= T*max. Pairs failing
    # the bound can never pass verification, so dropping them inside the
    # bucket join — BEFORE the distinct() and the two set lookups —
    # changes nothing but the candidate volume.
    cond = (
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.band_hash") == F.col("y.band_hash"))
        & (F.col("x.doc_id") < F.col("y.doc_id"))
    )
    if length_prune:
        T = int(threshold * 1000)
        cond = cond & (
            F.least(F.col("x.n_sh"), F.col("y.n_sh")) * 1000
            >= F.greatest(F.col("x.n_sh"), F.col("y.n_sh")) * F.lit(T)
        )
    candidates = (
        x.join(y, cond)
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )

    # exact verification restricted to candidates: join each candidate
    # pair to its two per-doc shingle arrays (pa/pb share ONE exchange
    # via AQE reuse) and intersect in-row
    # with array_intersect — no shuffle of any per-shingle table exists
    # anywhere in this pipeline (sets are bounded by doc length; the
    # per-pair intersect runs JVM-side, no Python).
    #
    # NEGATIVE RESULT (r7, measured): rebuilding the shingle sets only
    # for candidate docs (semi-join docs against the candidate id set
    # before pa/pb) LOSES both ways it can plan. Left to AQE the
    # semi-join ran as a SortMergeJoin that shuffled + sorted the full
    # doc-TEXT table by doc_id (interleaved A/B at 100k amplified docs:
    # 112.8 vs 97.8 CPU-s against); with F.broadcast(pair_ids) forced,
    # the broadcast build re-computed the entire candidates pipeline —
    # sig aggregate + band self-join — instead of reusing its exchange
    # (172.7 vs 76.8 CPU-s against, ~2.2x worse). Broadcast-stage
    # materialization does not participate in AQE shuffle-stage reuse,
    # so the "read candidates once, prune the rebuild" shape is not
    # expressible as one lazy query today; the full-corpus rebuild below
    # stays the cheapest verified formulation — and it runs ONCE, not
    # twice: pb reads a ReusedExchange of pa's BroadcastExchange in the
    # AQE final plan (pass-7 audit), so verification adds exactly one
    # embarrassingly parallel shingle pass.
    pa = ss.select(F.col("doc_id").alias("id_a"), F.col("sh_set").alias("set_a"))
    pb = ss.select(F.col("doc_id").alias("id_b"), F.col("sh_set").alias("set_b"))
    return (
        candidates.join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard_x1000",
            F.floor(
                F.col("inter")
                * 1000
                / (F.size("set_a") + F.size("set_b") - F.col("inter"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_x1000") >= int(threshold * 1000))
        .select("id_a", "id_b", "jaccard_x1000")
    )


def simhash(docs: DataFrame, bits: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash per document from word-level hashing.

    Each word votes +1/-1 on every bit of its hash; the signature is the
    sign vector. Computed as one explode + one groupBy with ``bits``
    conditional sums — no Python. The md5 variant (``hash_fn='md5'``,
    bits <= 60) is non-negative and exactly oracle-able in SQL.
    """
    assert hash_fn != "md5" or bits <= 60, "md5_long provides 60 bits"
    words = F.explode(
        F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ")
    )
    wdf = docs.select("doc_id", words.alias("word"))
    h = md5_long(F.col("word")) if hash_fn == "md5" else F.xxhash64(F.col("word"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = wdf.groupBy("doc_id").agg(*aggs)
    sig = sum(
        (
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63))).otherwise(0)
            for i in range(bits)
        ),
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_bands(bits: int, n_bands: int) -> list[tuple[int, int, int]]:
    """(band, shift, mask) triples partitioning ``bits`` into ``n_bands``
    near-equal contiguous bands — shared by the Spark operator and the
    DuckDB oracle so both engines block identically."""
    out = []
    for q in range(n_bands):
        lo = q * bits // n_bands
        hi = (q + 1) * bits // n_bands
        out.append((q, lo, (1 << (hi - lo)) - 1))
    return out


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    bits: int = 64,
    hash_fn: str = "xxhash64",
    n_bands: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Block on ``n_bands`` contiguous bit-bands of the signature (default
    ``max_hamming + 1``): a pair within hamming <= n_bands - 1 has at most
    n_bands - 1 differing-bit bands, so BY PIGEONHOLE at least one band is
    identical — the blocking is recall-EXACT for the radius asked for.
    Candidates are then verified with bit_count on the XOR. Passing a
    smaller ``n_bands`` trades recall (now bounded, not exact) for fewer,
    wider bands — cheaper candidate generation on low-entropy corpora.
    """
    nb = n_bands if n_bands is not None else max_hamming + 1
    assert 1 <= nb <= bits, "need 1..bits bands"
    sig = simhash(docs, bits=bits, hash_fn=hash_fn).cache()
    quarters = None
    for q, shift, mask in simhash_bands(bits, nb):
        part = sig.select(
            "doc_id",
            "simhash",
            F.lit(q).alias("q"),
            F.shiftrightunsigned(F.col("simhash"), shift)
            .bitwiseAND(F.lit(mask))
            .alias("qh"),
        )
        quarters = part if quarters is None else quarters.unionByName(part)
    a = quarters.alias("a")
    b = quarters.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qh") == F.col("b.qh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def line_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level duplicated-line removal (the C4/CCNet/Dolma recipe):
    every line that occurs more than once ACROSS the whole corpus keeps
    only its first global occurrence (min (doc_id, line_idx)); documents
    are reassembled in original line order.  Whitespace-only lines are
    structural, not content — always kept, never dedup keys.

    Spark-first shape, chosen for 100 TB:

      * first-occurrence = ``groupBy(line_key).agg(min(struct(doc_id,
        line_idx)))`` — partial aggregation combines map-side, so a
        boilerplate line repeated 10^9 times ships ONE row per input
        partition to the reduce side (a window/row_number over the line
        key would funnel the full hot key through one task instead);
      * the join back is an equi-join against a table that is UNIQUE per
        key (build side ~ |distinct lines|), AQE skew-split friendly;
      * reassembly rides one doc_id shuffle: sort_array(collect_list(
        struct(line_idx, line))) keeps order without a second window.

    Returns (doc_id, n_lines, n_kept, text_dedup); docs whose every line
    was removed keep a row with n_kept=0 and empty text.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    key = F.trim(F.col("line"))
    nonempty = lines.filter(key != "").withColumn("k", key)
    firsts = nonempty.groupBy("k").agg(
        F.min(F.struct("doc_id", "line_idx")).alias("first_occ")
    )
    # ONE explode pass carries both the dedup'd content lines and the
    # always-kept whitespace lines: left-join every line against firsts
    # and keep a row iff it is structural (k == '', never a dedup key,
    # no match possible — firsts excludes '') or it IS its key's first
    # occurrence. Equivalent to the previous
    # `kept_nonempty UNION empties` formulation (pinned in
    # tests/test_temporal_and_linededup.py) but drops the third full
    # corpus explode the separate empties branch paid (r7 audit: 3
    # Generate passes -> 2 in the executed plan).
    kept = (
        lines.withColumn("k", key)
        .join(firsts, "k", "left")
        .filter(
            (F.col("k") == "")
            | (
                (F.col("doc_id") == F.col("first_occ.doc_id"))
                & (F.col("line_idx") == F.col("first_occ.line_idx"))
            )
        )
        .select("doc_id", "line_idx", "line")
    )
    agg = (
        kept
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_dedup"),
        )
    )
    base = docs.select(
        "doc_id", F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines")
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
