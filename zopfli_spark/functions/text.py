"""Text-analysis and deduplication operators for training-data pipelines.

All operators are declarative DataFrame transforms (JVM-side, codegen'd) —
no Python in the hot path. Where the reference repo is a compressor with no
text ops, these are the engine-adjacent operations a 100 TB tokenized-corpus
pipeline needs (driver mandate): exact dedup, n-gram Jaccard near-dup,
MinHash+LSH, SimHash, token counting, quality scoring.

Scale notes per operator are in the docstrings; the common discipline:
pre-bucket before any pairwise work so the candidate join is equi-join
shaped (shuffle on bucket key, broadcast nothing), and keep pair generation
conditioned on `id_a < id_b` to halve the join output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# shingling / exact dedup
# ---------------------------------------------------------------------------


def _shingle_expr(text_col: str, k: int) -> str:
    """SQL expression for distinct k-gram shingles (engine-portable form).

    Guarded: Spark's sequence(1, 0) yields [1, 0] (descending), so texts
    shorter than k must map to an empty array explicitly."""
    return (
        f"if(length({text_col}) >= {k}, "
        f"array_distinct(transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k}))), "
        f"cast(array() as array<string>))"
    )


def shingle_df(docs: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """doc_id + exploded distinct k-gram shingles (one row per shingle).

    At 100 TB this is the widest intermediate; it stays narrow (no shuffle)
    until the candidate join groups by shingle."""
    return docs.select(
        "doc_id", F.explode(F.expr(_shingle_expr(text_col, k))).alias("shingle")
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash (hash-groupBy; one shuffle on md5)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    threshold: float = 0.5,
    bucket_cols: tuple[str, ...] = (),
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    Plan shape (scale-critical): explode shingles → self equi-join ON the
    shingle (never a cross join) → count common shingles per pair → join two
    small per-doc size aggregates → Jaccard = common / (|A| + |B| - common).
    ``bucket_cols`` (e.g. lang) further restricts candidates. All shuffles
    are equi-key.

    ``max_shingle_df`` is the stop-shingle guard (web-dedup practice): a
    shingle appearing in more than this many documents is dropped from every
    shingle set (sizes AND intersections — Jaccard semantics stay coherent)
    before the self-join. Without it one viral shingle (a boilerplate
    header, a template line) produces a quadratic hot-reducer blowup: the
    self-join on that single key emits df² pairs into one task. The df
    groupBy shuffles on the same key as the candidate join, so the guard
    adds one co-partitioned aggregation, not a new shuffle shape."""
    sh = docs.select(
        F.col("doc_id"),
        *[F.col(c) for c in bucket_cols],
        F.explode(F.expr(_shingle_expr(text_col, k))).alias("shingle"),
    )
    if max_shingle_df is not None:
        # rows are distinct per (doc_id, shingle) — count(*) = doc frequency
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingle"),
        *[F.col(c).alias(f"_ba_{c}") for c in bucket_cols],
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingle"),
        *[F.col(c).alias(f"_bb_{c}") for c in bucket_cols],
    )
    cond = [a["shingle"] == b["shingle"], a["id_a"] < b["id_b"]]
    for c in bucket_cols:
        cond.append(F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    common = (
        a.join(b, cond)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (probabilistic near-dup at scale)
# ---------------------------------------------------------------------------


# portable-hash constants: md5-prefix base hash + affine permutations mod a
# Mersenne prime — every term computable bit-identically in ANSI SQL (the
# DuckDB oracle replays the full pipeline), unlike engine-native xxhash64
_MERSENNE31 = 2147483647  # 2^31 - 1
_PORTABLE_H0 = (
    "pmod(cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint), 2147483647)"
)


def _permute_coeffs(i: int) -> tuple[int, int]:
    """Deterministic affine-permutation coefficients for hash i (public
    universal-hashing construction h_i(x) = (a_i·x + b_i) mod p)."""
    a = (2654435761 * i + 1000003) % _MERSENNE31
    b = (40503 * i + 17) % _MERSENNE31
    return a, b


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    n_hashes: int = 32,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """MinHash signature per doc: min over shingles of hash_i(shingle) for
    each of ``n_hashes`` hash functions (Broder '97 resemblance sketch —
    public algorithm). One aggregation; no UDF.

    ``hash_mode='xxhash'`` (default) uses engine-native xxhash64(shingle, i).
    ``hash_mode='portable'`` uses affine permutations of an md5-prefix base
    hash mod 2^31-1 — bit-identical in ANSI SQL, so the driver's DuckDB
    oracle can replay the whole signature (correctness gate)."""
    sh = shingle_df(docs, text_col, k)
    if hash_mode == "portable":
        h0 = F.expr(_PORTABLE_H0)
        mins = []
        for i in range(n_hashes):
            a, b = _permute_coeffs(i)
            mins.append(
                F.min(
                    F.pmod(F.lit(a).cast("bigint") * h0 + F.lit(b), F.lit(_MERSENNE31))
                ).alias(f"h{i}")
            )
    else:
        mins = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    return sh.groupBy("doc_id").agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame, n_hashes: int = 32, bands: int = 8,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """Banded-LSH candidate pairs: hash each band of the signature to a
    bucket; docs sharing any band-bucket are candidates. Equi-join on
    (band, bucket) — the scale path that avoids all-pairs.

    ``hash_mode='portable'`` buckets with an md5 over the dash-joined band
    values (identical string + md5 semantics in DuckDB), so the oracle can
    reproduce candidate generation exactly."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for bnd in range(bands):
        idx = range(bnd * rows_per_band, (bnd + 1) * rows_per_band)
        cols = [F.col(f"h{i}") for i in idx]
        if hash_mode == "portable":
            joined = ", ".join(f"cast(h{i} as string)" for i in idx)
            bucket = F.expr(
                f"cast(conv(substring(md5(concat_ws('-', {joined})), 1, 15), 16, 10) as bigint)"
            )
        else:
            bucket = F.xxhash64(*cols)
        band_cols.append(
            F.struct(F.lit(bnd).alias("band"), bucket.alias("bucket"))
        )
    buckets = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, n_hashes: int = 32
) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of agreeing minhashes."""
    sa = signatures.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(n_hashes)]
    )
    sb = signatures.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(n_hashes)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(n_hashes)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (agree / F.lit(n_hashes)).alias("jaccard_est"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    docs: DataFrame, text_col: str = "text", k: int = 4, hash_mode: str = "xxhash"
) -> DataFrame:
    """SimHash (Charikar '02) over k-gram shingles, no UDF: per bit,
    majority vote of shingle-hash bits via sign of sum(±1).

    ``hash_mode='xxhash'`` → 64-bit simhash from xxhash64 (engine-native).
    ``hash_mode='portable'`` → 60-bit simhash from the md5-prefix hash
    (15 hex chars), replayable bit-identically in the DuckDB oracle."""
    if hash_mode == "portable":
        n_bits = 60
        h = F.expr("cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint)")
    else:
        n_bits = 64
        h = F.xxhash64("shingle")
    sh = shingle_df(docs, text_col, k).withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(n_bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — Hamming distance between two 64-bit hashes."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# token counting / quality / language features
# ---------------------------------------------------------------------------


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace/punctuation token statistics, exact-integer valued so they
    are oracle-checkable across engines."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), "[ ]+"))
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars2"),
        ws_tokens.alias("n_ws_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, "[.,!?;:]", ""))).alias("n_punct"),
        (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))).alias("n_digits"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))).alias("n_spaces"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring (length / punctuation / word-length bands),
    emitted as exact integer features + a derived score ×1000 (int)."""
    s = token_stats(docs, text_col)
    score = (
        F.lit(1000)
        - F.least(F.lit(400), F.col("n_punct") * F.lit(2000) / F.greatest(F.col("n_chars2"), F.lit(1)))
        - F.least(F.lit(300), F.col("n_digits") * F.lit(1500) / F.greatest(F.col("n_chars2"), F.lit(1)))
        - F.when(F.col("n_chars2") < 64, F.lit(300)).otherwise(F.lit(0))
    )
    return s.withColumn("quality_x1000", F.floor(score).cast("bigint"))


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — public algorithm): hash every k-gram, slide a window of ``window``
    hashes, keep each window's minimum; the distinct minima fingerprint the
    document (guaranteed to catch any match ≥ k + window - 1 chars).

    Fully declarative (sequence/transform/slice/array_min — whole-stage
    codegen; no UDF). The k-gram hash is an md5-prefix integer so it is
    bit-identical across engines (DuckDB oracle included)."""
    t = text_col
    hashes = (
        f"transform(sequence(1, greatest(length({t}) - {k - 1}, 0)), "
        f"i -> cast(conv(substring(md5(substring({t}, i, {k})), 1, 15), 16, 10) as bigint))"
    )
    # materialize the hash array first: Catalyst does not CSE higher-order
    # expressions, so inlining `hashes` into the window transform would
    # recompute every md5 once per window position (O(n²) hashing)
    with_hashes = docs.select("doc_id", F.expr(hashes).alias("_hs"))
    mins = (
        f"if(size(_hs) >= {window}, "
        f"transform(sequence(1, size(_hs) - {window - 1}), "
        f"i -> array_min(slice(_hs, i, {window}))), "
        f"cast(array() as array<bigint>))"
    )
    return with_hashes.select(
        "doc_id", F.explode(F.array_distinct(F.expr(mins))).alias("fingerprint")
    )


_LANG_MARKERS = {
    "en": (" the ", " and "),
    "de": (" der ", " und "),
    "fr": (" le ", " et "),
    "es": (" el ", " que "),
}


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic (exact-count features + argmax CASE),
    fully replicable in ANSI SQL for the oracle."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def count_marker(m: str) -> Column:
        return (F.length(t) - F.length(F.replace(t, F.lit(m), F.lit("")))) / F.lit(len(m))

    feats = docs.select(
        "doc_id",
        *[
            F.floor(count_marker(m1) + count_marker(m2)).cast("bigint").alias(f"n_{lang}")
            for lang, (m1, m2) in _LANG_MARKERS.items()
        ],
    )
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"n_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("unknown"))
    for l in langs:  # first-match tie-break, same order as the SQL oracle
        pred = pred.when(F.col(f"n_{l}") == best, F.lit(l))
    return feats.withColumn("pred_lang", pred)
