"""End-to-end Spark round-trip tests (FIXTURES.md §6 invariants 1-4)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from zopfli_spark import EngineConfig, decode_table, encode_table, metrics_table, roundtrip_check
from zopfli_spark.datagen import synth_tokens_df

CFG = EngineConfig(
    page_budget_values=20_000,
    group_budget_values=80_000,
    giant_doc_values=40_000,
    max_pages_per_group=16,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    return synth_tokens_df(spark, n_docs=800, seed=42).cache()


@pytest.fixture(scope="module")
def pages(spark, tokens_df):
    return encode_table(tokens_df, CFG).cache()


def test_roundtrip_bit_identical(spark, tokens_df, pages):
    decoded = decode_table(pages, CFG)
    bad = roundtrip_check(tokens_df, decoded)
    assert bad.count() == 0, bad.limit(5).toPandas().to_string()


def test_row_counts_preserved(spark, tokens_df, pages):
    assert decode_table(pages, CFG).count() == tokens_df.count()
    n_rows = pages.agg(F.sum("n_rows")).collect()[0][0]
    assert n_rows == tokens_df.count()


def test_size_invariants(spark, pages):
    # stored-block guarantee at page granularity: payload ≤ raw + tag byte;
    # header is metadata the raw form also needs (doc ids / lens)
    p = pages.select("raw_bytes", "enc_bytes", "n_values", "n_rows").toPandas()
    assert (p["raw_bytes"] == 4 * p["n_values"]).all()
    # engine-level: total encoded (incl headers) must beat total raw
    assert p["enc_bytes"].sum() < p["raw_bytes"].sum()


def test_compression_is_meaningful(spark, pages):
    p = pages.agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")).collect()[0]
    ratio = p["r"] / p["e"]
    assert ratio > 1.5, f"overall ratio {ratio:.2f} too weak for the synthetic mixture"


def test_checksum_detects_corruption(spark, pages):
    from zopfli_spark.operators.pagecodec import decode_page

    row = pages.filter(F.col("n_values") > 10).first()
    header, payload = bytes(row["header"]), bytes(row["payload"])
    decode_page(header, payload, row["checksum"])  # clean passes
    # corrupt a MIDDLE byte: the final byte of a bitpacked blob may hold
    # only padding bits, which are non-semantic (decode reads exactly
    # n*width bits) and hence legitimately outside the content checksum
    corrupt = bytearray(payload)
    corrupt[len(corrupt) // 2] ^= 0xFF
    with pytest.raises((ValueError, Exception)):
        decode_page(header, bytes(corrupt), row["checksum"])


def test_checksum_detects_header_corruption(spark, pages):
    """The v2 checksum covers header content (doc_ids/sources/lens), so a
    flipped header byte must fail loudly, never decode to wrong metadata
    (VERDICT r1 bug #2)."""
    from zopfli_spark.operators.pagecodec import decode_page

    row = pages.filter(F.col("n_rows") > 3).first()
    header, payload = bytes(row["header"]), bytes(row["payload"])
    decode_page(header, payload, row["checksum"])  # clean passes
    # tamper inside the docid/source blob region (past the fixed prefix)
    for pos in (len(header) - 1, len(header) // 2, 12):
        corrupt = bytearray(header)
        corrupt[pos] ^= 0xFF
        with pytest.raises(Exception):
            decode_page(bytes(corrupt), payload, row["checksum"])


def test_metrics_shape(spark, pages):
    m = metrics_table(pages, "t").toPandas()
    assert {"part_id", "codec", "pages", "ratio", "tokens_per_sec", "run_id"} <= set(m.columns)
    assert (m["ratio"] > 0).all()


def test_determinism_across_parallelism(spark, tokens_df):
    """Byte-identical output regardless of input partitioning (FIXTURES §6.4)."""
    a = encode_table(tokens_df.repartition(2), CFG)
    b = encode_table(tokens_df.repartition(13), CFG)
    pa = a.orderBy("part_id", "page_id").select("part_id", "page_id", "checksum", "enc_bytes", "codec").toPandas()
    pb = b.orderBy("part_id", "page_id").select("part_id", "page_id", "checksum", "enc_bytes", "codec").toPandas()
    assert pa.equals(pb)
    ha = a.agg(F.sum(F.crc32(F.col("payload"))).alias("h"), F.sum(F.crc32(F.col("header"))).alias("hh")).collect()[0]
    hb = b.agg(F.sum(F.crc32(F.col("payload"))).alias("h"), F.sum(F.crc32(F.col("header"))).alias("hh")).collect()[0]
    assert ha == hb


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id string, tokens array<int>, n_tok int, source string")
    assert encode_table(empty, CFG).count() == 0


def test_nul_bearing_doc_ids_roundtrip(spark):
    """Regression for VERDICT r1 bug #1: doc_ids differing only in trailing
    NULs must survive encode→decode distinct (the S_DICT header codec used
    to collapse them via numpy's fixed-width 'U' dtype)."""
    rows = [
        (f"doc_{i:03d}" + "\x00" * (i % 3), [i, i + 1, i + 2] * 10, 30, "web\x00")
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    pages = encode_table(df, CFG)
    decoded = decode_table(pages, CFG)
    assert decoded.count() == 120
    assert decoded.select("doc_id").distinct().count() == 120
    bad = roundtrip_check(df, decoded)
    assert bad.count() == 0, bad.limit(5).toPandas().to_string()


def test_giant_doc_routed_to_longtail_keyspace_and_roundtrips(spark):
    """Skew handling: a doc with n_tok >= giant_doc_values must land in the
    long-tail group keyspace (part_id >= num_groups) so it never inflates a
    regular group, and still decode bit-identically."""
    import numpy as np

    from zopfli_spark import EngineConfig, decode_table, encode_table
    from zopfli_spark.plans.planner import plan_groups

    cfg = EngineConfig(
        page_budget_values=20_000,
        group_budget_values=40_000,
        giant_doc_values=50_000,
    )
    rng = np.random.default_rng(0)
    rows = [("giant_000", [int(x) for x in rng.integers(0, 1 << 16, 120_000)], 120_000, "g")]
    rows += [
        (f"small_{i:03d}", [int(x) for x in rng.integers(0, 1 << 16, 500)], 500, "s")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    _, num_groups = plan_groups(df, cfg)
    pages = encode_table(df, cfg).cache()
    giant_parts = {
        r["part_id"]
        for r in pages.filter(F.col("first_doc_id") <= "giant_000")
        .filter(F.col("last_doc_id") >= "giant_000")
        .collect()
    }
    assert giant_parts and all(p >= num_groups for p in giant_parts), (
        f"giant doc must use the long-tail keyspace (>= {num_groups}), got {giant_parts}"
    )
    dec = decode_table(pages, cfg)
    a = df.select("doc_id", F.col("tokens").cast("string").alias("t"))
    b = dec.select("doc_id", F.col("tokens").cast("string").alias("t"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _signature_keys_loop_reference(values: np.ndarray, val_offsets: np.ndarray) -> np.ndarray:
    """The pre-r6 per-doc Python loop, kept verbatim as the oracle for the
    vectorized ``_doc_signature_keys`` (VERDICT r5 wrong #5): the clustered
    doc order feeds content hashes and page geometry, so the rewrite must be
    bit-for-bit identical, not approximately equal."""
    n_docs = len(val_offsets) - 1
    keys = np.zeros(n_docs, dtype=np.int64)
    for i in range(n_docs):
        a, b = int(val_offsets[i]), int(val_offsets[i + 1])
        n = b - a
        if n == 0:
            continue
        d = values[a:b].astype(np.int64)
        rng_b = int(max(int(d.max()) - int(d.min()), 0)).bit_length()
        if n > 1:
            diffs = np.diff(d)
            runs = 1 + int(np.count_nonzero(diffs))
            mad_b = int(float(np.abs(diffs).mean()) + 1).bit_length()
        else:
            runs, mad_b = 1, 0
        run_b = int(8 * runs / n)
        samp = d[:: max(1, n // 256)]
        dist_b = int(8 * len(np.unique(samp)) / len(samp))
        keys[i] = (rng_b << 24) | (run_b << 16) | (dist_b << 8) | mad_b
    return keys


def test_doc_signature_keys_vectorized_matches_loop():
    from zopfli_spark.engine import _doc_signature_keys

    rng = np.random.default_rng(12345)
    docs: list[np.ndarray] = []
    # every content shape the signature buckets discriminate on, plus the
    # edge cases the vectorization must not regress: empty docs, singleton
    # docs, constant runs, negative values, huge ranges, >256-value docs
    # (sampling stride kicks in), exact-256 and 257 boundary lengths
    docs += [np.array([], dtype=np.int64)] * 3
    docs += [np.array([7], dtype=np.int64), np.array([-5], dtype=np.int64)]
    docs += [np.full(rng.integers(2, 900), int(c), dtype=np.int64) for c in (0, -3, 1 << 40)]
    docs += [rng.integers(-50, 50, rng.integers(2, 1500)).astype(np.int64) for _ in range(40)]
    docs += [np.minimum(rng.zipf(1.3, rng.integers(10, 3000)), 1 << 30).astype(np.int64) for _ in range(40)]
    docs += [np.cumsum(rng.integers(0, 9, rng.integers(2, 2000))).astype(np.int64) for _ in range(20)]
    docs += [rng.integers(0, 1 << 62, rng.integers(2, 600)).astype(np.int64) for _ in range(10)]
    docs += [np.arange(n, dtype=np.int64) for n in (255, 256, 257, 512, 513)]
    rng.shuffle(docs)
    values = np.concatenate([d for d in docs if len(d)])
    offsets = np.concatenate(([0], np.cumsum([len(d) for d in docs])))
    got = _doc_signature_keys(values, offsets)
    want = _signature_keys_loop_reference(values, offsets)
    assert np.array_equal(got, want), (
        f"first mismatch at doc {int(np.nonzero(got != want)[0][0])}"
    )
