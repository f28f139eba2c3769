"""Tests for the training-data-pipeline operators: dedup (exact, n-gram
Jaccard, MinHash+LSH, SimHash) and similarity search (brute vs LSH recall)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from zopfli_spark.functions.similarity import brute_topk, lsh_topk
from zopfli_spark.functions.text import (
    exact_duplicates,
    hamming64,
    lsh_candidate_pairs,
    minhash_jaccard_estimate,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """60 docs: 20 templates × 3 variants (identical / 1-char edit / shuffled
    tail) — known near-dup structure."""
    rng = np.random.Generator(np.random.PCG64(7))
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa"]
    rows = []
    for t in range(20):
        base = " ".join(rng.choice(words, 40))
        rows.append((t * 3 + 0, base, "en"))
        rows.append((t * 3 + 1, base, "en"))  # exact duplicate
        mutated = base[: len(base) // 2] + " xq " + base[len(base) // 2 :]
        rows.append((t * 3 + 2, mutated, "en"))  # near duplicate
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


def test_exact_duplicates(spark, near_dup_docs):
    d = exact_duplicates(near_dup_docs).filter(F.col("dup_count") > 1)
    assert d.count() == 20  # each template's identical pair


def test_ngram_jaccard_finds_near_dups(spark, near_dup_docs):
    pairs = ngram_jaccard_pairs(near_dup_docs, k=8, threshold=0.6).toPandas()
    # every (3t, 3t+1) exact pair must appear with jaccard 1.0
    exact = pairs[(pairs.id_b - pairs.id_a == 1) & (pairs.id_a % 3 == 0)]
    assert len(exact) == 20
    assert (exact.jaccard == 1.0).all()
    # mutated variants still highly similar
    near = pairs[(pairs.id_b % 3 == 2) & (pairs.id_b - pairs.id_a <= 2)]
    assert len(near) >= 30  # 2 pairs per template, most survive 0.6


def test_minhash_lsh_recall(spark, near_dup_docs):
    sigs = minhash_signatures(near_dup_docs, k=8, n_hashes=32).cache()
    cands = lsh_candidate_pairs(sigs, n_hashes=32, bands=8)
    est = minhash_jaccard_estimate(sigs, cands, n_hashes=32).toPandas()
    truth = ngram_jaccard_pairs(near_dup_docs, k=8, threshold=0.8).toPandas()
    truth_pairs = set(zip(truth.id_a, truth.id_b))
    got_pairs = set(zip(est.id_a, est.id_b))
    recall = len(truth_pairs & got_pairs) / max(len(truth_pairs), 1)
    assert recall >= 0.9, f"LSH recall {recall} too low for jaccard≥0.8 pairs"
    # estimates correlate with truth on the exact pairs
    exact = est[(est.id_b - est.id_a == 1) & (est.id_a % 3 == 0)]
    assert (exact.jaccard_est == 1.0).all()


def test_simhash_near_dups_are_close(spark, near_dup_docs):
    sh = simhash64(near_dup_docs, k=4).cache()
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1).filter(F.col("id_a") % 3 == 0)
    dist = pairs.select(hamming64(F.col("ha"), F.col("hb")).alias("d")).toPandas()
    assert (dist.d == 0).all()  # identical docs → identical simhash
    rng_pairs = a.join(b, F.col("id_b") == F.col("id_a") + 3).filter(F.col("id_a") % 3 == 0)
    rng_dist = rng_pairs.select(hamming64(F.col("ha"), F.col("hb")).alias("d")).toPandas()
    assert rng_dist.d.mean() > dist.d.mean()  # unrelated docs farther apart


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


def test_lsh_topk_recall_vs_brute(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 30)
    exact = brute_topk(queries, embeddings, k=3).toPandas()
    approx = lsh_topk(queries, embeddings, k=3, dim=64).toPandas()
    exact_set = set(zip(exact.query_id, exact.neighbor_id))
    approx_set = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"LSH ANN recall {recall} too low"


def test_brute_topk_is_deterministic_and_ranked(spark, embeddings):
    r = brute_topk(embeddings.filter(F.col("vec_id") < 5), embeddings, k=3).toPandas()
    assert len(r) == 15
    for q in range(5):
        sub = r[r.query_id == q].sort_values("rank")
        assert list(sub["rank"]) == [1, 2, 3]
        assert list(sub.qdot) == sorted(sub.qdot, reverse=True)


def test_stop_shingle_cap_bounds_viral_pairs(spark):
    """A shingle present in EVERY doc (boilerplate header) must not create
    all-pairs candidates when max_shingle_df is set; docs that only share
    the viral shingle drop out entirely, while genuinely similar pairs
    (sharing non-viral shingles) survive with Jaccard computed over the
    capped shingle sets."""
    viral = "BOILERPLATE-HEADER "
    rows = [(i, viral + f"unique filler text number {i:04d} padding", "en") for i in range(40)]
    rows += [(100, viral + "shared tail shared tail shared tail", "en"),
             (101, viral + "shared tail shared tail shared tail", "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    capped = ngram_jaccard_pairs(docs, k=8, threshold=0.1, max_shingle_df=5).toPandas()
    # only the genuinely identical pair survives; no viral-only pairs
    assert set(zip(capped.id_a, capped.id_b)) == {(100, 101)}
    assert (capped.jaccard == 1.0).all()

    # without the cap, the viral shingles alone connect every doc pair
    uncapped = ngram_jaccard_pairs(docs, k=8, threshold=0.1).toPandas()
    assert len(uncapped) > 100


def test_portable_hash_modes_match_semantics(spark, near_dup_docs):
    """Portable (oracle-replayable) hash modes must preserve the sketch
    semantics: exact duplicates agree on the full minhash signature and
    simhash; LSH candidates still recall the exact-duplicate pairs."""
    sigs = minhash_signatures(near_dup_docs, k=8, n_hashes=32, hash_mode="portable").cache()
    cands = lsh_candidate_pairs(sigs, n_hashes=32, bands=8, hash_mode="portable")
    est = minhash_jaccard_estimate(sigs, cands, n_hashes=32).toPandas()
    exact = est[(est.id_b - est.id_a == 1) & (est.id_a % 3 == 0)]
    assert len(exact) == 20 and (exact.jaccard_est == 1.0).all()

    sh = simhash64(near_dup_docs, k=4, hash_mode="portable").toPandas()
    assert (sh.simhash < (1 << 60)).all() and sh.simhash.nunique() > 1
    by_id = dict(zip(sh.doc_id, sh.simhash))
    assert all(by_id[3 * t] == by_id[3 * t + 1] for t in range(20))


def test_lsh_topk_requires_dim(spark, embeddings):
    with pytest.raises(ValueError, match="dim"):
        lsh_topk(embeddings.limit(1), embeddings, k=3)


def test_lsh_topk_portable_planes_recall(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 10)
    exact = brute_topk(queries, embeddings, k=3).toPandas()
    approx = lsh_topk(queries, embeddings, k=3, dim=64, plane_mode="portable").toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    got = set(zip(approx.query_id, approx.neighbor_id))
    assert len(got & truth) / len(truth) >= 0.5


def test_lsh_near_dup_threshold_and_symmetry(spark):
    """Near-dup pairs: planted near-duplicates pass the integer-exact
    cosine threshold; orthogonal vectors never appear; ids are ordered."""
    import math

    from zopfli_spark.functions.similarity import lsh_near_dup

    dim = 16
    base = [1.0 if d < 8 else 0.0 for d in range(dim)]
    near = [1.0 if d < 7 else (0.3 if d == 7 else 0.0) for d in range(dim)]
    orth = [0.0 if d < 8 else 1.0 for d in range(dim)]
    rows = [(0, base), (1, near), (2, orth)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = lsh_near_dup(df, threshold_pct=90, dim=dim, plane_mode="portable").collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 1) in pairs  # cosine(base, near) ≈ 0.97
    assert all(2 not in p for p in pairs)  # orthogonal never passes
    assert all(a < b for a, b in pairs)
