"""Similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:

* :func:`brute_topk` — exact top-k by dot product / cosine. The pairwise join
  is a broadcast of the (small) query side against the corpus; correct
  baseline at any corpus size as long as the QUERY side is bounded.
* :func:`lsh_topk` — hyperplane-LSH (random-projection sign bits, Charikar
  '02) bucketing as the scale path: candidates = bucket collisions across a
  few rotations, exact re-rank only on candidates. Hamming-ball probing keeps
  recall; the pairwise work drops from O(N·Q) to O(collisions).

Quantized variants (``*_q``) operate on int32 ⌊x·1000⌉ vectors so results are
integer-exact and oracle-checkable across engines (no float-order issues).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def quantize(df: DataFrame, vec_col: str = "embedding", scale: int = 1000) -> DataFrame:
    """array<float> → array<int> of round(x·scale) — exact cross-engine math."""
    return df.withColumn(
        "qvec",
        F.transform(F.col(vec_col), lambda x: F.round(x * scale).cast("int")),
    )


def _qdot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by quantized dot product (broadcast the queries).

    Output: (query_id, rank, neighbor_id, qdot). Deterministic: ties broken
    by neighbor id ascending."""
    q = quantize(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qv")
    )
    c = quantize(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("qdot", _qdot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, broadcast as literals)."""
    rng = np.random.Generator(np.random.PCG64([seed, dim, n_planes]))
    return rng.standard_normal((n_planes, dim)).tolist()


def portable_planes(dim: int, n_planes: int, table: int) -> list[list[int]]:
    """Small-integer hyperplanes from a closed-form arithmetic formula —
    weight(t, i, d) = ((1315423911·t + 2654435761·i + 97·d) mod 7) − 3,
    values in [−3, 3]. Exactly replayable in ANSI SQL (the DuckDB oracle
    recomputes the identical buckets), and integer dot products over the
    quantized vectors avoid any float-order divergence across engines."""
    return [
        [((1315423911 * table + 2654435761 * i + 97 * d) % 7) - 3 for d in range(dim)]
        for i in range(n_planes)
    ]


def lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit bucket id per vector: bit i = [v·plane_i > 0]. JVM-side
    (zip_with + aggregate per plane); no UDF, no shuffle."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_buckets_q(
    df: DataFrame,
    planes: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-exact sign-bit buckets over the quantized vector (⌊x·1000⌉):
    bit i = [Σ_d qvec_d · w_id > 0], all bigint arithmetic — identical in
    any engine. JVM-side, no UDF, no shuffle."""
    q = quantize(df, vec_col)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(int(x)).cast("bigint") for x in p])
        dot = F.aggregate(
            F.zip_with(F.col("qvec"), lit_plane, lambda x, y: x.cast("bigint") * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return q.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    plane_mode: str = "normal",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH (L independent tables of
    b sign bits, Indyk-Motwani style) with one-bit multi-probe; candidates
    from bucket collisions (equi-join on (table, bucket)), exact quantized
    re-rank. At 100 TB the bucket join replaces the full cross product.

    ``dim`` is required (no driver-side data probe — a `.first()` here would
    add a blocking job per call). ``plane_mode='portable'`` swaps the
    gaussian hyperplanes for :func:`portable_planes` so the DuckDB oracle
    can replay bucketing bit-identically."""
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim (embedding dimensionality); pass it "
            "explicitly — inferring it would run a blocking driver-side job"
        )

    def buckets_for(df: DataFrame, out_id: str) -> DataFrame:
        parts = []
        for t in range(n_tables):
            if plane_mode == "portable":
                b = lsh_buckets_q(
                    df, portable_planes(dim, n_planes, t), id_col, vec_col
                )
            else:
                planes = hyperplanes(dim, n_planes, seed + 1000 * t)
                b = lsh_buckets(df, planes, id_col, vec_col)
            parts.append(
                b.select(
                    F.col(id_col).alias(out_id),
                    F.lit(t).alias("tbl"),
                    F.col("bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cbb = buckets_for(corpus, "neighbor_id")
    qb = buckets_for(queries, "query_id")
    # multi-probe: original bucket + one-bit flips
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(n_planes)],
    )
    qprobes = qb.select("query_id", "tbl", F.explode(probes).alias("bucket"))
    qv = quantize(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qv")
    )
    cv = quantize(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("cv"), F.lit(0).alias("_z")
    )
    cands = (
        qprobes.join(cbb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cands.join(qv, "query_id")
        .join(cv.drop("_z"), "neighbor_id")
        .withColumn("qdot", _qdot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot")
    )


def lsh_near_dup(
    df: DataFrame,
    threshold_pct: int = 90,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    plane_mode: str = "normal",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the dedup-by-similarity
    operator (brief: "embedding-cosine near-dup"): candidates from LSH
    bucket collisions (equi-join on (table, bucket) — the 100 TB shape; a
    cross product is never formed), then an integer-exact cosine threshold
    over the quantized vectors:

        cos(a, b) ≥ p/100  ⟺  qdot > 0  ∧  qdot² · den ≥ num · |a|²·|b|²

    with num/den = (p/100)² in lowest terms — pure bigint arithmetic (no
    float order-of-operations, no sqrt), so with ``plane_mode='portable'``
    the DuckDB oracle replays the ENTIRE query — buckets and threshold —
    bit-identically. Semantics are "near-dup within LSH recall", exactly
    like production LSH dedup pipelines (recall grows with n_tables).
    Overflow-safe for unit-norm embeddings quantized at 1000 (|q|² ≈ 1e6:
    both sides stay ≤ ~1e16 ≪ int64).
    """
    from math import gcd
    if dim is None:
        raise ValueError("lsh_near_dup requires dim (no driver-side probe)")

    parts = []
    for t in range(n_tables):
        if plane_mode == "portable":
            b = lsh_buckets_q(df, portable_planes(dim, n_planes, t), id_col, vec_col)
        else:
            b = lsh_buckets(df, hyperplanes(dim, n_planes, seed + 1000 * t), id_col, vec_col)
        parts.append(
            b.select(F.col(id_col).alias("vid"), F.lit(t).alias("tbl"), "bucket")
        )
    bk = parts[0]
    for p in parts[1:]:
        bk = bk.unionByName(p)
    a = bk.select(F.col("vid").alias("id_a"), "tbl", "bucket")
    b = bk.select(F.col("vid").alias("id_b"), "tbl", "bucket")
    cands = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    qv = quantize(df, vec_col).select(F.col(id_col).alias("vid"), F.col("qvec"))
    norms = qv.withColumn("n2", _qdot(F.col("qvec"), F.col("qvec")))
    va = norms.select(
        F.col("vid").alias("id_a"), F.col("qvec").alias("qa"), F.col("n2").alias("na")
    )
    vb = norms.select(
        F.col("vid").alias("id_b"), F.col("qvec").alias("qb"), F.col("n2").alias("nb")
    )
    num, den = int(threshold_pct) ** 2, 10_000
    g = gcd(num, den)
    num, den = num // g, den // g
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("qdot", _qdot(F.col("qa"), F.col("qb")))
        .filter(
            (F.col("qdot") > 0)
            & (
                F.col("qdot") * F.col("qdot") * F.lit(den).cast("bigint")
                >= F.lit(num).cast("bigint") * F.col("na") * F.col("nb")
            )
        )
        .select("id_a", "id_b", "qdot")
    )
