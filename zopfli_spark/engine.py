"""Top-level engine API: encode_table / decode_table / verify_roundtrip.

The ``ZopfliCompress`` dispatch analog (reference src/zopfli/zopfli_lib.c:
50-82) — one call that plans partitions, runs the per-group encode search,
and returns the encoded-pages DataFrame plus per-partition metrics, all as a
single declarative Spark pipeline (one shuffle: the group-by; everything else
is narrow)."""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DEFAULT_CONFIG, EngineConfig
from .deploy import ensure_shipped
from .operators.pagecodec import decode_page, encode_page
from .pages import split_by_cost, split_simple
from .plans.planner import GROUP_COL, plan_groups

PAGES_SCHEMA = (
    "part_id int, page_id int, codec string, n_rows int, n_values long, "
    "first_doc_id string, last_doc_id string, raw_bytes long, enc_bytes long, "
    "checksum long, enc_us long, header binary, payload binary"
)

DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _encode_group(pdf: pd.DataFrame, config: EngineConfig) -> pd.DataFrame:
    """Encode one group → page rows. Pure function of group content (sorted
    by doc_id), so output is identical at any parallelism."""
    t0 = time.perf_counter()
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    part_id = int(pdf[GROUP_COL].iloc[0])
    doc_ids = pdf["doc_id"].to_numpy()
    sources = pdf["source"].to_numpy()
    toks = pdf["tokens"].to_numpy()
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    values = (
        np.concatenate([np.asarray(t, dtype=np.int32) for t in toks])
        if lens.sum()
        else np.empty(0, dtype=np.int32)
    )
    if config.split_mode == "cost" and len(lens) > 1:
        bounds = split_by_cost(
            values, lens, config.page_budget_values, config.max_pages_per_group
        )
    else:
        bounds = split_simple(lens, config.page_budget_values)
    row_bounds = np.concatenate(([0], bounds, [len(lens)])).astype(np.int64)
    row_bounds = np.unique(row_bounds)
    val_offsets = np.concatenate(([0], np.cumsum(lens)))
    rows = []
    for page_id in range(len(row_bounds) - 1):
        r0, r1 = int(row_bounds[page_id]), int(row_bounds[page_id + 1])
        v0, v1 = int(val_offsets[r0]), int(val_offsets[r1])
        pv = values[v0:v1]
        p0 = time.perf_counter()
        header, payload, codec, checksum = encode_page(
            doc_ids[r0:r1],
            sources[r0:r1],
            lens[r0:r1],
            pv,
            zlib_level=config.zlib_level,
            try_zlib=config.try_zlib,
        )
        enc_us = int((time.perf_counter() - p0) * 1e6)
        rows.append(
            (
                part_id,
                page_id,
                codec,
                r1 - r0,
                v1 - v0,
                str(doc_ids[r0]),
                str(doc_ids[r1 - 1]),
                4 * (v1 - v0),
                len(header) + len(payload),
                checksum,
                enc_us,
                header,
                payload,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "part_id",
            "page_id",
            "codec",
            "n_rows",
            "n_values",
            "first_doc_id",
            "last_doc_id",
            "raw_bytes",
            "enc_bytes",
            "checksum",
            "enc_us",
            "header",
            "payload",
        ],
    )


def encode_table(
    df: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Encode a tokens table → encoded-pages DataFrame (lazy).

    Input schema: doc_id string, tokens array<int>, n_tok int, source string.
    One wide exchange (the group-by); the per-group search runs inside a
    vectorized applyInPandas — Spark tasks play the role of the reference's
    block threads (src/zopfli/deflate.c:1414-1614) with in-order page ids
    instead of the in-order merge."""
    ensure_shipped(df.sparkSession)
    grouped, _ = plan_groups(df, config)
    return (
        grouped.groupBy(GROUP_COL)
        .applyInPandas(lambda pdf: _encode_group(pdf, config), schema=PAGES_SCHEMA)
    )


def decode_table(pages: DataFrame, config: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Decode encoded pages back to the original tokens table (lazy).

    Pages are independent → mapInPandas (narrow, no shuffle)."""
    ensure_shipped(pages.sparkSession)
    verify = config.verify_checksums

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_doc, out_tok, out_n, out_src = [], [], [], []
            for header, payload, checksum in zip(
                b["header"], b["payload"], b["checksum"]
            ):
                doc_ids, sources, lens, arrays = decode_page(
                    bytes(header), bytes(payload), int(checksum) if verify else None
                )
                out_doc.append(doc_ids)
                out_src.append(sources)
                out_n.append(lens)
                out_tok.extend(arrays)
            if not out_doc:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_doc),
                    "tokens": pd.Series(out_tok, dtype=object),
                    "n_tok": np.concatenate(out_n).astype(np.int32),
                    "source": np.concatenate(out_src),
                }
            )

    cols = ["header", "payload", "checksum"]
    return pages.select(*cols).mapInPandas(dec, schema=DECODED_SCHEMA)


def roundtrip_check(df: DataFrame, decoded: DataFrame) -> DataFrame:
    """Rows that fail bit-identical round-trip (empty DataFrame = pass).

    Equi-join on doc_id + element-wise array compare, all JVM-side
    (the ZopfliVerifyLenDist analog, reference src/zopfli/lz77.c:274-287)."""
    a = df.select(
        F.col("doc_id"),
        F.col("tokens").alias("tokens_in"),
        F.col("n_tok").alias("n_in"),
        F.col("source").alias("source_in"),
    )
    b = decoded.select(
        F.col("doc_id"),
        F.col("tokens").alias("tokens_out"),
        F.col("n_tok").alias("n_out"),
        F.col("source").alias("source_out"),
    )
    joined = a.join(b, "doc_id", "full_outer")
    bad = joined.filter(
        F.col("tokens_out").isNull()
        | F.col("tokens_in").isNull()
        | (F.col("n_in") != F.col("n_out"))
        | (F.col("source_in") != F.col("source_out"))
        | (
            F.coalesce(F.col("tokens_in"), F.array())
            != F.coalesce(F.col("tokens_out"), F.array())
        )
    )
    return bad


def metrics_table(pages: DataFrame, run_id: str = "run") -> DataFrame:
    """Per-partition codec-choice / ratio / throughput metrics (FIXTURES.md §4)
    — plain declarative aggregation over the pages output."""
    return (
        pages.groupBy("part_id", "codec")
        .agg(
            F.count("*").alias("pages"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("n_values").alias("n_values"),
            F.sum("enc_us").alias("enc_us"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("ratio", F.col("raw_bytes") / F.col("enc_bytes"))
        .withColumn(
            "tokens_per_sec",
            F.col("n_values") / (F.col("enc_us") / F.lit(1_000_000.0)),
        )
    )
