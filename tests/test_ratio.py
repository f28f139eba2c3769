"""Compression-ratio gate vs the reference encoder family (FIXTURES.md §6.6).

The reference emits RFC-1951 DEFLATE; zlib level 9 over the serialized token
stream is the same-format stand-in for "the reference encoder's output" on
this data (Zopfli would be a few percent smaller than zlib-9 but orders of
magnitude slower). The engine's total encoded size — payloads AND headers,
including the doc_id/source metadata a fair comparison must carry — must be
smaller."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from zopfli_spark import EngineConfig, encode_table
from zopfli_spark.datagen import synth_tokens_df

CFG = EngineConfig(
    page_budget_values=1 << 18,
    group_budget_values=1 << 19,
    giant_doc_values=1 << 18,
)


def test_total_size_beats_deflate9(spark):
    df = synth_tokens_df(spark, 2000, seed=42).cache()
    enc = encode_table(df, CFG).agg(
        F.sum("enc_bytes").alias("e"), F.sum("raw_bytes").alias("r")
    ).collect()[0]
    rows = df.select("tokens").toPandas()["tokens"]
    stream = b"".join(np.asarray(t, dtype="<i4").tobytes() for t in rows)
    z9 = len(zlib.compress(stream, 9))
    assert enc["e"] < z9, f"engine {enc['e']} not smaller than DEFLATE-9 {z9}"
    assert enc["r"] / enc["e"] > 3.0  # mixture fixture compresses ≥3x overall
