"""Structured Streaming encode test: file-source micro-batches into the
page store, resumable via lineage, decoded output bit-identical."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zopfli_spark import EngineConfig, decode_table, roundtrip_check
from zopfli_spark.datagen import synth_tokens_df
from zopfli_spark.sources.store import read_lineage, read_pages
from zopfli_spark.streaming.encode_stream import encode_stream

CFG = EngineConfig(
    page_budget_values=20_000,
    group_budget_values=80_000,
    giant_doc_values=40_000,
)


def test_streaming_encode_roundtrip(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    root = str(tmp_path_factory.mktemp("stream_store"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    df = synth_tokens_df(spark, 300, seed=13).cache()
    # two "arrivals" (micro-batch files)
    df.filter(F.crc32("doc_id") % 2 == 0).write.mode("overwrite").parquet(src + "/b0")
    df.filter(F.crc32("doc_id") % 2 == 1).write.mode("overwrite").parquet(src + "/b1")

    stream = spark.readStream.schema(
        "doc_id string, tokens array<int>, n_tok int, source string"
    ).option("pathGlobFilter", "*.parquet").parquet(src + "/*")
    q = encode_stream(stream, root, CFG, checkpoint=ckpt, trigger_once=True)
    q.awaitTermination(300)

    pages = read_pages(spark, root)
    decoded = decode_table(pages, CFG)
    assert roundtrip_check(df, decoded).count() == 0
    lin = read_lineage(spark, root)
    assert lin is not None and lin.count() > 0
