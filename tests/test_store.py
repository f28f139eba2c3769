"""Persistence + plan-shape tests for the pages/lineage store."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from zopfli_spark import EngineConfig, decode_table, encode_table, roundtrip_check
from zopfli_spark.datagen import synth_tokens_df
from zopfli_spark.sources.store import (
    append_lineage,
    encode_to_store,
    read_lineage,
    read_pages,
    write_pages,
)

CFG = EngineConfig(
    page_budget_values=20_000,
    group_budget_values=80_000,
    giant_doc_values=40_000,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    return synth_tokens_df(spark, 400, seed=5).cache()


def test_roundtrip_through_disk(spark, tokens_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    pages = encode_table(tokens_df, CFG)
    write_pages(pages, root)
    decoded = decode_table(read_pages(spark, root), CFG)
    assert roundtrip_check(tokens_df, decoded).count() == 0


def test_partition_pruning_on_pages(spark, tokens_df, tmp_path_factory):
    """Filtering on part_id must prune partitions at the source (Catalyst
    reads only matching directories), and projecting metadata must not read
    the payload column (column pruning into the parquet scan)."""
    root = str(tmp_path_factory.mktemp("store"))
    write_pages(encode_table(tokens_df, CFG), root)
    pruned = read_pages(spark, root).filter(F.col("part_id") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_id" in plan
    proj = read_pages(spark, root).select("codec", "enc_bytes")
    plan2 = proj._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan2.split("ReadSchema")[-1], "payload must be pruned"


def test_resume_from_disk_lineage(spark, tokens_df, tmp_path_factory):
    """Kill/rerun workflow: first run writes pages+lineage; second run reads
    lineage from disk and resumes every group byte-identically."""
    root = str(tmp_path_factory.mktemp("store"))
    m1 = encode_to_store(tokens_df, root, CFG, run_id="r1")
    assert m1.count() > 0
    lineage = read_lineage(spark, root)
    assert lineage is not None and lineage.count() > 0
    pages2 = encode_table(tokens_df, CFG, lineage=lineage)
    assert pages2.filter(F.col("resumed") == 0).count() == 0
    a = read_pages(spark, root).agg(F.sum(F.crc32("payload"))).collect()[0][0]
    b = pages2.agg(F.sum(F.crc32("payload"))).collect()[0][0]
    assert a == b


def test_lineage_latest_record_wins(spark, tokens_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    pages = encode_table(tokens_df, CFG).cache()
    append_lineage(pages, root, CFG)
    append_lineage(pages, root, CFG)  # duplicate append (re-run)
    lin = read_lineage(spark, root)
    dup = lin.groupBy("content_key", "mode").count().filter(F.col("count") > 1)
    assert dup.count() == 0
