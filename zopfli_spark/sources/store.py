"""Encoded-pages / lineage persistence — the container + SaveFile surface.

The reference wraps its bitstream in gzip/zlib/zip envelopes with checksums
and (for ZIP) a central directory of members (reference:
src/zopfli/gzip_container.c:33-83, zip_container.c:33-155). Here the
envelope is a partitioned Parquet/Iceberg-style table layout:

    <root>/pages/      part_id-partitioned encoded pages (payload+header+crc)
    <root>/lineage/    StatsDB-analog resume records (append-only)
    <root>/metrics/    per-run metrics rows (append-only)

Parquet's footer/row-group metadata plays the central-directory role; the
`part_id` partition column gives partition pruning on reads (Catalyst prunes
directories before any I/O — checked in tests/test_store.py via the physical
plan). Writes are per-partition atomic (task commit protocol), so a killed
job leaves only complete partitions — the property the resume path needs,
mirroring the reference's StatsDB surviving SIGINT (src/zopfli/inthandler.c:
7-15, README:75-78)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..lineage import lineage_from_pages


def write_pages(pages: DataFrame, root: str, mode: str = "overwrite") -> None:
    """Persist encoded pages partitioned by part_id; appends lineage rows."""
    (
        pages.repartition(F.col("part_id"))
        .sortWithinPartitions("part_id", "page_id")
        .write.mode(mode)
        .partitionBy("part_id")
        .parquet(os.path.join(root, "pages"))
    )


def read_pages(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "pages"))


def append_lineage(pages: DataFrame, root: str, config: EngineConfig = DEFAULT_CONFIG) -> None:
    """Append StatsDB-analog rows derived from an encoded-pages DataFrame."""
    lineage_from_pages(pages, config.mode).write.mode("append").parquet(
        os.path.join(root, "lineage")
    )


def read_lineage(spark: SparkSession, root: str) -> DataFrame | None:
    path = os.path.join(root, "lineage")
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    # latest record wins per (content_key, mode) — DB-overwrite semantics of
    # the reference's StatsDBSave (src/zopfli/deflate.c:1230-1272)
    return df.dropDuplicates(["content_key", "mode"])


def append_metrics(metrics: DataFrame, root: str) -> None:
    metrics.write.mode("append").parquet(os.path.join(root, "metrics"))


def encode_to_store(
    df: DataFrame,
    root: str,
    config: EngineConfig = DEFAULT_CONFIG,
    run_id: str = "run",
    split_hints: DataFrame | dict | None = None,
) -> DataFrame:
    """End-to-end encode with resume: load lineage if present, encode (hits
    skip the search), write pages + lineage + metrics. Returns the metrics.
    ``split_hints`` pins page boundaries (see engine.encode_table)."""
    from ..engine import encode_table, metrics_table

    spark = df.sparkSession
    lineage = read_lineage(spark, root)
    pages = encode_table(df, config, lineage=lineage, split_hints=split_hints)
    write_pages(pages, root)
    pages_on_disk = read_pages(spark, root)
    append_lineage(pages_on_disk, root, config)
    m = metrics_table(pages_on_disk, run_id)
    append_metrics(m, root)
    return m
