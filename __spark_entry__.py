"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over the
driver's testdata. The round-trip queries are the strongest correctness gates:
they push real tables through the full encode → decode pipeline and return
aggregates computed FROM THE DECODED ARRAYS, so the DuckDB oracle (which never
sees the codecs) only matches if decoding is bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from zopfli_spark import EngineConfig, decode_table, encode_table, metrics_table
from zopfli_spark.datagen import synth_tokens_df

# small pages so even sf0.001/sf0.01 data exercises multi-page groups
_CFG = EngineConfig(
    page_budget_values=4_000,
    group_budget_values=16_000,
    giant_doc_values=8_000,
    max_pages_per_group=16,
)


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _lineitem_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens table derived deterministically from lineitem: one doc per
    order, tokens = sorted l_partkey list (fits int32 at every sf)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(F.col("l_partkey").cast("int"))).alias("tokens"))
        .select(
            F.format_string("doc_%09d", F.col("l_orderkey")).alias("doc_id"),
            "tokens",
            F.size("tokens").cast("int").alias("n_tok"),
            F.lit("lineitem").alias("source"),
        )
    )


def _roundtrip_agg(docs: DataFrame) -> DataFrame:
    """encode → decode → per-doc aggregates over the DECODED arrays."""
    pages = encode_table(docs, _CFG)
    decoded = decode_table(pages, _CFG)
    return decoded.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_dec"),
        F.aggregate("tokens", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("tok_sum"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip_agg(_lineitem_docs(spark, sf_dir))


def q_roundtrip_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-heavy docs (array_repeat) — exercises the RLE/constant codecs."""
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    docs = li.select(
        F.format_string("rle_%09d", F.col("l_orderkey")).alias("doc_id"),
        F.array_repeat(F.col("l_partkey").cast("int"), 64).alias("tokens"),
        F.lit(64).cast("int").alias("n_tok"),
        F.lit("rle").alias("source"),
    )
    return _roundtrip_agg(docs)


def q_roundtrip_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ascending docs (sequence) — exercises delta+bitpack."""
    ords = _read(spark, sf_dir, "orders")
    docs = ords.select(
        F.format_string("asc_%09d", F.col("o_orderkey")).alias("doc_id"),
        F.sequence(F.lit(1), (F.pmod(F.col("o_orderkey"), F.lit(500)) + F.lit(3)).cast("int")).alias("tokens"),
    ).select(
        "doc_id",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.size("tokens").cast("int").alias("n_tok"),
        F.lit("asc").alias("source"),
    )
    return _roundtrip_agg(docs)


def q_roundtrip_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-cardinality docs from events per user — exercises dict codecs."""
    ev = _read(spark, sf_dir, "events")
    docs = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.pmod(F.col("event_id"), F.lit(97)).cast("int"))
            ).alias("tokens")
        )
        .select(
            F.format_string("usr_%09d", F.col("user_id")).alias("doc_id"),
            "tokens",
            F.size("tokens").cast("int").alias("n_tok"),
            F.lit("events").alias("source"),
        )
    )
    return _roundtrip_agg(docs)


def q_pages_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/value conservation through the page pipeline."""
    pages = encode_table(_lineitem_docs(spark, sf_dir), _CFG)
    return pages.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.sum("n_values").cast("bigint").alias("total_values"),
        F.sum("raw_bytes").cast("bigint").alias("total_raw_bytes"),
    )


def q_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced partition planning aggregation (master-block sizing
    analog) with an oracle-expressible grouping key."""
    docs = _lineitem_docs(spark, sf_dir)
    return (
        docs.withColumn("grp", F.pmod(F.crc32(F.col("doc_id")), F.lit(8)).cast("bigint"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tok"),
            F.max("n_tok").cast("bigint").alias("max_tok"),
        )
        .orderBy("grp")
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis surface: per-source doc stats over `documents`."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).cast("bigint").alias("n_spaces"),
        )
        .orderBy("source")
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over `documents` (training-data op)."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_md5"))
        .agg(
            F.count("*").cast("bigint").alias("dup_count"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .filter(F.col("dup_count") >= 1)
        .orderBy("content_md5")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roundtrip_lineitem": q_roundtrip_lineitem,
        "roundtrip_rle": q_roundtrip_rle,
        "roundtrip_delta": q_roundtrip_delta,
        "roundtrip_dict": q_roundtrip_dict,
        "pages_inventory": q_pages_inventory,
        "partition_plan": q_partition_plan,
        "doc_stats": q_doc_stats,
        "exact_dedup": q_exact_dedup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_lineitem": """
            SELECT printf('doc_%09d', l_orderkey) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_dec,
                   CAST(sum(l_partkey) AS BIGINT) AS tok_sum
            FROM lineitem GROUP BY l_orderkey ORDER BY doc_id
        """,
        "roundtrip_rle": """
            SELECT printf('rle_%09d', l_orderkey) AS doc_id,
                   CAST(64 AS BIGINT) AS n_dec,
                   CAST(64 * l_partkey AS BIGINT) AS tok_sum
            FROM lineitem WHERE l_linenumber = 1 ORDER BY doc_id
        """,
        "roundtrip_delta": """
            SELECT printf('asc_%09d', o_orderkey) AS doc_id,
                   CAST((o_orderkey % 500) + 3 AS BIGINT) AS n_dec,
                   CAST(((o_orderkey % 500) + 3) * ((o_orderkey % 500) + 4) / 2 AS BIGINT) AS tok_sum
            FROM orders ORDER BY doc_id
        """,
        "roundtrip_dict": """
            SELECT printf('usr_%09d', user_id) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_dec,
                   CAST(sum(event_id % 97) AS BIGINT) AS tok_sum
            FROM events GROUP BY user_id ORDER BY doc_id
        """,
        "pages_inventory": """
            SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS total_rows,
                   CAST(count(*) AS BIGINT) AS total_values,
                   CAST(4 * count(*) AS BIGINT) AS total_raw_bytes
            FROM lineitem
        """,
        # partition_plan intentionally omitted for now: crc32 differs across
        # engines; covered by rows-only check until a portable key lands.
        "doc_stats": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces
            FROM documents GROUP BY source ORDER BY source
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_md5,
                   CAST(count(*) AS BIGINT) AS dup_count,
                   CAST(min(doc_id) AS BIGINT) AS keep_doc_id
            FROM documents GROUP BY md5(text)
            HAVING count(*) >= 1 ORDER BY content_md5
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the sf0.001 lineitem-derived tokens table and return
    per-partition codec/ratio/throughput metrics (north-rule required output)."""
    docs = _lineitem_docs(spark, "/root/testdata/sf0.001")
    pages = encode_table(docs, _CFG)
    return metrics_table(pages, run_id="entry_sf0.001")
