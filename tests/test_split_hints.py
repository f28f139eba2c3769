"""Predefined split hints — the ZopfliPredefinedSplits / --cbs / --aas analog
(reference src/zopfli/zopfli.h:161-178, deflate.c:1672-1715, 1860-1884):
hinted boundaries are honored exactly, chosen boundaries export back as
hints, and the round-trip reproduces identical page geometry."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from zopfli_spark import EngineConfig, encode_table, decode_table
from zopfli_spark.datagen import synth_tokens_df
from zopfli_spark.lineage import hints_dict, split_hints_from_pages

CFG = EngineConfig(
    page_budget_values=20_000,
    group_budget_values=80_000,
    giant_doc_values=40_000,
    max_pages_per_group=16,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    return synth_tokens_df(spark, 400, seed=7).cache()


def _geometry(pages):
    """(part_id → ordered n_rows tuple) — the page-boundary geometry."""
    rows = (
        pages.orderBy("part_id", "page_id")
        .select("part_id", "page_id", "n_rows", "resumed")
        .collect()
    )
    geo: dict[int, list[int]] = {}
    for r in rows:
        geo.setdefault(r["part_id"], []).append(r["n_rows"])
    return {k: tuple(v) for k, v in geo.items()}, rows


def test_hints_roundtrip_reproduces_geometry(spark, tokens_df):
    first = encode_table(tokens_df, CFG).cache()
    geo1, _ = _geometry(first)
    hints = split_hints_from_pages(first)

    second = encode_table(tokens_df, CFG, split_hints=hints).cache()
    geo2, rows2 = _geometry(second)
    assert geo1 == geo2, "hinted run must reproduce the exported boundaries"
    assert all(r["resumed"] == 2 for r in rows2), "every group should hit hints"

    # hints pin geometry across a config change that would otherwise
    # re-search splits (different codec search settings, same boundaries)
    import dataclasses
    cfg9 = dataclasses.replace(CFG, zlib_level=9, iterations=1)
    third = encode_table(tokens_df, cfg9, split_hints=hints).cache()
    geo3, _ = _geometry(third)
    assert geo1 == geo3

    # decoded content still bit-identical
    dec = decode_table(second, CFG)
    a = tokens_df.select("doc_id", F.col("tokens").cast("string").alias("t"))
    b = dec.select("doc_id", F.col("tokens").cast("string").alias("t"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_custom_hints_are_honored_exactly(spark, tokens_df):
    base = encode_table(tokens_df, CFG).cache()
    hints = hints_dict(split_hints_from_pages(base))
    # halve every group's hinted boundary list (coarser custom hints)
    custom = {ck: (ch, b[::2]) for ck, (ch, b) in hints.items()}
    out = encode_table(tokens_df, CFG, split_hints=custom).cache()
    rows = out.select("content_key", "page_id", "n_rows").orderBy("content_key", "page_id").collect()
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r["content_key"], []).append(r["n_rows"])
    for ck, (ch, b) in custom.items():
        n_rows_seq = got[ck]
        bounds = list(np.cumsum(n_rows_seq))[:-1]
        assert bounds == sorted(b), f"group {ck}: hinted {sorted(b)} got {bounds}"


def test_additional_split_refines_within_hints(spark, tokens_df):
    """--aas analog: a deliberately coarse hint (no boundaries at all) plus
    hints_additional_split re-splits inside each segment; hinted points (none)
    survive and the splitter re-adds pages."""
    import dataclasses
    base = encode_table(tokens_df, CFG).cache()
    hints = {ck: (ch, []) for ck, (ch, _) in hints_dict(split_hints_from_pages(base)).items()}
    coarse = encode_table(tokens_df, CFG, split_hints=hints).cache()
    n_coarse = coarse.groupBy("part_id").count().agg(F.max("count")).collect()[0][0]
    assert n_coarse == 1, "empty hint list = one page per group"

    cfg_aas = dataclasses.replace(CFG, hints_additional_split=True)
    refined = encode_table(tokens_df, cfg_aas, split_hints=hints).cache()
    n_refined = refined.count()
    assert n_refined > coarse.count(), "aas must re-split inside segments"


def test_stale_hints_fall_through_to_search(spark, tokens_df):
    base = encode_table(tokens_df, CFG).cache()
    geo1, _ = _geometry(base)
    stale = {ck: (ch ^ 1, b) for ck, (ch, b) in hints_dict(split_hints_from_pages(base)).items()}
    out = encode_table(tokens_df, CFG, split_hints=stale).cache()
    geo2, rows = _geometry(out)
    assert all(r["resumed"] == 0 for r in rows), "stale hash must be ignored"
    assert geo1 == geo2, "search path must reproduce the deterministic result"


def test_hints_outrank_lineage(spark, tokens_df):
    """Explicit predefined splits must win over a recorded lineage plan —
    the reference's sp argument outranks its StatsDB. A store with lineage
    plus custom hints must produce the HINTED geometry (resumed=2), not the
    replayed one (resumed=1)."""
    from zopfli_spark.lineage import lineage_from_pages

    first = encode_table(tokens_df, CFG).cache()
    lineage = lineage_from_pages(first, CFG.mode)
    hints = hints_dict(split_hints_from_pages(first))
    custom = {ck: (ch, b[::2]) for ck, (ch, b) in hints.items()}

    out = encode_table(tokens_df, CFG, lineage=lineage, split_hints=custom).cache()
    rows = out.select("content_key", "page_id", "n_rows", "resumed").orderBy(
        "content_key", "page_id"
    ).collect()
    assert all(r["resumed"] == 2 for r in rows), "hints must outrank lineage"
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r["content_key"], []).append(r["n_rows"])
    for ck, (ch, b) in custom.items():
        bounds = list(np.cumsum(got[ck]))[:-1]
        assert bounds == sorted(b)
