"""Round-4 lifecycle fixes: allow-list lineage resume (VERDICT r3 wrong #1),
allow-list fingerprint collisions (ADVICE r3), lineage compaction (VERDICT r3
missing #1), expire-vs-commit race (ADVICE r3 medium), commit-marker fallback
window (ADVICE r3 low), and the 2 GiB string-offset guard (ADVICE r3 low)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import functions as F

from zopfli_spark import EngineConfig
from zopfli_spark.datagen import synth_tokens_df
from zopfli_spark.sources.store import (
    commit_snapshot,
    compact_lineage,
    encode_to_store,
    expire_snapshots,
    list_snapshots,
    read_lineage,
    read_pages,
    remove_orphan_files,
)

CFG_KW = dict(
    page_budget_values=20_000,
    group_budget_values=80_000,
    giant_doc_values=40_000,
    max_pages_per_group=16,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def _page_sig(spark, root):
    return (
        read_pages(spark, root)
        .orderBy("part_id", "page_id")
        .select(
            "part_id", "page_id", "codec", "checksum", "enc_bytes",
            F.crc32("payload").alias("pc"), F.crc32("header").alias("hc"),
            "resumed",
        )
        .toPandas()
    )


def test_allowlist_mode_exceeds_int32_and_fits_long():
    cfg = EngineConfig(codec_allowlist=("rle", "dict"), **CFG_KW)
    assert cfg.mode > 2**31  # the overflow regime the int column truncated
    assert cfg.mode < 2**63  # must survive a Spark `long` exactly
    # order-insensitive, duplicate-safe, collision-resistant (sorted
    # length-prefixed CRC32, no XOR cancellation)
    assert cfg.mode == EngineConfig(codec_allowlist=("dict", "rle"), **CFG_KW).mode
    others = [
        EngineConfig(codec_allowlist=al, **CFG_KW).mode
        for al in [("rle",), ("dict",), ("rle", "dict", "plain"), ("plain",)]
    ]
    assert len({cfg.mode, *others}) == 5


def test_allowlist_resume_hits_and_is_byte_identical(spark, root):
    """The r3 bug: `mode int` truncated the allow-list fingerprint, so resume
    silently never hit for any allow-listed config."""
    cfg = EngineConfig(codec_allowlist=("rle", "dict", "plain"), **CFG_KW)
    df = synth_tokens_df(spark, 300, seed=7).cache()

    encode_to_store(df, root, cfg, run_id="r1")
    sig1 = _page_sig(spark, root)
    assert (sig1["resumed"] == 0).all()

    # lineage stores the >int32 mode exactly
    lin = read_lineage(spark, root)
    assert dict(lin.dtypes)["mode"] == "bigint"
    stored = {r["mode"] for r in lin.select("mode").distinct().collect()}
    assert stored == {cfg.mode}

    encode_to_store(df, root, cfg, run_id="r2")
    sig2 = _page_sig(spark, root)
    assert (sig2["resumed"] == 1).all(), "allow-listed resume must hit lineage"
    cols = ["part_id", "page_id", "codec", "checksum", "enc_bytes", "pc", "hc"]
    assert sig1[cols].equals(sig2[cols])
    # and the recorded codecs honor the allow-list: 'constant' is the
    # always-admitted degenerate (single-valued page, like PLAIN's stored
    # guarantee); 'dict_rle' = DICT with an RLE index stream (both listed)
    assert set(sig2["codec"].str.split("@").str[0]) <= {
        "rle", "dict", "plain", "constant", "dict_rle"
    }


def test_lineage_compaction_keeps_rows_flat_and_resume_green(spark, root):
    cfg = EngineConfig(**CFG_KW)
    df = synth_tokens_df(spark, 300, seed=9).cache()
    counts = []
    for i in range(4):
        # compact_after_files=0 forces compaction after every append
        encode_to_store(df, root, cfg, run_id=f"r{i}", compact_after_files=0)
        counts.append(read_lineage(spark, root).count())
    assert counts[0] == counts[-1], f"lineage must stay O(live groups): {counts}"
    sig = _page_sig(spark, root)
    assert (sig["resumed"] == 1).all(), "resume must survive compaction"
    # explicit call is idempotent and reports the live-row count
    kept = compact_lineage(root, spark)
    assert kept == counts[-1]


def test_metrics_compaction_bounds_rows_and_files(spark, root):
    """Metrics lifecycle (VERDICT r4 missing #3): N runs append forever;
    gc --compact-metrics dedups and --keep-runs retains only the newest
    run_ids, bounding both row and file count across runs."""
    from zopfli_spark.sources.store import compact_metrics, store_partition_count

    cfg = EngineConfig(**CFG_KW)
    df = synth_tokens_df(spark, 200, seed=13).cache()
    for i in range(4):
        encode_to_store(df, root, cfg, run_id=f"run{i}")
    metrics_path = os.path.join(root, "metrics")
    files_before = store_partition_count(root, "metrics")
    rows_before = spark.read.parquet(metrics_path).count()
    # dedup-only pass: deterministic re-runs differ only in run_id, so rows
    # survive, but the file count collapses
    kept = compact_metrics(root, spark)
    assert kept == rows_before
    assert store_partition_count(root, "metrics") < files_before
    # retention: keep the 2 most recent runs (by append timestamp)
    kept2 = compact_metrics(root, spark, keep_runs=2)
    runs = {
        r["run_id"]
        for r in spark.read.parquet(metrics_path).select("run_id").distinct().collect()
    }
    assert runs == {"run2", "run3"}, runs
    assert kept2 == spark.read.parquet(metrics_path).count()
    # empty/missing dir reports -1, never raises
    assert compact_metrics(str(root) + "_nope", spark) == -1


def test_expire_spares_inflight_dirs_orphans_age_gated(spark, root):
    """ADVICE r3 medium: expire must only delete dirs the dropped manifests
    referenced — a data dir with no manifest yet may be a commit in flight."""
    cfg = EngineConfig(**CFG_KW)
    from zopfli_spark import encode_table

    p1 = encode_table(synth_tokens_df(spark, 60, seed=1), cfg)
    p2 = encode_table(synth_tokens_df(spark, 60, seed=2), cfg)
    m1 = commit_snapshot(p1, root)              # dirs: [d1]
    m2 = commit_snapshot(p2, root, append=False)  # overwrite → dirs: [d2]

    # simulate a commit in flight: data dir exists, manifest not yet written
    inflight = os.path.join(root, "data", "snap-inflight")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part.parquet"), "wb") as fh:
        fh.write(b"x")

    res = expire_snapshots(root, keep_last=1)
    assert res["removed_snapshots"] == [m1["snapshot_id"]]
    assert res["removed_dirs"] == m1["dirs"]  # d1: exclusively dropped
    assert os.path.isdir(os.path.join(root, m2["dirs"][0]))
    assert os.path.isdir(inflight), "expire must never sweep unreferenced dirs"

    # the age-gated orphan sweep: young → spared, old enough → removed
    assert remove_orphan_files(root, older_than_s=3600) == []
    assert os.path.isdir(inflight)
    assert remove_orphan_files(root, older_than_s=0.0) == ["data/snap-inflight"]
    assert not os.path.isdir(inflight)
    assert os.path.isdir(os.path.join(root, m2["dirs"][0]))


def test_expire_keeps_shared_dirs(spark, root):
    """An appended snapshot shares its parent's dirs; dropping the parent
    must not delete dirs the kept child still references."""
    cfg = EngineConfig(**CFG_KW)
    from zopfli_spark import encode_table

    m1 = commit_snapshot(encode_table(synth_tokens_df(spark, 60, seed=3), cfg), root)
    m2 = commit_snapshot(
        encode_table(synth_tokens_df(spark, 60, seed=4), cfg), root, append=True
    )
    assert set(m1["dirs"]) < set(m2["dirs"])
    res = expire_snapshots(root, keep_last=1)
    assert res["removed_dirs"] == []  # d1 still referenced by kept m2
    for d in m2["dirs"]:
        assert os.path.isdir(os.path.join(root, d))


def test_uncommitted_manifest_is_invisible(root):
    """ADVICE r3 low: a bare manifest with no .commit marker on a marker-era
    store (no LATEST) must not be treated as committed; the legacy fallback
    only fires for stores that predate the protocol (LATEST, no markers)."""
    sd = os.path.join(root, "snapshots")
    os.makedirs(sd)
    manifest = {
        "snapshot_id": "abc", "sequence": 1, "parent_id": None,
        "operation": "overwrite", "dirs": ["data/snap-abc"],
        "summary": {}, "schema": [],
    }
    with open(os.path.join(sd, "000001-abc.json"), "w") as fh:
        json.dump(manifest, fh)
    assert list_snapshots(root) == []  # mid-first-commit window: invisible
    with open(os.path.join(sd, "LATEST"), "w") as fh:
        fh.write("000001-abc.json")
    assert [m["snapshot_id"] for m in list_snapshots(root)] == ["abc"]  # legacy


def test_strings_from_utf8_over_2gib_raises():
    """ADVICE r3 low: >2 GiB payload silently wrapped int32 offsets into a
    corrupt StringArray. The guard raises loudly instead (a large_utf8
    fallback would fail one step later in the fixed string-typed decode
    flush — review r4): no giant allocation is needed to hit the check."""
    lengths = np.array([2**30, 2**30], dtype=np.int64)
    with pytest.raises(ValueError, match="2 GiB"):
        from zopfli_spark.codecs.strings import strings_from_utf8

        strings_from_utf8(b"", lengths)  # guard fires on lengths alone
    from zopfli_spark.codecs.strings import strings_from_utf8

    small = strings_from_utf8(b"abcdef", np.array([3, 3], dtype=np.int64))
    assert pa.types.is_string(small.type) and small.to_pylist() == ["abc", "def"]


def test_read_lineage_handles_pre_fix_int32_mode_files(spark, tmp_path):
    """Upgrade path: a store whose early runs wrote `mode int` (pre-r4)
    must read cleanly alongside new int64 appends — the explicit-schema
    read widens the old files; compaction normalizes them on disk."""
    root = str(tmp_path / "store")
    lin = root + "/lineage"
    spark.createDataFrame(
        [(1, 2, 3, 4, 5, "[]")],
        "content_key long, content_hash long, mode int, n_values long, "
        "n_rows int, plan string",
    ).write.mode("append").parquet(lin)
    spark.createDataFrame(
        [(10, 20, 2**40, 40, 50, "[]")],
        "content_key long, content_hash long, mode long, n_values long, "
        "n_rows int, plan string",
    ).write.mode("append").parquet(lin)
    df = read_lineage(spark, root)
    assert dict(df.dtypes)["mode"] == "bigint"
    assert sorted(r["mode"] for r in df.collect()) == [3, 2**40]
    assert compact_lineage(root, spark) == 2
    # post-compaction the store is pure int64 and still reads
    assert sorted(r["mode"] for r in read_lineage(spark, root).collect()) == [3, 2**40]
    # missing-lineage path still returns None
    assert read_lineage(spark, str(tmp_path / "nope")) is None


def test_rle_overflow_crafted_blob_raises_not_crashes():
    """Review r4: a crafted RLE blob whose run lengths int64-sum wraps to
    exactly n passed the sum==n guard and segfaulted in np.repeat. The
    max<=n check must reject it before any allocation."""
    import struct

    from zopfli_spark.codecs.bitio import pack_bits
    from zopfli_spark.codecs.kernels import FOR_BITPACK, RLE, decode_blob, encode_best

    n = 7
    run_vals = encode_best(np.arange(5, dtype=np.int64))
    # lengths [2^62, 2^62, 2^62, 2^62, 7]: sum wraps to 7 == n in int64.
    # encode_best enforces the int32 write contract, so build the inner
    # FOR_BITPACK blob by hand — exactly what a hostile byte stream can do
    lens = np.array([2**62] * 4 + [n], dtype=np.int64)
    base, width = n, 62
    run_lens = (
        bytes([FOR_BITPACK])
        + struct.pack("<q", base)
        + bytes([width])
        + pack_bits((lens - base).view(np.uint64), width)
    )
    assert (decode_blob(run_lens, 5) == lens).all()  # craft survives decode
    blob = (
        bytes([RLE])
        + struct.pack("<I", 5)
        + struct.pack("<I", len(run_vals))
        + run_vals
        + run_lens
    )
    with pytest.raises(ValueError, match="RLE run lengths corrupt"):
        decode_blob(blob, n)


def test_remove_orphans_refuses_ambiguous_store(root):
    """Review r4: a store with manifests but no committed snapshot (lost
    LATEST on a legacy store) must refuse the sweep — otherwise every data
    dir reads as an orphan and a fully committed store gets deleted."""
    sd = os.path.join(root, "snapshots")
    os.makedirs(sd)
    with open(os.path.join(sd, "000001-abc.json"), "w") as fh:
        json.dump({"snapshot_id": "abc", "sequence": 1, "dirs": ["data/snap-abc"]}, fh)
    d = os.path.join(root, "data", "snap-abc")
    os.makedirs(d)
    with open(os.path.join(d, "part.parquet"), "wb") as fh:
        fh.write(b"x")
    with pytest.raises(RuntimeError, match="refusing to sweep"):
        remove_orphan_files(root, older_than_s=0.0)
    assert os.path.isdir(d), "data must survive the refused sweep"
    # restoring the legacy pointer re-exposes the snapshot; sweep then
    # correctly treats the referenced dir as live
    with open(os.path.join(sd, "LATEST"), "w") as fh:
        fh.write("000001-abc.json")
    assert remove_orphan_files(root, older_than_s=0.0) == []
    assert os.path.isdir(d)
