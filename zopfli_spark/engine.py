"""Top-level engine API: encode_table / decode_table / roundtrip_check.

The ``ZopfliCompress`` dispatch analog (reference src/zopfli/zopfli_lib.c:
50-82) — one call that plans partitions, runs the per-group encode search,
and returns the encoded-pages DataFrame plus per-partition metrics, all as a
single declarative Spark pipeline (one shuffle: the group-by; everything else
is narrow).

The UDF boundary is **Arrow-native** (applyInArrow / mapInArrow, Spark 4):
token arrays cross the JVM↔Python boundary as flat Arrow buffers
(values + int32 offsets) with zero per-row conversion — the columnar
struct-of-arrays discipline of the reference's LZ77 store
(src/zopfli/lz77.h:43-61) applied to the UDF transport itself. Measured on
this host, the pandas path (per-row list→ndarray materialization) starved 32
concurrent workers at ~25% CPU; the Arrow path feeds them flat buffers.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, functions as F

from .config import DEFAULT_CONFIG, EngineConfig
from .deploy import ensure_shipped
from .lineage import (
    group_content_hash,
    hints_dict,
    lineage_dict,
    struct_plan_to_pages,
)
from .operators.pagecodec import decode_page, encode_page
from .pages import split_by_cost, split_simple
from .plans.planner import GROUP_COL, ROW_HASH_COL, plan_groups
from .squeeze import merge_pass, refine_boundaries

PAGES_SCHEMA = (
    "part_id int, page_id int, codec string, n_rows int, n_values long, "
    "first_doc_id string, last_doc_id string, raw_bytes long, enc_bytes long, "
    "checksum long, enc_us long, enc_cpu_us long, content_key long, content_hash_group long, "
    "resumed int, header binary, payload binary"
)

_PAGES_ARROW = pa.schema(
    [
        ("part_id", pa.int32()),
        ("page_id", pa.int32()),
        ("codec", pa.string()),
        ("n_rows", pa.int32()),
        ("n_values", pa.int64()),
        ("first_doc_id", pa.string()),
        ("last_doc_id", pa.string()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("enc_us", pa.int64()),
        ("enc_cpu_us", pa.int64()),
        ("content_key", pa.int64()),
        ("content_hash_group", pa.int64()),
        ("resumed", pa.int32()),
        ("header", pa.binary()),
        ("payload", pa.binary()),
    ]
)

DECODED_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

_DECODED_ARROW = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _allowlist_tags(names: tuple[str, ...] | None) -> frozenset | None:
    """Codec allow-list names → kernel tags (the ZopfliOptions codec dial,
    SURVEY §1.2). PLAIN is always admitted — the stored-block guarantee."""
    if names is None:
        return None
    from .codecs.kernels import CODEC_NAMES, PLAIN

    by_name = {v: k for k, v in CODEC_NAMES.items()}
    unknown = [n for n in names if n not in by_name]
    if unknown:
        raise ValueError(f"unknown codec names in allow-list: {unknown}")
    return frozenset({PLAIN} | {by_name[n] for n in names})


def _achievable_bpv(
    values: np.ndarray,
    val_offsets: np.ndarray,
    n_docs_g: int,
    sample_cap: int = 4096,
    max_docs: int = 64,
) -> float | None:
    """Per-doc achievable bits-per-value estimate for the mode-grid gate —
    fully vectorized (VERDICT r3 next #6 replaced the per-doc Python loop).

    Samples up to ``max_docs`` docs (≤ ``sample_cap`` values each) and takes
    each doc's cheapest of {order-0 entropy, delta entropy, RLE estimate},
    with a bitpack-range floor when the sample is ≥90% distinct (small
    samples underestimate wide-domain entropy). One lexsort over all sampled
    (doc, value) pairs computes every per-doc entropy at once; per-doc
    min/max fall out of the sort order for free. Algebraically identical to
    the loop version (entropy as log2(m) − Σc·log2c / m).
    Returns None when no doc has ≥16 sampled values."""
    step = max(1, n_docs_g // max_docs)
    d_idx = np.arange(0, n_docs_g, step)
    starts = val_offsets[d_idx].astype(np.int64)
    ends = np.minimum(starts + sample_cap, val_offsets[d_idx + 1].astype(np.int64))
    m = ends - starts
    keep = m >= 16
    starts, m = starts[keep], m[keep]
    nseg = len(m)
    if nseg == 0:
        return None
    seg = np.repeat(np.arange(nseg), m)
    seg_first = np.cumsum(m) - m  # index of each segment's first element
    pos = np.arange(int(m.sum())) - np.repeat(seg_first, m) + np.repeat(starts, m)
    v = values[pos].astype(np.int64)

    def _seg_entropy(vals: np.ndarray, sid: np.ndarray, mm: np.ndarray) -> np.ndarray:
        order = np.lexsort((vals, sid))
        sv, ss = vals[order], sid[order]
        # boundaries of distinct (seg, value) runs in the sorted stream
        head = np.empty(len(sv), dtype=bool)
        head[0] = True
        np.logical_or(ss[1:] != ss[:-1], sv[1:] != sv[:-1], out=head[1:])
        idx = np.flatnonzero(head)
        c = np.diff(np.append(idx, len(sv))).astype(np.float64)
        seg_u = ss[idx]
        s_clogc = np.bincount(seg_u, weights=c * np.log2(c), minlength=nseg)
        mmf = mm.astype(np.float64)
        ent = np.log2(mmf) - s_clogc / mmf
        # ≥90%-distinct floor at the bitpack range
        u = np.bincount(seg_u, minlength=nseg)
        sf = np.cumsum(mm) - mm
        vmin = sv[sf]  # sorted within segment: first = min, last = max
        vmax = sv[sf + mm - 1]
        floor = np.log2((vmax - vmin).astype(np.float64) + 1.0)
        return np.where(u > 0.9 * mmf, np.maximum(ent, floor), ent)

    ent_v = _seg_entropy(v, seg, m)
    intra = np.ones(len(v), dtype=bool)
    intra[seg_first] = False  # drop each segment's first (cross-doc diff)
    dv = (v - np.concatenate(([0], v[:-1])))[intra]
    seg_dv = seg[intra]
    ent_dv = _seg_entropy(dv, seg_dv, m - 1)
    runs = np.bincount(seg_dv, weights=(dv != 0).astype(np.float64), minlength=nseg) + 1.0
    rle_bits = 64.0 * runs / m.astype(np.float64)
    best = np.minimum(np.minimum(ent_v, ent_dv), rle_bits)
    return float((best * m).sum() / m.sum()) / 8.0


# --- group-level shared Huffman dictionary: training policy ---------------
# (mechanism lives in codecs.kernels; these thresholds are the CONTENT-PURE
# selection rule, chosen so lineage replay re-derives the identical training
# set — and therefore identical dictionary bytes — without re-running any
# size comparison, VERDICT r4 next #2)
_GH_MIN_TRAIN_SPAN = 4096  # spans below this are too noisy to train on
_GH_TRAIN_WINDOW = 1 << 16  # fixed training-window size over the value
#                             stream: training is a pure function of
#                             (content, config) — independent of page
#                             bounds, so the dictionary exists BEFORE the
#                             split search and every stage can price the
#                             group_huffman candidate in its argmin
_GH_MIN_TRAIN_CARD = 257  # dict-header-bound territory starts past one byte
_GH_ENTROPY_MARGIN = 0.92  # H0 must beat the analytic codec floor by ≥8%
_GH_KL_MAX = 0.3  # drop training spans whose cross-entropy under the
#                   EQUAL-WEIGHT pooled code exceeds their own H0 by more
#                   (distribution mismatch pollutes the shared code; same-
#                   family spans measure ce−h0 ≈ 0.0-0.15, a mixed-content
#                   outlier ≥ 1 — see the refinement comment in _gh_ctx)
_GH_ROW_OVERHEAD = 48  # approximate per-row cost of the dict row itself


# powers of two for a vectorized int.bit_length: bl(x) = index right of x
# in [2^0 .. 2^62] (bl(0)=0, bl(1)=1, bl(2^k)=k+1) — exact, no float log2
_BL_POWS = (np.int64(1) << np.arange(63, dtype=np.int64))


def _bit_lengths(x: np.ndarray) -> np.ndarray:
    return np.searchsorted(_BL_POWS, x, side="right").astype(np.int64)


def train_group_dict(values: np.ndarray, config) -> dict:
    """Derive the group's shared-Huffman dictionary from (content, config)
    alone — returns ``{"blob": bytes|None, "gd": GroupDict?}``. Module-level
    (r6) so tools/tests can derive the identical dictionary the encode task
    will use; ``_encode_group``'s lazy ``_gh_ctx`` is a thin memo over this.

    Training-set selection is CONTENT-PURE (no realized-size comparisons):
    fixed windows over the (clustered) value stream where order-0 entropy
    beats every analytic codec floor, refined by equal-weight-KL dropping.
    Independent of page bounds, so lineage replay re-derives identical
    dictionary bytes and the dictionary exists BEFORE the split search
    (every search stage prices the group_huffman candidate in its argmin)."""
    from .codecs.bitio import bit_width
    from .codecs.kernels import (
        _GH_MAX_CARD,
        GroupDict,
        _entropy_bits,
        encode_group_dict,
    )

    train: list[tuple] = []
    n_total = len(values)
    # window tracks page granularity (adoption is per page) but stays
    # capped: pure function of config, so replay derives the same set
    win = max(_GH_MIN_TRAIN_SPAN, min(config.page_budget_values, _GH_TRAIN_WINDOW))
    starts = list(range(0, n_total, win))
    for k, a in enumerate(starts):
        b = min(a + win, n_total)
        n_sp = b - a
        if n_sp < _GH_MIN_TRAIN_SPAN:
            continue
        sp = values[a:b].astype(np.int64)
        u, cts = np.unique(sp, return_counts=True)
        if len(u) < _GH_MIN_TRAIN_CARD or len(u) > _GH_MAX_CARD - 1:
            continue
        h0 = _entropy_bits(cts) / n_sp
        w_for = bit_width(int(sp.max()) - int(sp.min()))
        if n_sp > 1:
            diffs = np.diff(sp)
            w_delta = bit_width(2 * int(np.abs(diffs).max()))
            rle_b = 64.0 * (1 + int(np.count_nonzero(diffs))) / n_sp
        else:
            w_delta, rle_b = 64, 64.0
        if h0 < _GH_ENTROPY_MARGIN * min(w_for, w_delta, rle_b):
            train.append((u, cts, h0, k))
    # greedy cardinality-capped selection, LOW-card spans first (span
    # index as the deterministic tiebreak — content-pure, so replay
    # re-derives the same set): without this, one high-card span (a
    # page mixing a heavy-tail distribution with near-uniform content)
    # inflates the pooled union past _GH_MAX_CARD and the WHOLE group
    # bailed — and the KL refinement below could not save it, because
    # the offending span carries the majority mass, so refinement kept
    # it and dropped the compatible low-card spans instead (measured on
    # the r5 mixture: 0 adoptions at the ratio dials, ~3.5% payload
    # left on the table). Compatible spans overlap heavily, so their
    # running union grows slowly; an incompatible giant fails the cap
    # and is skipped, never poisoning the pool.
    train.sort(key=lambda t: (len(t[0]), t[3]))
    selected: list[tuple] = []
    uni: np.ndarray | None = None
    for t in train:
        merged = t[0] if uni is None else np.union1d(uni, t[0])
        # - 1: the ESCAPE symbol rides along, so the table tops out at
        # 2^17 codes with a 2^17-1 dictionary (ADVICE r5 medium)
        if len(merged) > _GH_MAX_CARD - 1:
            continue
        uni = merged
        selected.append(t)
    train = selected
    # KL refinement: drop distribution-mismatched spans, retrain. The
    # compatibility metric pools spans with EQUAL weight (each span's
    # counts normalized to a probability first): under mass-weighted
    # pooling one giant span dominates q, inflating every OTHER span's
    # cross-entropy — on the r5 mixture a 1.4M-value mixed page made
    # all nine compatible zipf spans read ce−h0 ≈ 0.65 while itself
    # reading 0.33, so refinement either dropped the good spans or gave
    # up, and adoption never fired. Equal-weight q makes the true
    # outlier the one that pays: a span unlike the others sees its
    # values at ~1/K of their own probability (ce−h0 ≈ log2 K) while
    # compatible spans sit near 0. When every span fails the gate the
    # set is heterogeneous — drop only the single worst offender and
    # re-pool, so one bad span can never take the group down with it.
    # round cap bounds refinement CPU on pathological heterogeneous
    # groups (drop-worst removes one span per round); exact byte
    # safety never depends on refinement — adoption is keep-if-smaller
    for _round in range(16):
        if not train:
            break
        allu = np.unique(np.concatenate([t[0] for t in train]))
        q = np.zeros(len(allu), dtype=np.float64)
        for u, cts, _h0, _k in train:
            q[np.searchsorted(allu, u)] += cts / cts.sum()
        q /= len(train)
        offenses = []
        for t in train:
            u, cts, h0, _k = t
            ce = float(-(cts * np.log2(q[np.searchsorted(allu, u)])).sum() / cts.sum())
            offenses.append(ce - h0)
        keep = [t for t, o in zip(train, offenses) if o <= _GH_KL_MAX]
        if len(keep) == len(train):
            break
        if not keep:
            worst = int(np.argmax(offenses))
            keep = [t for j, t in enumerate(train) if j != worst]
        train = keep
    if not train:
        return {"blob": None}
    allu = np.unique(np.concatenate([t[0] for t in train]))
    if len(allu) < 2 or len(allu) > _GH_MAX_CARD - 1:
        return {"blob": None}
    pooled = np.zeros(len(allu), dtype=np.int64)
    for u, cts, _h0, _k in train:
        pooled[np.searchsorted(allu, u)] += cts
    blob = encode_group_dict(allu, pooled, zlib_level=config.zlib_level)
    return {"blob": blob, "gd": GroupDict(blob)}


def _doc_signature_keys(values: np.ndarray, val_offsets: np.ndarray) -> np.ndarray:
    """Per-doc content-signature sort keys for cluster_docs: (range bits,
    run-ratio bucket, sampled-distinct bucket, mean-|delta| bits) packed
    into one int64. Pure function of content → identical at any parallelism.

    Fully vectorized (VERDICT r5 wrong #5 replaced the per-doc Python
    loop): segment min/max via ``reduceat`` over non-empty doc starts,
    run/|delta| stats via masked ``bincount`` over the global diff array,
    and the sampled-distinct bucket via one lexsort over (doc, sampled
    value) — the same technique ``_achievable_bpv`` uses. Bit-for-bit
    identical to the loop form (asserted in tests/test_engine.py): integer
    sums stay exact in float64 (< 2^53), so every float division and
    truncation reproduces the per-doc scalar math."""
    n_docs = len(val_offsets) - 1
    keys = np.zeros(n_docs, dtype=np.int64)
    lens = np.diff(val_offsets).astype(np.int64)
    nz = lens > 0
    if not nz.any():
        return keys
    v = values.astype(np.int64)
    starts = val_offsets[:-1].astype(np.int64)

    # range bits: per-doc max-min via reduceat (consecutive non-empty doc
    # starts tile the value array exactly; empty docs contribute nothing)
    idx = starts[nz]
    mx = np.maximum.reduceat(v, idx)
    mn = np.minimum.reduceat(v, idx)
    rng_b = np.zeros(n_docs, dtype=np.int64)
    rng_b[nz] = _bit_lengths(mx - mn)

    # run / mean-|delta| stats from ONE global diff pass, doc-masked
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    dv = np.diff(v) if len(v) > 1 else np.empty(0, dtype=np.int64)
    same = doc_of[1:] == doc_of[:-1] if len(v) > 1 else np.empty(0, dtype=bool)
    d_doc = doc_of[:-1][same] if len(v) > 1 else np.empty(0, dtype=np.int64)
    d_val = dv[same] if len(v) > 1 else dv
    nz_runs = np.bincount(d_doc[d_val != 0], minlength=n_docs)
    runs = 1 + nz_runs  # meaningful only where lens > 0
    abs_sums = np.bincount(d_doc, weights=np.abs(d_val).astype(np.float64), minlength=n_docs)
    run_b = np.zeros(n_docs, dtype=np.int64)
    run_b[nz] = (8.0 * runs[nz] / lens[nz]).astype(np.int64)
    mad_b = np.zeros(n_docs, dtype=np.int64)
    multi = lens > 1
    mean_plus1 = np.zeros(n_docs)
    mean_plus1[multi] = abs_sums[multi] / (lens[multi] - 1) + 1.0
    mad_b[multi] = _bit_lengths(np.trunc(mean_plus1[multi]).astype(np.int64))

    # sampled-distinct bucket: per-doc strided sample (step = max(1,
    # n//256)), distinct count via one lexsort over (doc, value)
    step = np.maximum(1, lens // 256)
    ns = np.zeros(n_docs, dtype=np.int64)
    ns[nz] = -(-lens[nz] // step[nz])  # ceil — len(d[::step])
    cs = np.concatenate(([0], np.cumsum(ns)))
    within = np.arange(int(cs[-1]), dtype=np.int64) - np.repeat(cs[:-1], ns)
    pos = np.repeat(starts, ns) + within * np.repeat(step, ns)
    sv = v[pos]
    sdoc = np.repeat(np.arange(n_docs, dtype=np.int64), ns)
    order = np.lexsort((sv, sdoc))
    sv_s, sdoc_s = sv[order], sdoc[order]
    dup = np.zeros(len(sv_s), dtype=bool)
    if len(sv_s) > 1:
        dup[1:] = (sdoc_s[1:] == sdoc_s[:-1]) & (sv_s[1:] == sv_s[:-1])
    uniqs = ns - np.bincount(sdoc_s[dup], minlength=n_docs)
    dist_b = np.zeros(n_docs, dtype=np.int64)
    dist_b[nz] = (8.0 * uniqs[nz] / ns[nz]).astype(np.int64)

    keys[nz] = (
        (rng_b[nz] << 24) | (run_b[nz] << 16) | (dist_b[nz] << 8) | mad_b[nz]
    )
    return keys


def _string_col(tbl: pa.Table, name: str) -> pa.Array:
    """One contiguous StringArray for a column (no per-row conversion)."""
    col = tbl.column(name).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.utf8())
    return col


def _tokens_flat(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(values int32, lens int64) from the Arrow list column — zero-copy."""
    col = tbl.column("tokens").combine_chunks()
    if col.null_count:
        raise ValueError("tokens column contains nulls (contract: array<int32>)")
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.list_(pa.int32()))
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    # list array may be a slice: honor its offset window
    lens = np.diff(offsets)
    values = values[offsets[0] : offsets[-1]]
    return values, lens


def _encode_group(
    tbl: pa.Table,
    config: EngineConfig,
    lin: dict | None = None,
    plan_tbl: pa.Table | None = None,
    hints: dict | None = None,
) -> pa.Table:
    """Encode one group → page rows. Pure function of group content (sorted
    by doc_id), so output is identical at any parallelism — the seeded
    determinism discipline of reference src/zopfli/squeeze.c:79-146."""
    # timers start HERE: enc_us/enc_cpu_us cover the whole per-group job —
    # sort, content hash, SPLIT SEARCH, codec search, emission — so the
    # bench's tokens_per_cpu_sec is the true per-worker rate (r3: the
    # splitter was outside the timer, understating kernel share by ~25%
    # at fine page granularity and muddying the cpu_efficiency control)
    t_enc0 = time.perf_counter()
    t_cpu0 = time.process_time()
    order = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
    tbl = tbl.take(order)
    part_id = int(tbl.column(GROUP_COL)[0].as_py())
    # strings stay Arrow arrays end-to-end (flat utf-8 buffer + offsets) —
    # page slices are zero-copy; no to_pylist/per-row boxing (VERDICT r2 #3)
    doc_ids = _string_col(tbl, "doc_id")
    sources = _string_col(tbl, "source")
    values, lens = _tokens_flat(tbl)
    # order-insensitive content key: XOR of the JVM-computed per-row hashes —
    # the lineage join key, computable on both sides of the shuffle without
    # overflow (ANSI mode); the BLAKE2b content_hash below guards the weaker
    # XOR against multiset cancellation before any plan is trusted
    row_h = tbl.column(ROW_HASH_COL).to_numpy(zero_copy_only=False).astype(np.uint64)
    content_key = (
        int(np.bitwise_xor.reduce(row_h).view(np.int64)) if len(row_h) else 0
    )
    content_hash = group_content_hash(values, doc_ids)
    # content-clustered doc ordering (config.cluster_docs): reorder docs by
    # signature so pages become codec-homogeneous. Runs AFTER the content
    # hash (keys stay order-canonical: hash is over doc_id order) and
    # BEFORE any plan/hint application (recorded boundaries refer to the
    # clustered order — replay under the same config reorders identically,
    # and cluster_docs is a mode bit so cross-config plans never match).
    if config.cluster_docs and len(lens) > 2:
        _pre_offsets = np.concatenate(([0], np.cumsum(lens)))
        _keys = _doc_signature_keys(values, _pre_offsets)
        _perm = np.argsort(_keys, kind="stable")  # stable → doc_id tiebreak
        if not np.array_equal(_perm, np.arange(len(_perm))):
            doc_ids = doc_ids.take(pa.array(_perm))
            sources = sources.take(pa.array(_perm))
            _lens_p = lens[_perm]
            _new_off = np.concatenate(([0], np.cumsum(_lens_p)))[:-1]
            _idx = (
                np.repeat(_pre_offsets[:-1][_perm] - _new_off, _lens_p)
                + np.arange(len(values))
            )
            values = values[_idx]
            lens = _lens_p
    plan = None
    _hint_rec = hints.get(content_key) if hints else None
    if _hint_rec is not None and _hint_rec[0] == content_hash:
        # explicit predefined splits OUTRANK recorded lineage: the caller is
        # asking for a specific geometry (the reference's sp argument wins
        # over its StatsDB too) — a lineage hit would silently replay the
        # old boundaries and ignore the hint. Only a hint whose STRONG hash
        # matches may outrank: a stale hint (key collision / drift) must not
        # silently disable lineage resume (ADVICE r2).
        plan_tbl, lin = None, None
    if plan_tbl is not None and plan_tbl.num_rows:
        # join-delivered lineage (scalable path): verify the strong hash
        # before trusting the plan (portability-check discipline of the
        # reference DB records, src/zopfli/deflate.c:1195-1199)
        if int(plan_tbl.column("content_hash")[0].as_py()) == content_hash:
            plan = plan_tbl.column("plan")[0].as_py()
    if plan is None and lin:
        rec = lin.get((content_key, config.mode))
        if rec is not None and rec[0] == content_hash:
            plan = rec[1]
    forced_codecs: list[str] | None = None
    val_offsets = np.concatenate(([0], np.cumsum(lens)))
    if plan is not None:
        # lineage hit: reuse recorded page boundaries + codecs (StatsDB fast
        # path, reference src/zopfli/deflate.c:1177-1211) — skips split search
        # and codec argmin; byte-identical by builder determinism.
        page_plan = struct_plan_to_pages(plan)
        row_bounds = np.concatenate(([0], np.cumsum([p[0] for p in page_plan]))).astype(np.int64)
        if row_bounds[-1] == len(lens):
            forced_codecs = [p[1] for p in page_plan]
        else:  # stale plan (hash collision or schema drift): fall through
            plan = None
    hinted = False
    if plan is None and hints:
        # predefined split points (--cbs/--cbsfile analog, reference
        # src/zopfli/zopfli.h:161-178, deflate.c:1672-1715): honor the given
        # ROW boundaries exactly — skip the split search AND the boundary-
        # moving squeeze/merge passes; the codec argmin still runs per page
        # (blocks still get their tree search in the reference). Hints are
        # content-addressed like lineage, verified by the strong hash.
        rec = hints.get(content_key)
        if rec is not None and rec[0] == content_hash:
            hb = np.asarray(rec[1], dtype=np.int64)
            if len(hb) == 0 or (hb.min() > 0 and hb.max() < len(lens)):
                row_bounds = np.unique(
                    np.concatenate(([0], hb, [len(lens)]))
                ).astype(np.int64)
                if config.hints_additional_split:
                    # --aas analog (deflate.c:1860-1884): also cost-split
                    # WITHIN each hinted segment; hinted points survive.
                    extra: list[int] = []
                    for k in range(len(row_bounds) - 1):
                        s, e = int(row_bounds[k]), int(row_bounds[k + 1])
                        if e - s > 1:
                            v0, v1 = int(val_offsets[s]), int(val_offsets[e])
                            sub = split_by_cost(
                                values[v0:v1],
                                lens[s:e],
                                config.page_budget_values,
                                config.max_pages_per_group,
                            )
                            extra.extend(int(x) + s for x in sub)
                    if extra:
                        row_bounds = np.unique(
                            np.concatenate((row_bounds, np.asarray(extra, dtype=np.int64)))
                        )
                hinted = True
    allowed_tags = _allowlist_tags(config.codec_allowlist)

    # --- group-level shared Huffman dictionary context (lazy) --------------
    # Training-set selection is CONTENT-PURE (no realized-size comparisons):
    # fixed _GH_TRAIN_WINDOW-value windows over the (clustered) value
    # stream where order-0 entropy beats every analytic codec floor by
    # ≥(1-_GH_ENTROPY_MARGIN) and cardinality is dict-header-bound, refined
    # by dropping windows whose cross-entropy under the equal-weight pooled
    # code exceeds their own H0 (distribution mismatch). Window training is
    # independent of page bounds, so (a) replay re-derives the identical
    # dictionary bytes from (content, config) alone, and (b) the dictionary
    # exists before the split search — every search stage prices the
    # group_huffman candidate in its argmin (see _encode_span), so a merge
    # that would destroy an adoption-eligible span correctly loses. WHICH
    # pages adopted is recorded per page in the plan's codec names, so no
    # adoption decision ever needs replaying.
    _gh_state: dict = {}

    def _gh_ctx() -> dict:
        if "blob" in _gh_state:
            return _gh_state
        _gh_state.update(train_group_dict(values, config))
        return _gh_state

    def _gh_syms() -> np.ndarray:
        """Group-wide symbol stream under the shared dictionary, computed
        ONCE and sliced per span: group_tokens is a pure per-value map, so a
        slice of the whole-group tokenization equals tokenizing the slice.
        Kills the per-candidate searchsorted over the dictionary that every
        split/squeeze/merge proposal used to pay."""
        if "sym" not in _gh_state:
            from .codecs.kernels import group_tokens as _gt

            _gh_state["sym"] = _gt(values, _gh_ctx()["gd"])[0]
        return _gh_state["sym"]

    def _gh_encode_values(vals: np.ndarray) -> bytes:
        """group_encoder for forced 'group_huffman' replay (pagecodec)."""
        from .codecs.kernels import encode_group_huffman, group_tokens

        ctx = _gh_ctx()
        if ctx["blob"] is None:
            raise ValueError(
                "lineage records group_huffman but the group dictionary "
                "cannot be re-derived (content/config drift)"
            )
        sym, esc_vals = group_tokens(vals, ctx["gd"])
        return encode_group_huffman(sym, esc_vals, ctx["gd"], ctx["gd"].crc)

    def _gh_split_bits() -> np.ndarray | None:
        """Per-value bit cost of the WHOLE group under the shared code —
        the split estimator's group_huffman cost column (VERDICT r5 missing
        #1: the entropy-only estimate was blind to the dictionary, so an
        initial split mixing heavy-tail with near-uniform content kept the
        zipf content inside a mixed page at ~9.4 b/v realized vs ~7.4
        achievable; four post-hoc recovery policies all measured worse than
        pricing the candidate DURING the split — BENCH.md r5). The
        dictionary is a pure function of (content, config), independent of
        page bounds (window training), so pricing it here keeps replay
        byte-identical. Escaped tokens pay their ESC code plus an estimated
        side-channel literal."""
        if not config.group_dict or not config.gh_split_pricing or (
            allowed_tags is not None and _gh_allow_tag() not in allowed_tags
        ):
            return None
        ctx = _gh_ctx()
        if ctx["blob"] is None:
            return None
        gd = ctx["gd"]
        sym = _gh_syms()
        bits = gd.lengths[sym].astype(np.float64)
        # escapes additionally ship a literal in the per-page side blob;
        # encode_simple typically lands 16-40 bits per int64 literal — 32
        # is the estimate (split-time only; codec choice stays exact-bytes)
        bits[sym == len(gd.vals)] += 32.0
        return bits

    _gh_bits_state: list = []

    def _gh_bits_cached() -> np.ndarray | None:
        """One computation feeds every split-search site: the initial split,
        the mode-grid alternate geometries, and the recompress re-split
        (sliced) — all downstream adoptions stay exact keep-if-smaller, so
        a priced estimate can only steer, never cost bytes."""
        if not _gh_bits_state:
            _gh_bits_state.append(_gh_split_bits())
        return _gh_bits_state[0]

    def _gh_allow_tag() -> int:
        from .codecs.kernels import GROUP_HUFFMAN

        return GROUP_HUFFMAN

    _rc_state: list = []

    def _rc_cached():
        """One _RangeCost per group (VERDICT r6 wrong #3): its cumulative
        structures depend only on (values, lens, gh_bits, card_term) — the
        budgets differ per split-search site, the structures don't — so the
        initial split and the mode-grid alternate geometries share one
        construction. Recompress re-splits slice the value stream and build
        their own small ones."""
        if not _rc_state:
            from .pages import _RangeCost

            _rc_state.append(
                _RangeCost(
                    values, lens, _gh_bits_cached(), card_term=config.split_card_term
                )
            )
        return _rc_state[0]

    if plan is None and not hinted:
        if config.split_mode in ("cost", "dp") and len(lens) > 1:
            bounds = split_by_cost(
                values,
                lens,
                config.page_budget_values,
                config.max_pages_per_group,
                mode="dp" if config.split_mode == "dp" else "greedy",
                gh_bits_per_value=_gh_bits_cached(),
                card_term=config.split_card_term,
                rc=_rc_cached(),
            )
        else:
            bounds = split_simple(lens, config.page_budget_values)
        row_bounds = np.unique(np.concatenate(([0], bounds, [len(lens)]))).astype(np.int64)

    # span-keyed encode memo — the longest-match-cache analog (reference
    # src/zopfli/cache.c:29-133): squeeze proposals, the merge pass, and
    # mode-grid strategies repeatedly request identical (r0, r1) spans;
    # within one group the content behind a span never changes, so the
    # (header, payload, codec, checksum) tuple is cacheable. Byte-capped so
    # a pathological proposal stream cannot blow task memory.
    _memo: dict = {}
    _memo_bytes = [0]
    _MEMO_CAP = 256 << 20
    # (r0, r1) → (losing payload, codec) for spans that adopted the group
    # dictionary in the argmin — the exact-revert set for the final
    # dict-row accounting (see _encode_span). Byte-capped like the memo; a
    # missing stash at revert time falls back to a default-flags re-encode
    # (decodes identically, possibly a few bytes above the true runner-up)
    _gh_alts: dict = {}
    _gh_alts_bytes = [0]
    _GH_ALTS_CAP = 128 << 20

    def encode_rows(
        r0: int,
        r1: int,
        forced: str | None = None,
        level: int | None = None,
        zlib_only: bool = False,
        dial: bool = False,
        budget: int | None = None,
    ):
        key = (r0, r1, forced, level, zlib_only, dial)
        hit = _memo.get(key)
        if hit is not None:
            # best-known page for the span; a budgeted caller compares sizes
            return hit
        page = _encode_span(r0, r1, forced, level, zlib_only, dial, budget=budget)
        if page is None:  # budgeted proposal lost — nothing to memoize
            return None
        if budget is None:
            # budgeted winners are not memoized: their tighter gates may
            # have pruned a candidate an unbudgeted search would pick, so
            # only full searches populate the span cache
            cost = len(page[0]) + len(page[1])
            if _memo_bytes[0] + cost <= _MEMO_CAP:
                _memo[key] = page
                _memo_bytes[0] += cost
        return page

    def _encode_span(
        r0: int,
        r1: int,
        forced: str | None = None,
        level: int | None = None,
        zlib_only: bool = False,
        dial: bool = False,
        group_ok: bool = True,
        budget: int | None = None,
    ):
        # ``dial``: mode-grid codec-dial axis — widen the Huffman admission
        # to its entropy bound and keep-if-smaller both plane strategies.
        # Zlib-family winners get level-pinned "@lvl" names (level_tag), and
        # encode_forced replays "plane_zlib@lvl" with strategy 'both', so a
        # dial winner reproduces byte-identically on lineage resume.
        v0, v1 = int(val_offsets[r0]), int(val_offsets[r1])
        page = encode_page(
            doc_ids[r0:r1],
            sources[r0:r1],
            lens[r0:r1],
            values[v0:v1],
            zlib_level=config.zlib_level if level is None else level,
            try_zlib=config.try_zlib,
            forced_codec=forced,
            level_tag=(config.zlib_level if (dial and level is None) else level),
            zlib_only=zlib_only,
            plane_strategy="both" if dial else config.plane_strategy,
            try_huffman=config.try_huffman,
            huffman_headroom=1.0 if dial else config.huffman_headroom,
            allowed=allowed_tags,
            group_encoder=_gh_encode_values,
            budget=budget,
        )
        # group_huffman candidate IN the argmin (config.group_dict): the
        # shared dictionary is fixed per group (window training, above), so
        # every span encode — first pass, squeeze proposals, merge, mode
        # grid, recompress — prices adoption on exact bytes. The losing
        # per-page payload is stashed (smallest seen per span) so the final
        # accounting can revert every adoption if the dict row itself does
        # not pay for the group. The group payload for a span is flag-
        # independent (same values → same positions → same bytes), so
        # stashing min-over-flags alts keeps the revert exact.
        if config.group_dict and group_ok and forced is None and v1 > v0:
            from .codecs.kernels import GROUP_HUFFMAN as _GH_TAG

            # the adoption candidate honors the codec allow-list like every
            # other tag (ADVICE r5 low: it bypassed allowed_tags, so a
            # decode-compat pin could silently be violated)
            ctx = _gh_ctx() if (
                allowed_tags is None or _GH_TAG in allowed_tags
            ) else {"blob": None}
            if ctx["blob"] is not None:
                from .codecs.kernels import (
                    encode_group_huffman,
                    group_huffman_size,
                )

                gd = ctx["gd"]
                sym = _gh_syms()[v0:v1]
                esc_vals = values[v0:v1][sym == len(gd.vals)]
                # escape-heavy spans never win (each escape pays the ESC
                # code plus a literal) — skip the exact sizing for them
                if len(esc_vals) * 4 < (v1 - v0):
                    if page is not None:
                        bar = len(page[1])
                    else:
                        # base argmin lost its budget; the group candidate
                        # can still win the proposal on its own
                        from .operators.pagecodec import HEADER_FLOOR

                        bar = budget - HEADER_FLOOR
                    cand_sz = group_huffman_size(sym, esc_vals, gd)
                    if cand_sz < bar and page is not None:
                        prev = _gh_alts.get((r0, r1))
                        if prev is None or len(page[1]) < len(prev[0]):
                            grow = len(page[1]) - (len(prev[0]) if prev else 0)
                            if _gh_alts_bytes[0] + grow <= _GH_ALTS_CAP:
                                _gh_alts[(r0, r1)] = (page[1], page[2])
                                _gh_alts_bytes[0] += grow
                        page = (
                            page[0],
                            encode_group_huffman(sym, esc_vals, gd, gd.crc),
                            "group_huffman",
                            page[3],
                        )
                    elif cand_sz < bar:
                        from .operators.pagecodec import build_header, page_checksum

                        header = build_header(
                            doc_ids[r0:r1], sources[r0:r1], lens[r0:r1]
                        )
                        if cand_sz + len(header) < budget:
                            page = (
                                header,
                                encode_group_huffman(sym, esc_vals, gd, gd.crc),
                                "group_huffman",
                                page_checksum(
                                    doc_ids[r0:r1],
                                    sources[r0:r1],
                                    lens[r0:r1],
                                    values[v0:v1],
                                ),
                            )
        return page

    pages = [
        encode_rows(
            int(row_bounds[k]),
            int(row_bounds[k + 1]),
            forced_codecs[k] if forced_codecs else None,
        )
        for k in range(len(row_bounds) - 1)
    ]
    refine_worthwhile = False
    if forced_codecs is None and not hinted and len(pages) >= 3:
        sizes = np.array([len(h) + len(p) for h, p, _, _ in pages], dtype=np.float64)
        nv = np.maximum(np.diff(val_offsets[row_bounds]), 1)
        bpv = sizes / nv
        # deep search only where the cheap pass left an outlier page — the
        # cost-gated deep-search discipline (reference src/zopfli/deflate.c:
        # 917-934: the expensive fixed-tree re-parse runs only on small or
        # ambiguous blocks)
        refine_worthwhile = float(np.max(bpv)) > 1.2 * float(np.median(bpv))
    if forced_codecs is None and not hinted and refine_worthwhile:
        # squeeze loop: seeded perturb-and-keep-best boundary refinement +
        # keep-if-smaller merge pass (reference src/zopfli/squeeze.c:511-655,
        # deflate.c:1728-1836)
        row_bounds, pages, _ = refine_boundaries(
            row_bounds,
            pages,
            val_offsets,
            encode_rows,
            iterations=config.iterations,
            max_unsuccessful=config.max_unsuccessful,
            seed_key=(config.seed, content_hash & 0x7FFFFFFFFFFFFFFF),
        )
    if forced_codecs is None and not hinted:
        row_bounds, pages, _ = merge_pass(
            row_bounds,
            pages,
            val_offsets,
            encode_rows,
            page_budget_values=config.page_budget_values,
        )
        # mode grid (--all analog, reference src/zopfli/deflate.c:1326-1342:
        # try every search-mode combo per block, keep the best): on groups
        # the main pass left AMBIGUOUS — uneven page costs or a poor overall
        # ratio — re-run the search under alternate split strategies and keep
        # the strictly smallest total. Content-pure, so deterministic at any
        # parallelism; the gate keeps the grid off the common path.
        sizes_now = np.array([len(h) + len(p) for h, p, _, _ in pages], dtype=np.float64)
        nv_now = np.maximum(np.diff(val_offsets[row_bounds]), 1)
        bpv_now = sizes_now / nv_now
        total_now = float(sizes_now.sum())
        # "ambiguous" = the realized cost sits well above what a PER-DOC
        # achievable estimate says the content supports. A poor ratio alone
        # is not enough (near-random data is poor AND unimprovable), and a
        # whole-group entropy sample is blind to the order structure (runs,
        # ascending) that per-doc pages would exploit — so the gate samples
        # up to 64 docs and takes each doc's cheapest of {order-0 entropy,
        # delta entropy, RLE estimate}, with a bitpack-range floor when the
        # sample is all-distinct (small samples underestimate wide-domain
        # entropy). Fires only when realized >> achievable, i.e. exactly
        # when the order-blind split estimator plausibly mis-split.
        ambiguous = False
        if config.mode_grid and len(pages) >= 2:
            realized_bpv = total_now / max(float(val_offsets[-1]), 1.0)
            if realized_bpv > 0.4:
                n_docs_g = len(lens)
                est = _achievable_bpv(values, val_offsets, n_docs_g)
                if est is not None:
                    # + per-doc metadata overhead (doc_id/lens bytes) so tiny-
                    # doc groups, whose realized cost is header-dominated by
                    # construction, don't fire spuriously
                    overhead_bpv = 6.0 * n_docs_g / max(float(val_offsets[-1]), 1.0)
                    ambiguous = est + overhead_bpv < 0.9 * realized_bpv
        if ambiguous:
            grid: list[np.ndarray] = [
                # globally-optimal-under-estimate splits (GetBestLengths DP)
                np.unique(
                    np.concatenate(
                        (
                            [0],
                            split_by_cost(
                                values,
                                lens,
                                config.page_budget_values,
                                config.max_pages_per_group,
                                mode="dp",
                                gh_bits_per_value=_gh_bits_cached(),
                                card_term=config.split_card_term,
                                rc=_rc_cached(),
                            ),
                            [len(lens)],
                        )
                    )
                ).astype(np.int64),
                # fixed-budget splits (the simple mode)
                np.unique(
                    np.concatenate(
                        ([0], split_simple(lens, config.page_budget_values), [len(lens)])
                    )
                ).astype(np.int64),
                # finer cost splits (half budget → more header, better locality)
                np.unique(
                    np.concatenate(
                        (
                            [0],
                            split_by_cost(
                                values,
                                lens,
                                max(config.page_budget_values // 2, 1),
                                config.max_pages_per_group * 2,
                                gh_bits_per_value=_gh_bits_cached(),
                                card_term=config.split_card_term,
                                rc=_rc_cached(),
                            ),
                            [len(lens)],
                        )
                    )
                ).astype(np.int64),
            ]
            for alt_bounds in grid:
                if np.array_equal(alt_bounds, row_bounds):
                    continue
                alt_pages = [
                    encode_rows(int(alt_bounds[k]), int(alt_bounds[k + 1]))
                    for k in range(len(alt_bounds) - 1)
                ]
                alt_bounds, alt_pages, _ = merge_pass(
                    alt_bounds,
                    alt_pages,
                    val_offsets,
                    encode_rows,
                    page_budget_values=config.page_budget_values,
                )
                alt_total = float(
                    sum(len(h) + len(p) for h, p, _, _ in alt_pages)
                )
                if alt_total < total_now:
                    row_bounds, pages, total_now = alt_bounds, alt_pages, alt_total
            # search-depth grid axis (the reference's --all varies the
            # SEARCH knobs per block, not just the split: deflate.c:
            # 1326-1342): one deeper squeeze round over the winning
            # geometry — doubled iterations, shifted seed stream, so the
            # proposal walk explores differently. Keep-if-smaller; the span
            # memo makes revisited spans free, so the marginal cost is only
            # genuinely new proposals.
            if len(pages) >= 3:
                # refine mutates its pages list keep-if-smaller per step, so
                # run it on a copy and adopt the result only if it improved
                deep_bounds, deep_pages, n_improved = refine_boundaries(
                    row_bounds.copy(),
                    list(pages),
                    val_offsets,
                    encode_rows,
                    iterations=2 * config.iterations,
                    max_unsuccessful=config.max_unsuccessful + 1,
                    seed_key=(config.seed ^ 0xA11, content_hash & 0x7FFFFFFFFFFFFFFF),
                )
                if n_improved:
                    row_bounds, pages = deep_bounds, deep_pages
                    total_now = float(
                        sum(len(h) + len(p) for h, p, _, _ in pages)
                    )
            # codec-dial grid axes (VERDICT r3 next #7 / reference --all:
            # deflate.c:1326-1342 varies every search dip-switch, not just
            # the split): retry each page of the winning geometry with the
            # ratio-end codec dials — huffman_headroom=1.0 (admit whenever
            # entropy alone could win) and plane_strategy='both' (exact
            # keep-if-smaller of the two DEFLATE streams). Per-page
            # keep-if-smaller on exact bytes; the span memo makes the
            # retried spans' shared work free. Skipped when the config
            # already runs at the ratio end (the retry would be a no-op).
            if config.huffman_headroom < 1.0 or config.plane_strategy != "both":
                for k in range(len(pages)):
                    r0k, r1k = int(row_bounds[k]), int(row_bounds[k + 1])
                    cur_k = len(pages[k][0]) + len(pages[k][1])
                    cand = encode_rows(r0k, r1k, dial=True, budget=cur_k)
                    if cand is not None and len(cand[0]) + len(cand[1]) < cur_k:
                        pages[k] = cand
                total_now = float(sum(len(h) + len(p) for h, p, _, _ in pages))
        # recompression passes (--pass analog, reference src/zopfli/deflate.c:
        # 1728-1836): on the worst-compressing pages, (a) RE-SPLIT on the
        # realized byte costs — the reference re-splits the encoded stream,
        # not the raw estimate — and (b) try harder zlib (level 9, both plane
        # strategies); keep each only if strictly smaller. Level-pinned
        # winners are recorded as "codec@9" so lineage resume reproduces
        # them exactly; re-splits are plain boundary changes the plan records
        # natively. The span memo makes retried spans free.
        for _ in range(config.recompress_passes):
            sizes = np.array([len(h) + len(p) for h, p, _, _ in pages], dtype=np.float64)
            nv = np.maximum(np.diff(val_offsets[row_bounds]), 1)
            bpv = sizes / nv
            med = float(np.median(bpv))
            improved_any = False
            new_bounds: list[int] = [int(row_bounds[0])]
            new_pages: list = []
            for k in range(len(pages)):
                r0, r1 = int(row_bounds[k]), int(row_bounds[k + 1])
                page, size_k = pages[k], sizes[k]
                if bpv[k] > 1.15 * med and nv[k] >= 4096:
                    # (b) full-effort zlib family on the existing span
                    cand = encode_rows(r0, r1, level=9, zlib_only=True, budget=int(size_k))
                    if cand is not None and len(cand[0]) + len(cand[1]) < size_k:
                        page, size_k = cand, len(cand[0]) + len(cand[1])
                        improved_any = True
                    # (a) re-split the outlier page: the entropy-estimate
                    # splitter ran once on the whole group; within a realized-
                    # bad page a finer cut often separates the mixture the
                    # estimate was blind to. Keep-if-smaller on exact bytes.
                    if r1 - r0 > 1:
                        v0k, v1k = int(val_offsets[r0]), int(val_offsets[r1])
                        _gb = _gh_bits_cached()
                        sub = split_by_cost(
                            values[v0k:v1k],
                            lens[r0:r1],
                            max(config.page_budget_values // 2, 1),
                            4,
                            gh_bits_per_value=_gb[v0k:v1k] if _gb is not None else None,
                            card_term=config.split_card_term,
                        )
                        sub_bounds = [r0 + int(x) for x in sub if 0 < int(x) < r1 - r0]
                        if sub_bounds:
                            cuts = [r0, *sub_bounds, r1]
                            sub_pages = [
                                encode_rows(cuts[j], cuts[j + 1])
                                for j in range(len(cuts) - 1)
                            ]
                            sub_total = sum(len(h) + len(p) for h, p, _, _ in sub_pages)
                            if sub_total < size_k:
                                new_pages.extend(sub_pages)
                                new_bounds.extend(cuts[1:])
                                improved_any = True
                                continue
                new_pages.append(page)
                new_bounds.append(r1)
            row_bounds = np.asarray(new_bounds, dtype=np.int64)
            pages = new_pages
            if not improved_any:
                break
    # --- group-dictionary final accounting (config.group_dict) -------------
    # Adoption itself happened inside the argmin (_encode_span), page by
    # page on exact bytes — the EncodeTree header-amortization idea across
    # pages (reference src/zopfli/deflate.c:118-293,299-363). Here only the
    # group-level charge is settled: the dict row ships iff the adopted
    # pages' total savings (vs their stashed runner-up payloads) beat the
    # dict row itself; otherwise every adoption reverts to its exact
    # runner-up. Replay path: forced 'group_huffman' codecs re-derive the
    # dictionary via _gh_ctx (content-pure window training).
    gd_row_payload: bytes | None = None
    if config.group_dict and forced_codecs is None:
        adopted = [k for k, pg in enumerate(pages) if pg[2] == "group_huffman"]
        if adopted:
            ctx = _gh_ctx()
            alts = [
                _gh_alts.get((int(row_bounds[k]), int(row_bounds[k + 1])))
                for k in adopted
            ]
            # a stash evicted by the byte cap → re-derive a runner-up at
            # default flags (decodes identically; at worst a few bytes over
            # the true runner-up, slightly overstating savings for a page
            # whose dial-flag encode was the real runner-up — bounded and
            # deterministic, and only reachable past the 128 MB stash cap)
            alts = [
                alt
                if alt is not None
                else (lambda pg: (pg[1], pg[2]))(
                    _encode_span(int(row_bounds[k]), int(row_bounds[k + 1]), group_ok=False)
                )
                for k, alt in zip(adopted, alts)
            ]
            total_save = sum(
                len(alt[0]) - len(pages[k][1]) for k, alt in zip(adopted, alts)
            )
            if (
                ctx["blob"] is not None
                and total_save > len(ctx["blob"]) + _GH_ROW_OVERHEAD
            ):
                gd_row_payload = ctx["blob"]
            else:
                for k, alt in zip(adopted, alts):
                    h, _p, _c, crc = pages[k]
                    pages[k] = (h, alt[0], alt[1], crc)
    elif config.group_dict and forced_codecs is not None:
        if any(c == "group_huffman" for c in forced_codecs):
            gd_row_payload = _gh_ctx()["blob"]
    enc_us_total = int((time.perf_counter() - t_enc0) * 1e6)
    # process_time: actual CPU consumed by this worker — immune to
    # descheduling, so (enc_us - enc_cpu_us) isolates scheduler/host
    # contention from genuine per-token work in the scaling artifact
    enc_cpu_us_total = int((time.process_time() - t_cpu0) * 1e6)
    total_values = max(int(val_offsets[-1]), 1)
    cols: dict[str, list] = {f.name: [] for f in _PAGES_ARROW}
    if gd_row_payload is not None:
        # the shared-dictionary row: page_id -1 sorts FIRST under the stable
        # (part_id, page_id) ordering the store writes, so it streams ahead
        # of its pages at decode — the dictionary-page-before-data-pages
        # layout of columnar formats. Empty header marks it; n_rows/n_values/
        # raw_bytes 0 keep every inventory aggregate unchanged while
        # enc_bytes charges the dictionary exactly once per group.
        import zlib as _zlib

        cols["part_id"].append(part_id)
        cols["page_id"].append(-1)
        cols["codec"].append("group_dict_store")
        cols["n_rows"].append(0)
        cols["n_values"].append(0)
        cols["first_doc_id"].append("")
        cols["last_doc_id"].append("")
        cols["raw_bytes"].append(0)
        cols["enc_bytes"].append(len(gd_row_payload))
        cols["checksum"].append(_zlib.crc32(gd_row_payload))
        cols["enc_us"].append(0)
        cols["enc_cpu_us"].append(0)
        cols["content_key"].append(content_key)
        cols["content_hash_group"].append(content_hash)
        cols["resumed"].append(1 if forced_codecs else (2 if hinted else 0))
        cols["header"].append(b"")
        cols["payload"].append(gd_row_payload)
    for page_id, (header, payload, codec, checksum) in enumerate(pages):
        r0, r1 = int(row_bounds[page_id]), int(row_bounds[page_id + 1])
        v0, v1 = int(val_offsets[r0]), int(val_offsets[r1])
        cols["part_id"].append(part_id)
        cols["page_id"].append(page_id)
        cols["codec"].append(codec)
        cols["n_rows"].append(r1 - r0)
        cols["n_values"].append(v1 - v0)
        cols["first_doc_id"].append(doc_ids[r0].as_py() if r1 > r0 else "")
        cols["last_doc_id"].append(doc_ids[r1 - 1].as_py() if r1 > r0 else "")
        cols["raw_bytes"].append(4 * (v1 - v0))
        cols["enc_bytes"].append(len(header) + len(payload))
        cols["checksum"].append(checksum)
        # wall µs attributed by value share (search cost is group-level)
        cols["enc_us"].append(int(enc_us_total * (v1 - v0) / total_values))
        cols["enc_cpu_us"].append(int(enc_cpu_us_total * (v1 - v0) / total_values))
        cols["content_key"].append(content_key)
        cols["content_hash_group"].append(content_hash)
        cols["resumed"].append(1 if forced_codecs else (2 if hinted else 0))
        cols["header"].append(header)
        cols["payload"].append(payload)
    return pa.table(
        {f.name: pa.array(cols[f.name], type=f.type) for f in _PAGES_ARROW},
        schema=_PAGES_ARROW,
    )


def encode_table(
    df: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    lineage=None,
    split_hints=None,
    total_values: int | None = None,
) -> DataFrame:
    """Encode a tokens table → encoded-pages DataFrame (lazy).

    Input schema: doc_id string, tokens array<int>, n_tok int, source string.
    One wide exchange (the group-by); the per-group search runs inside an
    Arrow-vectorized applyInArrow — Spark tasks play the role of the
    reference's block threads (src/zopfli/deflate.c:1414-1614) with stable
    (part_id, page_id) ordering instead of the in-order merge.

    ``split_hints`` (the ZopfliPredefinedSplits in-side, reference
    src/zopfli/zopfli.h:161-178): DataFrame or dict of content-addressed
    row-boundary hints (see lineage.split_hints_from_pages for the out-side).
    A hint whose strong hash matches the group's content pins the page
    boundaries exactly (codec argmin still runs); stale hints are ignored.
    Hints are boundary lists, ~bytes per group — broadcast-sized at any data
    scale (unlike lineage plans, which ride the cogroup join)."""
    ensure_shipped(df.sparkSession)
    grouped, num_groups = plan_groups(df, config, total_values=total_values)
    hints = hints_dict(split_hints)
    # task count must track GROUP count, not spark.sql.shuffle.partitions: a
    # fixed conf serializes the encode stage once num_groups outgrows it
    # (10^12 sequences → millions of groups) and pays empty python-UDF tasks
    # when far below it. repartition-by-key with an explicit count satisfies
    # the grouped-map distribution requirement, so the plan keeps exactly ONE
    # exchange (asserted in tests/test_plan_shape.py). 2× groups ≈ one group
    # per task under hash collisions (the balance the bench previously got
    # from hand-tuning the global conf).
    n_parts = max(1, 2 * num_groups)
    grouped = grouped.repartition(n_parts, F.col(GROUP_COL))
    if lineage is not None and isinstance(lineage, DataFrame):
        # scalable resume: no driver collect — per-group content keys are
        # aggregated JVM-side, equi-joined against the lineage table, and the
        # matching plans cogrouped into the encode UDF (one tiny extra
        # shuffle of plan rows; nothing is broadcast through the driver)
        keys = grouped.groupBy(GROUP_COL).agg(
            F.bit_xor(F.col(ROW_HASH_COL)).alias("content_key")
        ).select(
            # fresh attribute ids: the cogroup below would otherwise see an
            # ambiguous self-join on the group column
            (F.col(GROUP_COL) + F.lit(0)).cast("int").alias(GROUP_COL),
            F.col("content_key"),
        )
        plans = (
            keys.join(
                lineage.filter(F.col("mode") == F.lit(config.mode)),
                "content_key",
            )
            .select(GROUP_COL, "content_hash", "plan")
            .repartition(n_parts, F.col(GROUP_COL))
        )
        return (
            grouped.groupBy(GROUP_COL)
            .cogroup(plans.groupBy(GROUP_COL))
            .applyInArrow(
                lambda left, right: _encode_group(
                    left, config, plan_tbl=right, hints=hints
                ),
                schema=PAGES_SCHEMA,
            )
        )
    lin = lineage_dict(lineage)
    return grouped.groupBy(GROUP_COL).applyInArrow(
        lambda tbl: _encode_group(tbl, config, lin, hints=hints),
        schema=PAGES_SCHEMA,
    )


def decode_table(
    pages: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    input_partitions: int | None = None,
) -> DataFrame:
    """Decode encoded pages back to the original tokens table (lazy).

    Pages are independent → mapInArrow (narrow, no shuffle); decoded token
    arrays are emitted as flat Arrow list buffers (no per-row boxing).

    ``input_partitions``: partition count of a STORE-BACKED pages input
    (e.g. ``store.store_partition_count``). When supplied and clearly
    over-partitioned, the scan is coalesced to cluster parallelism. Never
    probed from the plan itself: ``.rdd.getNumPartitions()`` on a fused
    encode→decode pipeline materializes upstream shuffle stages at
    plan-construction time under AQE AND would coalesce away the
    one-group-per-task balance encode_table arranges (ADVICE r2 medium)."""
    ensure_shipped(pages.sparkSession)
    verify = config.verify_checksums

    # list<int32> offsets are 32-bit: cap accumulated values per OUTPUT batch
    # well below 2^31 (a few hundred MB of tokens) — one Arrow input batch of
    # big pages can otherwise overflow the cumsum into garbage offsets
    _FLUSH_VALUES = 1 << 27

    def dec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # batch OUTPUT across pages, not per page: thousands of tiny
        # per-page RecordBatches cost more in Arrow IPC framing + JVM-side
        # batch handling than the decode kernels themselves

        def flush(docs_l, srcs_l, lens_l, vals_l):
            lens_cat = np.concatenate(lens_l)
            offsets = np.zeros(len(lens_cat) + 1, dtype=np.int64)
            np.cumsum(lens_cat, out=offsets[1:])
            if offsets[-1] > np.iinfo(np.int32).max:
                raise ValueError("decode batch exceeds int32 list offsets")
            tokens = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32)),
                pa.array(np.concatenate(vals_l), type=pa.int32()),
            )
            return pa.RecordBatch.from_arrays(
                [
                    pa.concat_arrays(docs_l),  # StringArrays: one buffer copy
                    tokens,
                    pa.array(lens_cat.astype(np.int32)),
                    pa.concat_arrays(srcs_l),
                ],
                schema=_DECODED_ARROW,
            )

        # group-dictionary streaming state: a dict row (empty header, page_id
        # -1) precedes its group's pages within every partition — emission
        # order from encode_table, (part_id, page_id) sortWithinPartitions in
        # the store, and parquet's in-file row order all preserve this, and
        # coalesce() concatenates source partitions without reordering.
        # Store files are written as ONE parquet row group (store.write_pages)
        # and row groups are Spark's scan-split atom, so a scan can never
        # split a group away from its dictionary at any file size. A
        # group_huffman page whose dictionary is absent or crc-mismatched
        # raises loudly (decode_page) — e.g. after an arbitrary repartition;
        # keep pages grouped by part_id with page_id order intact.
        cur_gd = None
        for b in batches:
            headers = b.column(b.schema.get_field_index("header"))
            payloads = b.column(b.schema.get_field_index("payload"))
            checksums = b.column(b.schema.get_field_index("checksum"))
            docs_l, srcs_l, lens_l, vals_l = [], [], [], []
            acc_values = 0
            for header, payload, checksum in zip(headers, payloads, checksums):
                hdr = header.as_py()
                if len(hdr) == 0:
                    import zlib as _zlib

                    from .codecs.kernels import GroupDict

                    blob = payload.as_py()
                    if verify and _zlib.crc32(blob) != int(checksum.as_py()):
                        raise ValueError("group dictionary row checksum mismatch")
                    cur_gd = GroupDict(blob)
                    continue
                doc_ids, sources, lens, values = decode_page(
                    hdr,
                    payload.as_py(),
                    int(checksum.as_py()) if verify else None,
                    split_rows=False,
                    group_dict=cur_gd,
                )
                docs_l.append(doc_ids)
                srcs_l.append(sources)
                lens_l.append(lens)
                vals_l.append(values)
                acc_values += len(values)
                if acc_values >= _FLUSH_VALUES:
                    yield flush(docs_l, srcs_l, lens_l, vals_l)
                    docs_l, srcs_l, lens_l, vals_l = [], [], [], []
                    acc_values = 0
            if docs_l:
                yield flush(docs_l, srcs_l, lens_l, vals_l)

    cols = ["header", "payload", "checksum"]
    selected = pages.select(*cols)
    # a store-backed pages scan often has far more file-partitions than pages
    # worth decoding. Every python-UDF task costs ~10-20 ms even when empty;
    # at 256 partitions that overhead was 4x the decode kernels themselves.
    # Coalesce (narrow, no shuffle) to cluster parallelism — but ONLY when
    # the caller says the input is store-backed and clearly over-partitioned
    # (> 4x cores). Measured: 3.4 s -> 0.8 s for a 30.7M-token decode of
    # stored pages on local[32].
    par = pages.sparkSession.sparkContext.defaultParallelism
    if input_partitions is not None and par > 0 and input_partitions > 4 * par:
        selected = selected.coalesce(par)
    return selected.mapInArrow(dec, schema=DECODED_SCHEMA)


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
            # a sub-µs page floors enc_us to 0; clamp to 1µs so the ANSI
            # divide never trips (observed with tiny allow-listed pages)
            "tokens_per_sec",
            F.col("n_values")
            / (F.greatest(F.col("enc_us"), F.lit(1)) / F.lit(1_000_000.0)),
        )
    )
