"""Focused tests for the r7 optimization internals: budgeted candidate
encodes, exponential merge absorption, the one-pass dict_shift sweep, group
tokenization slicing, and the plane-strategy carve-out. All assert byte- or
decision-level equivalence with the unoptimized semantics."""

import numpy as np
import pytest

from zopfli_spark.codecs.kernels import (
    GroupDict,
    _dict_shift_best_s,
    decode_blob,
    encode_best,
    encode_group_dict,
    group_tokens,
)
from zopfli_spark.operators.pagecodec import HEADER_FLOOR, encode_page
from zopfli_spark.squeeze import merge_pass


def _rng(seed=0):
    return np.random.Generator(np.random.PCG64(seed))


# ---------------------------------------------------------------------------
# encode_best budget semantics
# ---------------------------------------------------------------------------


def test_budget_none_matches_unbudgeted_bytes():
    rng = _rng(1)
    cases = [
        rng.integers(0, 50, 5000).astype(np.int32),          # dict/huffman
        np.cumsum(rng.integers(1, 4, 5000)).astype(np.int32),  # delta
        np.repeat(rng.integers(0, 1000, 50), 100).astype(np.int32),  # rle
        rng.integers(0, 2**30, 5000).astype(np.int32),       # wide bitpack
    ]
    for v in cases:
        assert encode_best(v) == encode_best(v, budget=None)


def test_budget_huge_returns_same_blob():
    rng = _rng(2)
    for v in (
        rng.integers(0, 97, 4000).astype(np.int32),
        np.cumsum(rng.integers(1, 3, 4000)).astype(np.int32),
    ):
        full = encode_best(v)
        budgeted = encode_best(v, budget=len(full) + 10_000)
        assert budgeted == full


def test_budget_unbeatable_returns_none():
    rng = _rng(3)
    v = rng.integers(0, 2**30, 4096).astype(np.int32)  # near-incompressible
    full = encode_best(v)
    assert encode_best(v, budget=len(full) // 4) is None
    # a returned blob always beats its budget strictly
    got = encode_best(v, budget=len(full) + 1)
    assert got is not None and len(got) < len(full) + 1


def test_budget_result_always_decodes():
    rng = _rng(4)
    v = rng.integers(0, 500, 3000).astype(np.int32)
    full = encode_best(v)
    for budget in (len(full) + 1, len(full) * 2, 10**9):
        blob = encode_best(v, budget=budget)
        assert blob is not None
        assert np.array_equal(decode_blob(blob, len(v)), v.astype(np.int64))


def test_encode_page_budget_floor_is_safe():
    # HEADER_FLOOR must lower-bound every real header: a page that fits its
    # budget must never be rejected by the floor
    rng = _rng(5)
    doc_ids = np.array([f"doc_{i:09d}" for i in range(8)], dtype=object)
    sources = np.array(["s"] * 8, dtype=object)
    lens = np.full(8, 64, dtype=np.int64)
    values = rng.integers(0, 97, 8 * 64).astype(np.int32)
    page = encode_page(doc_ids, sources, lens, values)
    total = len(page[0]) + len(page[1])
    assert len(page[0]) >= HEADER_FLOOR
    again = encode_page(doc_ids, sources, lens, values, budget=total + 1)
    assert again is not None
    assert again[:3] == page[:3] and again[3] == page[3]
    assert encode_page(doc_ids, sources, lens, values, budget=total) is None


# ---------------------------------------------------------------------------
# exponential merge absorption
# ---------------------------------------------------------------------------


def _fake_encode_fn(val_offsets, header_cost=40):
    """Payload = 1 byte/value + a fixed per-page header: every merge of two
    pages saves exactly one header, so a chain of small pages must collapse
    fully — the header-amortization case the pass exists for."""

    def fn(r0, r1, budget=None):
        nv = int(val_offsets[r1] - val_offsets[r0])
        size = header_cost + nv
        if budget is not None and size >= budget:
            return None
        return (b"h" * header_cost, b"p" * nv, "plain", 0)

    return fn


def test_merge_collapses_chain_fully():
    n_pages = 37
    lens = np.full(n_pages, 10, dtype=np.int64)
    val_offsets = np.concatenate(([0], np.cumsum(np.repeat(lens, 1))))
    bounds = np.arange(n_pages + 1, dtype=np.int64)
    fn = _fake_encode_fn(val_offsets)
    pages = [fn(i, i + 1) for i in range(n_pages)]
    new_bounds, new_pages, merged = merge_pass(
        bounds, pages, val_offsets, fn, page_budget_values=10_000
    )
    assert len(new_pages) == 1
    assert merged == n_pages - 1
    assert list(new_bounds) == [0, n_pages]


def test_merge_counts_candidate_encodes_subquadratically():
    # the r6 walk paid O(k^2) span values on a fully-merging chain; the
    # exponential absorption must stay well under that
    n_pages = 64
    val_offsets = np.arange(n_pages + 1, dtype=np.int64) * 100
    bounds = np.arange(n_pages + 1, dtype=np.int64)
    calls = []
    base = _fake_encode_fn(val_offsets)

    def counting(r0, r1, budget=None):
        calls.append(int(val_offsets[r1] - val_offsets[r0]))
        return base(r0, r1, budget=budget)

    pages = [base(i, i + 1) for i in range(n_pages)]
    _, new_pages, _ = merge_pass(
        bounds, pages, val_offsets, counting, page_budget_values=10**9
    )
    assert len(new_pages) == 1
    quadratic = sum(range(2, n_pages + 1)) * 100  # old-walk span values
    assert sum(calls) < quadratic / 3  # doubling: O(k log k)


def test_merge_respects_budget_and_gates():
    # pages whose merge never pays (no header amortization) stay separate
    val_offsets = np.array([0, 100, 200, 300], dtype=np.int64)
    bounds = np.array([0, 1, 2, 3], dtype=np.int64)

    def fn(r0, r1, budget=None):
        nv = int(val_offsets[r1] - val_offsets[r0])
        size = 2 * nv  # merging is never smaller than the parts
        if budget is not None and size >= budget:
            return None
        return (b"", b"x" * size, "plain", 0)

    pages = [fn(i, i + 1) for i in range(3)]
    new_bounds, new_pages, merged = merge_pass(
        bounds, pages, val_offsets, fn, page_budget_values=10**9
    )
    assert merged == 0 and len(new_pages) == 3


# ---------------------------------------------------------------------------
# one-pass dict_shift sweep == the per-shift reference loop
# ---------------------------------------------------------------------------


def _dict_shift_reference(uniq: np.ndarray, n: int):
    from zopfli_spark.codecs.bitio import bit_width

    best_s, best_est = None, np.inf
    vmin, vmax = int(uniq[0]), int(uniq[-1])
    for s in range(1, 25):
        if 14.0 + n * s / 8.0 >= best_est:
            break
        q = uniq >> s
        cardq = 1 + int(np.count_nonzero(np.diff(q)))
        entry_w = bit_width(max((vmax >> s) - (vmin >> s), 1))
        est = 14.0 + cardq * entry_w / 8.0 + n * (bit_width(max(cardq - 1, 1)) + s) / 8.0
        if est < best_est:
            best_s, best_est = s, est
        if cardq <= 2:
            break
    return best_s, best_est


@pytest.mark.parametrize("seed", range(8))
def test_dict_shift_sweep_matches_reference(seed):
    rng = _rng(seed)
    kind = seed % 4
    if kind == 0:
        v = rng.integers(0, 2**20, 4000)
    elif kind == 1:
        v = (rng.integers(0, 500, 4000) << 7) + rng.integers(0, 128, 4000)
    elif kind == 2:
        v = rng.integers(-(2**18), 2**18, 4000)  # negatives: sign-split path
    else:
        v = rng.zipf(1.3, 4000).clip(0, 2**28)
    uniq = np.unique(v.astype(np.int64))
    if len(uniq) < 2:
        pytest.skip("degenerate draw")
    assert _dict_shift_best_s(uniq, len(v)) == _dict_shift_reference(uniq, len(v))


# ---------------------------------------------------------------------------
# group tokenization: whole-group slice == per-span tokenization
# ---------------------------------------------------------------------------


def test_group_tokens_slicing_equivalence():
    rng = _rng(11)
    vocab = np.unique(rng.integers(0, 10_000, 600).astype(np.int64))
    counts = rng.integers(1, 100, len(vocab))
    gd = GroupDict(encode_group_dict(vocab, counts))
    values = rng.choice(
        np.concatenate([vocab, rng.integers(20_000, 30_000, 50)]), 5000
    ).astype(np.int32)
    sym_full, _ = group_tokens(values, gd)
    for lo, hi in ((0, 5000), (123, 4567), (4000, 4001), (2500, 2500)):
        sym_span, esc_span = group_tokens(values[lo:hi], gd)
        assert np.array_equal(sym_full[lo:hi], sym_span)
        esc_slice = values[lo:hi][sym_full[lo:hi] == len(gd.vals)]
        assert np.array_equal(esc_slice.astype(np.int64), esc_span)
