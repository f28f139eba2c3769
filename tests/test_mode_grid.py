"""Mode-grid search (--all analog, reference src/zopfli/deflate.c:1326-1342)
and squeeze-loop stats blending (AddWeighedStatFreqs, squeeze.c:64-77):
alternate split strategies on groups the gate calls ambiguous, keep-if-
smaller; the gate must not fire on incompressible content."""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pytest

from zopfli_spark.config import EngineConfig
from zopfli_spark.engine import _encode_group
from zopfli_spark.plans.planner import GROUP_COL, ROW_HASH_COL

BUDGET = 32768
CFG = EngineConfig(
    page_budget_values=BUDGET,
    group_budget_values=BUDGET * 8,
    giant_doc_values=BUDGET * 4,
    mode_grid=True,
)


def _tbl(docs):
    n = len(docs)
    return pa.table(
        {
            "doc_id": pa.array([f"doc_{i:04d}" for i in range(n)]),
            "tokens": pa.array([d.tolist() for d in docs], pa.list_(pa.int32())),
            "n_tok": pa.array([len(d) for d in docs], pa.int32()),
            "source": pa.array(["t"] * n),
            GROUP_COL: pa.array([0] * n, pa.int32()),
            ROW_HASH_COL: pa.array(list(range(n)), pa.int64()),
        }
    )


def _total(out):
    return sum(out.column("enc_bytes").to_pylist())


@pytest.fixture(scope="module")
def order_blind_group():
    """6 ascending + 2 shuffled docs over the SAME value range: the bucketed
    split estimator is order-blind, so the first pass mixes them; per-doc
    pages (which the grid's finer alternative finds) compress far better."""
    rng = np.random.default_rng(5)
    half = BUDGET // 2
    docs = []
    for i in range(8):
        if i in (3, 6):
            docs.append(rng.integers(0, 1 << 24, half, dtype=np.int64).astype(np.int32))
        else:
            docs.append(np.cumsum(rng.integers(1, 2049, half)).astype(np.int32))
    return docs


def test_grid_wins_on_order_blind_group(order_blind_group):
    on = _encode_group(_tbl(order_blind_group), CFG)
    off = _encode_group(
        _tbl(order_blind_group), dataclasses.replace(CFG, mode_grid=False)
    )
    assert _total(on) < _total(off), "grid must beat the order-blind first pass"
    assert "delta_bitpack" in set(on.column("codec").to_pylist())


def test_grid_identical_when_it_cannot_help():
    """Pure near-random content: the per-doc achievable gate must not fire
    (and even if an alternative ran, keep-if-smaller keeps the original)."""
    rng = np.random.default_rng(9)
    docs = [
        rng.integers(0, 1 << 24, BUDGET // 2, dtype=np.int64).astype(np.int32)
        for _ in range(8)
    ]
    on = _encode_group(_tbl(docs), CFG)
    off = _encode_group(_tbl(docs), dataclasses.replace(CFG, mode_grid=False))
    assert _total(on) == _total(off)


def test_grid_result_is_deterministic(order_blind_group):
    a = _encode_group(_tbl(order_blind_group), CFG)
    b = _encode_group(_tbl(order_blind_group), CFG)
    assert a.column("checksum").to_pylist() == b.column("checksum").to_pylist()
    assert _total(a) == _total(b)


def test_split_mode_dp_roundtrips_and_dominates_estimate():
    """split_mode='dp' (GetBestLengths forward DP + TraceBackwards analog):
    the DP segmentation never exceeds the greedy driver's total ESTIMATED
    cost, honors the 2x-budget memory bound, and the full encode→page
    decode stays bit-identical."""
    import numpy as np
    from zopfli_spark.pages import _RangeCost, split_by_cost, split_dp

    rng = np.random.default_rng(11)
    n_docs = 120
    lens = rng.integers(50, 2000, n_docs).astype(np.int64)
    vals = []
    for i in range(n_docs):
        k = i % 3
        n = int(lens[i])
        if k == 0:
            v = rng.zipf(1.3, n).astype(np.int64) % 50000
        elif k == 1:
            v = np.arange(n) + int(rng.integers(0, 1000))
        else:
            v = rng.integers(0, 1 << 30, n)
        lens[i] = len(v)
        vals.append(v.astype(np.int32))
    values = np.concatenate(vals)
    budget = 32768
    rc = _RangeCost(values, lens)
    dp = split_dp(rc, lens, budget)
    greedy = split_by_cost(values, lens, budget, 64)

    def est(bounds):
        bs = [0, *bounds.tolist(), n_docs]
        return sum(rc.cost_bits(bs[k], bs[k + 1]) for k in range(len(bs) - 1))

    assert est(dp) <= est(greedy) + 1e-6
    cum = np.concatenate(([0], np.cumsum(lens)))
    bs = [0, *dp.tolist(), n_docs]
    for k in range(len(bs) - 1):
        if bs[k + 1] - bs[k] > 1:
            assert cum[bs[k + 1]] - cum[bs[k]] <= 2 * budget

    cfg_dp = dataclasses.replace(CFG, split_mode="dp", mode_grid=False)
    docs = [values[cum[i]:cum[i + 1]] for i in range(n_docs)]
    out = _encode_group(_tbl(docs), cfg_dp)
    from zopfli_spark.operators.pagecodec import decode_page
    decoded = []
    for r in sorted(
        (dict(zip(out.schema.names, row)) for row in zip(*(c.to_pylist() for c in out.columns))),
        key=lambda d: d["page_id"],
    ):
        _, _, _, vv = decode_page(r["header"], r["payload"], r["checksum"], split_rows=False)
        decoded.append(vv)
    flat = np.concatenate(decoded)
    assert np.array_equal(flat, values.astype(flat.dtype))
