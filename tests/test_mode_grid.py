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
