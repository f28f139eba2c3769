"""Cost-model utilities: Shannon entropy and length-limited Huffman lengths.

* :func:`entropy_bits` — the canonical bit-cost model of the reference
  (``ZopfliCalculateEntropy``, reference src/zopfli/tree.c:66-88): per-symbol
  cost ``log2(total) - log2(count)``, zero counts priced as ``log2(total)``,
  negatives clamped.
* :func:`package_merge` — optimal length-limited prefix-code lengths by the
  boundary package-merge algorithm (Katajainen/Moffat/Turpin '95 — the same
  published algorithm behind ``ZopfliLengthLimitedCodeLengths``, reference
  src/zopfli/katajainen.c:191-283). Used as the achievable-Huffman cost model
  (what an entropy coder can really reach with integer code lengths, vs the
  fractional Shannon bound) for codec gating and metrics.

Pure numpy/Python over per-page histograms — page-local work, never wide.
"""

from __future__ import annotations

import numpy as np


def entropy_bits(counts: np.ndarray) -> float:
    """Shannon bits to code the histogram (fractional lower bound)."""
    counts = np.asarray(counts, dtype=np.float64)
    total = counts.sum()
    if total == 0:
        return 0.0
    nz = counts[counts > 0]
    return float(total * np.log2(total) - (nz * np.log2(nz)).sum())


def package_merge(counts: np.ndarray, maxbits: int = 15) -> np.ndarray:
    """Optimal code lengths (≤ maxbits) for positive-frequency symbols.

    Boundary package-merge: run maxbits rounds from the deepest level up;
    each round pairs adjacent items into packages and merges them with the
    leaves. A leaf selected at a level costs one bit of depth — the classic
    coin-collector formulation. Zero-count symbols get length 0.

    Returns int array of code lengths, same shape as ``counts``. Raises if
    the alphabet cannot fit in ``maxbits`` (2^maxbits < n_nonzero), matching
    the reference's error return (src/zopfli/katajainen.c:218-237).
    """
    counts = np.asarray(counts, dtype=np.int64)
    nz_idx = np.flatnonzero(counts > 0)
    n = len(nz_idx)
    lengths = np.zeros(len(counts), dtype=np.int64)
    if n == 0:
        return lengths
    if n == 1:
        lengths[nz_idx] = 1
        return lengths
    if (1 << maxbits) < n:
        raise ValueError(f"maxbits={maxbits} too small for {n} symbols")
    order = nz_idx[np.argsort(counts[nz_idx], kind="stable")]
    leaf_w = counts[order].astype(np.int64)

    # items: (weight, leaf-count vector over the n sorted leaves)
    leaves = [(int(leaf_w[i]), i) for i in range(n)]
    level_items: list[tuple[int, np.ndarray]] = []
    for _ in range(maxbits):
        merged: list[tuple[int, np.ndarray]] = []
        # package pairs from the previous (deeper) level
        for j in range(0, len(level_items) - 1, 2):
            w = level_items[j][0] + level_items[j + 1][0]
            c = level_items[j][1] + level_items[j + 1][1]
            merged.append((w, c))
        # merge packages with the leaves of this level (stable by weight,
        # leaves first on ties — reference comparator katajainen.c:168-189)
        items: list[tuple[int, np.ndarray]] = []
        li, mi = 0, 0
        while li < n or mi < len(merged):
            take_leaf = mi >= len(merged) or (
                li < n and int(leaf_w[li]) <= merged[mi][0]
            )
            if take_leaf:
                v = np.zeros(n, dtype=np.int64)
                v[li] = 1
                items.append((int(leaf_w[li]), v))
                li += 1
            else:
                items.append(merged[mi])
                mi += 1
        level_items = items
    # take the cheapest 2n-2 items of the top level; each inclusion of a
    # leaf adds one bit to its depth
    depth = np.zeros(n, dtype=np.int64)
    for w, c in level_items[: 2 * n - 2]:
        depth += c
    lengths[order] = depth
    return lengths


def huffman_cost_bits(counts: np.ndarray, maxbits: int = 15) -> float:
    """Total bits under optimal length-limited Huffman coding — the
    achievable integer-length counterpart of :func:`entropy_bits`."""
    counts = np.asarray(counts, dtype=np.int64)
    lengths = package_merge(counts, maxbits)
    return float((counts * lengths).sum())
