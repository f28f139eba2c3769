#!/usr/bin/env python
"""Offline simulation: does content-clustered doc ordering within a group
(sort docs by a cheap content signature before page splitting) shrink the
mixture at the ratio() notch? Compares exact encode_best bytes, same docs,
same group budgets, doc_id order vs signature order."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zopfli_spark.codecs.kernels import encode_best, blob_codec_name
from zopfli_spark.datagen import gen_docs
from zopfli_spark.pages import split_by_cost

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
SEED = 42

df = gen_docs(np.arange(10, 10 + N_DOCS), SEED)
df = df.sort_values("doc_id").reset_index(drop=True)
toks = list(df["tokens"])
lens_all = df["n_tok"].to_numpy().astype(np.int64)


def doc_signature(t: np.ndarray) -> tuple:
    """Cheap per-doc content signature for clustering: (log2 range bucket,
    run-ratio bucket, distinct-ratio bucket, mean-abs-delta bucket)."""
    n = len(t)
    if n == 0:
        return (0, 0, 0, 0)
    t64 = t.astype(np.int64)
    rng_b = int(np.log2(max(int(t64.max()) - int(t64.min()), 1) + 1))
    d = np.diff(t64)
    runs = 1 + int(np.count_nonzero(d)) if n > 1 else 1
    run_b = int(8 * runs / n)  # 0..8
    samp = t64[:: max(1, n // 256)]
    dist_b = int(8 * len(np.unique(samp)) / len(samp))
    mad = float(np.abs(d).mean()) if n > 1 else 0.0
    mad_b = int(np.log2(mad + 1))
    return (rng_b, run_b, dist_b, mad_b)


kw = dict(zlib_level=9, plane_strategy="both", try_huffman=True, huffman_headroom=1.0)


def encode_order(order: np.ndarray, label: str) -> int:
    lens = lens_all[order]
    values = np.concatenate([toks[i] for i in order if len(toks[i])]).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)))
    # carve into 2M groups
    groups, start = [], 0
    for e in range(1, len(lens) + 1):
        if cum[e] - cum[start] >= (1 << 21) or e == len(lens):
            groups.append((start, e))
            start = e
    total = 0
    by_codec: dict[str, int] = {}
    npages = 0
    for s, e in groups:
        gv = values[int(cum[s]) : int(cum[e])]
        gl = lens[s:e]
        bounds = split_by_cost(gv, gl, 1 << 20, 1024)
        rb = np.unique(np.concatenate(([0], bounds, [len(gl)]))).astype(np.int64)
        voff = np.concatenate(([0], np.cumsum(gl)))
        for k in range(len(rb) - 1):
            a, b = int(voff[rb[k]]), int(voff[rb[k + 1]])
            if a == b:
                continue
            blob = encode_best(gv[a:b], **kw)
            total += len(blob)
            npages += 1
            c = blob_codec_name(blob)
            by_codec[c] = by_codec.get(c, 0) + len(blob)
    print(f"{label}: payload={total} pages={npages} by_codec={by_codec}", file=sys.stderr)
    return total


t0 = time.time()
base_order = np.arange(len(toks))
sigs = [doc_signature(np.asarray(t)) for t in toks]
clust_order = np.array(
    sorted(range(len(toks)), key=lambda i: (sigs[i], df["doc_id"][i]))
)
a = encode_order(base_order, "doc_id order")
b = encode_order(clust_order, "clustered    ")
print(f"TOTAL: base={a} clustered={b} delta={(a - b) / a * 100:.2f}%  ({time.time()-t0:.1f}s)")
