#!/usr/bin/env python
"""Offline simulation: would a group-level shared dictionary shrink the
mixture at the ratio() notch? No Spark — builds one group the way the
planner would, splits it with the ratio-profile geometry, encodes every
page with encode_best, then re-encodes each page as positions into a shared
group dictionary and compares exact bytes."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zopfli_spark.codecs.kernels import encode_best, encode_simple, blob_codec_name
from zopfli_spark.datagen import gen_docs
from zopfli_spark.pages import split_by_cost

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
SEED = 42

df = gen_docs(np.arange(10, 10 + N_DOCS), SEED)
df = df.sort_values("doc_id")
values = np.concatenate([t for t in df["tokens"] if len(t)]).astype(np.int64)
lens = df["n_tok"].to_numpy().astype(np.int64)
print(f"group: {len(lens)} docs, {len(values)} values", file=sys.stderr)

GROUPS = []
# carve into 2M-value groups like the planner
cum = np.concatenate(([0], np.cumsum(lens)))
start = 0
for budget_end in range(1, len(lens) + 1):
    if cum[budget_end] - cum[start] >= (1 << 21) or budget_end == len(lens):
        GROUPS.append((start, budget_end))
        start = budget_end

kw = dict(zlib_level=9, plane_strategy="both", try_huffman=True, huffman_headroom=1.0)

tot_cur = tot_gd = tot_dictblob = 0
t0 = time.time()
for gi, (s, e) in enumerate(GROUPS):
    v0, v1 = int(cum[s]), int(cum[e])
    gv = values[v0:v1]
    gl = lens[s:e]
    bounds = split_by_cost(gv, gl, 1 << 20, 1024)
    rb = np.unique(np.concatenate(([0], bounds, [len(gl)]))).astype(np.int64)
    voff = np.concatenate(([0], np.cumsum(gl)))
    guniq = np.unique(gv)
    pos = np.searchsorted(guniq, gv).astype(np.int64)
    dict_blob = encode_best(guniq, **kw)
    cur_sz, gd_sz, n_adopt, codec_from, codec_to = 0, 0, 0, {}, {}
    for k in range(len(rb) - 1):
        a, b = int(voff[rb[k]]), int(voff[rb[k + 1]])
        if a == b:
            continue
        cur = encode_best(gv[a:b], **kw)
        cand = encode_best(pos[a:b], **kw)
        cand_full = 1 + 4 + 4 + len(cand)
        cur_sz += len(cur)
        if cand_full < len(cur):
            gd_sz += cand_full
            n_adopt += 1
            codec_from[blob_codec_name(cur)] = codec_from.get(blob_codec_name(cur), 0) + len(cur) - cand_full
            codec_to[blob_codec_name(cand)] = codec_to.get(blob_codec_name(cand), 0) + 1
        else:
            gd_sz += len(cur)
    savings = cur_sz - gd_sz
    adopt = savings > len(dict_blob) + 48
    tot_cur += cur_sz
    tot_gd += gd_sz + (len(dict_blob) + 48 if adopt else 0) if adopt else cur_sz
    tot_dictblob += len(dict_blob) if adopt else 0
    print(
        f"group {gi}: {len(rb)-1} pages card={len(guniq)} cur={cur_sz} "
        f"gd={gd_sz}+dict{len(dict_blob)} adopt={adopt} n_adopt={n_adopt} "
        f"save_by_codec={codec_from} to={codec_to}",
        file=sys.stderr,
    )

print(
    f"TOTAL payload: cur={tot_cur} with_gd={tot_gd} "
    f"delta={(tot_cur - tot_gd) / tot_cur * 100:.2f}% dictblobs={tot_dictblob} "
    f"({time.time()-t0:.1f}s)"
)
