#!/usr/bin/env python
"""Offline simulation: group-level shared Huffman dictionary+table.

Train canonical code lengths on the GROUP histogram, share (uniq values +
lengths) once per group; each adopting page emits only miniblock offsets +
bitstream. Exact byte accounting, keep-if-smaller per page, dict-row cost
charged on adoption. Compares against the current per-page encode_best at
the ratio() dials."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from zopfli_spark.codecs.kernels import (
    _HUFF_K,
    encode_best,
    encode_simple,
    blob_codec_name,
)
from zopfli_spark.datagen import gen_docs
from zopfli_spark.model import package_merge
from zopfli_spark.pages import split_by_cost

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
MAXBITS = 17
SEED = 42

df = gen_docs(np.arange(10, 10 + N_DOCS), SEED)
df = df.sort_values("doc_id").reset_index(drop=True)
values = np.concatenate([t for t in df["tokens"] if len(t)]).astype(np.int64)
lens = df["n_tok"].to_numpy().astype(np.int64)

kw = dict(zlib_level=9, plane_strategy="both", try_huffman=True, huffman_headroom=1.0)

cum = np.concatenate(([0], np.cumsum(lens)))
groups, start = [], 0
for e in range(1, len(lens) + 1):
    if cum[e] - cum[start] >= (1 << 21) or e == len(lens):
        groups.append((start, e))
        start = e

t0 = time.time()
tot_cur = tot_new = 0
for gi, (s, e) in enumerate(groups):
    gv = values[int(cum[s]) : int(cum[e])]
    gl = lens[s:e]
    bounds = split_by_cost(gv, gl, 1 << 20, 1024)
    rb = np.unique(np.concatenate(([0], bounds, [len(gl)]))).astype(np.int64)
    voff = np.concatenate(([0], np.cumsum(gl)))
    guniq, ginv = np.unique(gv, return_inverse=True)
    gcounts = np.bincount(ginv)
    glen = package_merge(gcounts, MAXBITS)
    dict_blob = encode_simple(guniq)
    lt_blob = encode_best(np.asarray(glen, dtype=np.int64), try_zlib=True)
    dict_row = 1 + 4 + 1 + 4 + len(dict_blob) + len(lt_blob) + 48
    cur_sz = new_sz = 0
    n_adopt = 0
    adopters_from: dict[str, int] = {}
    for k in range(len(rb) - 1):
        a, b = int(voff[rb[k]]), int(voff[rb[k + 1]])
        if a == b:
            continue
        cur = encode_best(gv[a:b], **kw)
        cur_sz += len(cur)
        # exact GROUP_HUFFMAN candidate size: tag+crc + K + offsets + bits
        inv_pg = ginv[a : b]
        tl = glen[inv_pg]
        total_bits = int(tl.sum())
        n_off = max(1, ((b - a) + _HUFF_K - 1) // _HUFF_K)
        starts = np.cumsum(tl) - tl
        off_blob = encode_simple(starts[::_HUFF_K])
        cand = 1 + 4 + 2 + 4 + len(off_blob) + 4 + (total_bits + 7) // 8
        if cand < len(cur):
            new_sz += cand
            n_adopt += 1
            c = blob_codec_name(cur)
            adopters_from[c] = adopters_from.get(c, 0) + len(cur) - cand
        else:
            new_sz += len(cur)
    adopt = (cur_sz - new_sz) > dict_row
    tot_cur += cur_sz
    tot_new += (new_sz + dict_row) if adopt else cur_sz
    print(
        f"group {gi}: pages={len(rb)-1} card={len(guniq)} cur={cur_sz} new={new_sz}"
        f"+dictrow {dict_row} adopt={adopt} n_adopt={n_adopt} from={adopters_from}",
        file=sys.stderr,
    )

print(
    f"TOTAL payload: cur={tot_cur} group_huff={tot_new} "
    f"delta={(tot_cur - tot_new) / tot_cur * 100:.2f}%  ({time.time()-t0:.1f}s)"
)
