#!/usr/bin/env python
"""Instrumented local replay of the mixture's group encodes: why did split-
time group-code pricing (r6) not move any boundary? Reconstructs each
planner group exactly as encode_table would (one Spark pass to get the
grouped rows + row hashes), then calls engine._encode_group in-process with
extra tracing: the chosen row bounds, per-page realized bits/value, which
pages adopt group_huffman, and what the gh cost column said about each
page's range."""

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from zopfli_spark import EngineConfig
from zopfli_spark import engine as eng
from zopfli_spark.datagen import synth_tokens_df
from zopfli_spark.plans.planner import GROUP_COL, ROW_HASH_COL, plan_groups

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
CFG = EngineConfig.ratio()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
df = synth_tokens_df(spark, N_DOCS, seed=42)
grouped, n_parts = plan_groups(df, CFG)
pdf = grouped.toArrow()
spark.stop()

parts = sorted(set(pdf.column(GROUP_COL).to_pylist()))
print(f"{len(parts)} groups, {pdf.num_rows} docs", file=sys.stderr)

for pid in parts:
    mask = np.asarray(pdf.column(GROUP_COL).to_numpy(zero_copy_only=False)) == pid
    tbl = pdf.filter(pa.array(mask))
    out = eng._encode_group(tbl, CFG)
    codec = out.column("codec").to_pylist()
    nv = np.asarray(out.column("n_values").to_numpy(zero_copy_only=False))
    eb = np.asarray(out.column("enc_bytes").to_numpy(zero_copy_only=False))
    pagerows = [
        (int(p), c, int(v), int(b), round(8 * b / max(v, 1), 2))
        for p, c, v, b in zip(out.column("page_id").to_pylist(), codec, nv, eb)
    ]
    tot_v, tot_b = int(nv[nv > 0].sum()), int(eb.sum())
    print(f"group {pid}: {len(pagerows)} pages {tot_v} values {tot_b} bytes "
          f"({round(8*tot_b/max(tot_v,1),2)} b/v)")
    for p, c, v, b, bpv in pagerows:
        flag = " <== WORST" if bpv > 9 and v > 100_000 else ""
        print(f"  page {p:4d} {c:>18s} {v:>9d}v {b:>9d}B {bpv:6.2f} b/v{flag}")
