#!/usr/bin/env python
"""Run the real per-group encode kernel locally (no Spark) on the cached
grouped mixture (/tmp/mixture_grouped.parquet, written by a one-off
plan_groups dump) — the fast inner loop for estimator experiments: exact
bytes and kernel CPU per config, sequential and deterministic."""

import importlib
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from zopfli_spark import EngineConfig  # noqa: E402


def run(cfg, path="/tmp/mixture_grouped.parquet", tag=""):
    import zopfli_spark.engine as E

    pdf = pq.read_table(path)
    from zopfli_spark.plans.planner import GROUP_COL

    gcol = np.asarray(pdf.column(GROUP_COL).to_numpy(zero_copy_only=False))
    t0 = time.process_time()
    tot_b = tot_p = 0
    per_group = []
    for pid in sorted(set(gcol.tolist())):
        out = E._encode_group(pdf.filter(pa.array(gcol == pid)), cfg)
        b = sum(out.column("enc_bytes").to_pylist())
        per_group.append((pid, b, out.num_rows))
        tot_b += b
        tot_p += out.num_rows
    cpu = time.process_time() - t0
    print(f"{tag}: bytes={tot_b} pages={tot_p} cpu={cpu:.1f}s per_group={per_group}")
    return tot_b


if __name__ == "__main__":
    run(EngineConfig.ratio(), tag="ratio")
