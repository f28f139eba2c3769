#!/usr/bin/env python
"""cProfile the per-group encode kernel (no Spark) over the dumped grouped
mixture — per-config hotspot tables for the optimization round."""

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from zopfli_spark import EngineConfig  # noqa: E402


def run(cfg, tag, path="/tmp/mixture_grouped.parquet", profile=True, top=25):
    import zopfli_spark.engine as E
    from zopfli_spark.plans.planner import GROUP_COL

    pdf = pq.read_table(path)
    gcol = np.asarray(pdf.column(GROUP_COL).to_numpy(zero_copy_only=False))
    groups = [pdf.filter(pa.array(gcol == pid)) for pid in sorted(set(gcol.tolist()))]

    def job():
        tot_b = tot_p = 0
        for g in groups:
            out = E._encode_group(g, cfg)
            tot_b += sum(out.column("enc_bytes").to_pylist())
            tot_p += out.num_rows
        return tot_b, tot_p

    t0 = time.process_time()
    if profile:
        pr = cProfile.Profile()
        pr.enable()
        tot_b, tot_p = job()
        pr.disable()
    else:
        tot_b, tot_p = job()
    cpu = time.process_time() - t0
    print(f"== {tag}: bytes={tot_b} pages={tot_p} cpu={cpu:.2f}s")
    if profile:
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(top)
        print(s.getvalue())
    return tot_b


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "default"
    prof = "--noprof" not in sys.argv
    base = dict(group_budget_values=1 << 21, giant_doc_values=1 << 20,
                page_budget_values=1 << 20)
    cfgs = {
        "default": EngineConfig(**base),
        "tput": EngineConfig.throughput(**base),
        "ratio": EngineConfig.ratio(**base),
    }
    run(cfgs[which], which, profile=prof)
