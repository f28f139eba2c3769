#!/usr/bin/env python
"""Fast per-query bench for the optimization loop (bench.py stays FROZEN for
the driver's measurement; this file exists so iteration doesn't pay the
scaling ladder). Times the same seven queries with the same session config
and methodology as bench.py, prints one JSON line.

Usage: python bench_extra.py [repeats]   (default 2, reports min)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "22000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as B
    import __spark_entry__ as entry_mod

    from pyspark.sql import functions as F

    from zopfli_spark import EngineConfig, decode_table, encode_table
    from zopfli_spark.datagen import synth_tokens_df

    spark = B._mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    bench_cfg = B._bench_config(n_docs, cpus)
    df = synth_tokens_df(spark, n_docs).cache()
    total_tokens = int(df.agg(F.sum("n_tok")).collect()[0][0])

    def timed(fn, warm: int = 0):
        walls = []
        for _ in range(warm):
            fn()
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return min(walls), walls

    out: dict = {"sf_dir": sf_dir, "tokens": total_tokens, "queries": {}, "all": {}}

    sc.setJobDescription("encode_synth (default dials)")
    enc_agg = {}

    def enc_default():
        enc_agg["r"] = (
            encode_table(df, bench_cfg, total_values=total_tokens)
            .agg(F.sum("enc_bytes").alias("e"), F.sum("raw_bytes").alias("r"), F.count("*").alias("p"))
            .collect()[0]
        )

    w, walls = timed(enc_default, warm=1)
    out["queries"]["encode_synth"] = w
    out["all"]["encode_synth"] = walls
    out["pages"] = int(enc_agg["r"]["p"])
    out["compression_ratio"] = round(int(enc_agg["r"]["r"]) / int(enc_agg["r"]["e"]), 3)

    tput_cfg = EngineConfig.throughput(
        group_budget_values=bench_cfg.group_budget_values,
        giant_doc_values=bench_cfg.giant_doc_values,
        page_budget_values=bench_cfg.page_budget_values,
    )
    sc.setJobDescription("encode_synth_tput")
    w, walls = timed(lambda: (
        encode_table(df, tput_cfg, total_values=total_tokens)
        .agg(F.sum("enc_bytes").alias("e"), F.sum("raw_bytes").alias("r")).collect()
    ))
    out["queries"]["encode_synth_tput"] = w
    out["all"]["encode_synth_tput"] = walls

    ratio_cfg = EngineConfig.ratio(
        group_budget_values=bench_cfg.group_budget_values,
        giant_doc_values=bench_cfg.giant_doc_values,
        page_budget_values=bench_cfg.page_budget_values,
    )
    sc.setJobDescription("encode_synth_ratio")
    r_agg = {}

    def enc_ratio():
        r_agg["r"] = (
            encode_table(df, ratio_cfg, total_values=total_tokens)
            .agg(F.sum("enc_bytes").alias("e"), F.sum("raw_bytes").alias("r")).collect()[0]
        )

    w, walls = timed(enc_ratio)
    out["queries"]["encode_synth_ratio"] = w
    out["all"]["encode_synth_ratio"] = walls
    out["compression_ratio_ratio"] = round(int(r_agg["r"]["r"]) / int(r_agg["r"]["e"]), 3)

    sc.setJobDescription("decode_synth")
    pages = encode_table(df, bench_cfg, total_values=total_tokens).cache()
    pages.count()
    num_groups = max(1, -(-total_tokens // bench_cfg.group_budget_values))
    w, walls = timed(lambda: decode_table(pages, bench_cfg, input_partitions=2 * num_groups)
                     .agg(F.sum("n_tok")).collect())
    out["queries"]["decode_synth"] = w
    out["all"]["decode_synth"] = walls
    pages.unpersist()
    df.unpersist()

    for qname in ("roundtrip_lineitem", "doc_stats", "exact_dedup"):
        sc.setJobDescription(qname)
        q = entry_mod.queries()[qname]
        w, walls = timed(lambda: q(spark, sf_dir).collect())
        out["queries"][qname] = w
        out["all"][qname] = walls
    sc.setJobDescription(None)

    out["total"] = round(sum(out["queries"].values()), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
