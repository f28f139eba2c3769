#!/usr/bin/env python
"""~10x-scale local validation point (BENCH.md 'Larger-scale point'):
encode ~295M tokens on local[32] at the default and ratio() dials, report
throughput / ratio / peak python-worker RSS. Run on an idle host."""

import os
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402


def _poll_rss(stop, out):
    peak = 0
    while not stop.is_set():
        try:
            o = subprocess.run(
                ["ps", "-eo", "rss,cmd"], capture_output=True, text=True
            ).stdout
            tot = sum(
                int(l.split()[0])
                for l in o.splitlines()
                if "pyspark.daemon" in l or "java" in l
            )
            peak = max(peak, tot)
        except Exception:
            pass
        out[0] = peak
        time.sleep(2)


def main(n_docs: int = 212_000) -> None:
    from pyspark.sql import functions as F

    from zopfli_spark import EngineConfig, decode_table, encode_table
    from zopfli_spark.datagen import synth_tokens_df

    spark = B._mk_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="zs_scale_point_")
    path = os.path.join(tmp, "tokens.parquet")
    synth_tokens_df(spark, n_docs, seed=7).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    total = int(df.agg(F.sum("n_tok")).collect()[0][0])
    print(f"input: {n_docs} docs, {total} tokens")
    base = B._bench_config(n_docs, 32)
    for tag, cfg in [
        ("default", base),
        ("ratio", EngineConfig.ratio(
            group_budget_values=base.group_budget_values,
            giant_doc_values=base.giant_doc_values,
            page_budget_values=base.page_budget_values,
        )),
    ]:
        stop = threading.Event()
        peak = [0]
        th = threading.Thread(target=_poll_rss, args=(stop, peak), daemon=True)
        th.start()
        t0 = time.perf_counter()
        agg = (
            encode_table(spark.read.parquet(path), cfg, total_values=total)
            .agg(F.sum("enc_bytes").alias("e"), F.sum("raw_bytes").alias("r"),
                 F.count("*").alias("p"))
            .collect()[0]
        )
        wall = time.perf_counter() - t0
        stop.set()
        print(
            f"{tag}: wall={wall:.1f}s tput={total/wall/1e6:.2f} Mtok/s "
            f"ratio={int(agg['r'])/int(agg['e']):.3f} pages={int(agg['p'])} "
            f"peak_rss_gb={peak[0]/1048576:.1f}"
        )
    # roundtrip spot check at default dials
    num_groups = max(1, -(-total // base.group_budget_values))
    pages = encode_table(spark.read.parquet(path), base, total_values=total)
    dec_total = int(
        decode_table(pages, base, input_partitions=2 * num_groups)
        .agg(F.sum("n_tok")).collect()[0][0]
    )
    print(f"decode n_tok sum matches: {dec_total == total} ({dec_total})")
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 212_000)
