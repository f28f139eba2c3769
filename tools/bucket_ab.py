#!/usr/bin/env python
"""Profile sweep on the synth mixture for the r6 quantile-bucket estimator
A/B: exact enc bytes + kernel CPU at default / throughput() / ratio()
dials. Run once per pages.py variant (the harness swaps the file)."""

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from zopfli_spark import EngineConfig, decode_table, encode_table, roundtrip_check
from zopfli_spark.datagen import synth_tokens_df

N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
TAG = sys.argv[1] if len(sys.argv) > 1 else "run"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
df = synth_tokens_df(spark, N_DOCS, seed=42).cache()
df.count()

out = {"tag": TAG, "n_docs": N_DOCS}
for name, cfg in (
    ("default", EngineConfig()),
    ("tput", EngineConfig.throughput()),
    ("ratio", EngineConfig.ratio()),
):
    pages = encode_table(df, cfg).cache()
    agg = pages.agg(
        F.sum("enc_bytes").alias("e"), F.sum("raw_bytes").alias("r"),
        F.count("*").alias("p"), F.sum("enc_cpu_us").alias("cpu"),
    ).collect()[0]
    bad = roundtrip_check(df, decode_table(pages, cfg)).count()
    out[name] = {
        "enc_bytes": int(agg["e"]),
        "ratio": round(int(agg["r"]) / int(agg["e"]), 4),
        "pages": int(agg["p"]),
        "kernel_cpu_s": round(int(agg["cpu"]) / 1e6, 1),
        "bad_rows": int(bad),
    }
    print(f"{name}: {json.dumps(out[name])}", file=sys.stderr)
    pages.unpersist()
print("SWEEP_JSON:" + json.dumps(out))
spark.stop()
