#!/usr/bin/env python
"""A/B: does pricing the group_huffman candidate inside the split estimator
(config.gh_split_pricing, r6) close the known mixed-page gap on the synth
mixture? Runs the REAL engine twice at the ratio() dials — identical
content, identical config but the estimator dial — and reports exact bytes,
adoption counts, and the realized bits/value of group pages. The r5 record
(BENCH.md) left one mixture group's zipf content inside a mixed page at
~9.4 b/v vs ~7.4 achievable (~2% of payload); four post-hoc recovery
policies all measured worse than split-time pricing."""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from zopfli_spark import EngineConfig, decode_table, encode_table, roundtrip_check
from zopfli_spark.datagen import synth_tokens_df

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = synth_tokens_df(spark, N_DOCS, seed=42).cache()
n_tok = df.agg(F.sum("n_tok")).collect()[0][0]
print(f"mixture: {N_DOCS} docs, {n_tok} tokens", file=sys.stderr)

out = {"n_docs": N_DOCS, "tokens": int(n_tok)}
for tag, cfg in (
    ("blind", EngineConfig.ratio(gh_split_pricing=False)),
    ("priced", EngineConfig.ratio()),
):
    t0 = time.time()
    pages = encode_table(df, cfg).cache()
    agg = pages.agg(
        F.sum("enc_bytes").alias("e"),
        F.sum("raw_bytes").alias("r"),
        F.count("*").alias("p"),
        F.sum("enc_cpu_us").alias("cpu"),
    ).collect()[0]
    gh = (
        pages.filter(F.col("codec") == "group_huffman")
        .agg(
            F.sum("enc_bytes").alias("e"),
            F.sum("n_values").alias("v"),
            F.count("*").alias("p"),
        )
        .collect()[0]
    )
    bad = roundtrip_check(df, decode_table(pages, cfg)).count()
    out[tag] = {
        "enc_bytes": int(agg["e"]),
        "ratio": round(int(agg["r"]) / int(agg["e"]), 4),
        "pages": int(agg["p"]),
        "kernel_cpu_s": round(int(agg["cpu"]) / 1e6, 1),
        "gh_pages": int(gh["p"] or 0),
        "gh_bytes": int(gh["e"] or 0),
        "gh_bits_per_value": round(8 * int(gh["e"] or 0) / max(int(gh["v"] or 0), 1), 3),
        "roundtrip_bad_rows": int(bad),
        "wall_s": round(time.time() - t0, 1),
    }
    print(f"{tag}: {json.dumps(out[tag])}", file=sys.stderr)
    pages.unpersist()

d = out["blind"]["enc_bytes"] - out["priced"]["enc_bytes"]
out["delta_bytes"] = d
out["delta_pct_of_payload"] = round(100 * d / out["blind"]["enc_bytes"], 3)
print("AB_JSON:" + json.dumps(out))
spark.stop()
