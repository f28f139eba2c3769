"""North-rule determinism evidence: the SAME input encoded in two SEPARATE
Spark processes at different parallelism (local[2] vs local[8]) produces
byte-identical page streams — the cluster-size-independence property
(FIXTURES.md §6.4; reference determinism discipline squeeze.c:79-146)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CODE = r'''
import json, sys
from pyspark.sql import SparkSession, functions as F
cores = sys.argv[1]
spark = (SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(int(cores) * 3))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, %(repo)r)
from zopfli_spark import EngineConfig, encode_table
from zopfli_spark.datagen import synth_tokens_df
cfg = EngineConfig(page_budget_values=20_000, group_budget_values=80_000, giant_doc_values=40_000)
df = synth_tokens_df(spark, 400, seed=77)
pages = encode_table(df, cfg)
sig = (pages.orderBy("part_id", "page_id")
       .agg(F.sum(F.crc32("payload")).alias("p"), F.sum(F.crc32("header")).alias("h"),
            F.sum("enc_bytes").alias("e"), F.count("*").alias("n")).collect()[0])
print("SIG:" + json.dumps({"p": sig["p"], "h": sig["h"], "e": sig["e"], "n": sig["n"]}))
spark.stop()
'''


def test_byte_identical_across_processes_and_parallelism():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sigs = []
    for cores in ("2", "8"):
        p = subprocess.run(
            [sys.executable, "-c", _CODE % {"repo": repo}, cores],
            capture_output=True,
            text=True,
            timeout=400,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("SIG:")]
        assert lines, p.stderr[-1500:]
        sigs.append(json.loads(lines[-1][4:]))
    assert sigs[0] == sigs[1], f"local[2] vs local[8] differ: {sigs}"
