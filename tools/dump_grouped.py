#!/usr/bin/env python
"""One-off: materialize the bench synth mixture WITH its group/row-hash
columns (the exact input _encode_group sees) to a local parquet, so the
per-group kernels can be profiled without Spark (tools/encode_local.py,
tools/profile_encode.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from zopfli_spark import EngineConfig  # noqa: E402
from zopfli_spark.datagen import synth_tokens_df  # noqa: E402
from zopfli_spark.plans.planner import plan_groups  # noqa: E402


def main(n_docs: int = 22000, out: str = "/tmp/mixture_grouped.parquet") -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "32g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(
        group_budget_values=1 << 21, giant_doc_values=1 << 20, page_budget_values=1 << 20
    )
    df = synth_tokens_df(spark, n_docs)
    total = int(df.agg(F.sum("n_tok")).collect()[0][0])
    grouped, num_groups = plan_groups(df, cfg, total_values=total)
    grouped.write.mode("overwrite").parquet(out)
    print(f"wrote {out}: {total} tokens, {num_groups} groups")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 22000)
