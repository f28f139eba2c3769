#!/usr/bin/env python
"""Capture .explain('formatted') for every declared query into plans/<tag>/
(judge deliverable: the plan-shape evidence for OPTIMIZATION_r07.md)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main(tag: str, suffix: str, only: list[str] | None = None) -> None:
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, q in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            plan = q(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                q(spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
        except Exception:
            df = q(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "r07",
         sys.argv[2] if len(sys.argv) > 2 else "before",
         sys.argv[3].split(",") if len(sys.argv) > 3 else None)
