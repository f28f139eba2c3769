#!/usr/bin/env python
"""A/B driver for the scaling-harness variants (VERDICT r4 wrong #2).

Runs bench.py's pinned scaling pair under different (task.cpus threshold,
pin headroom) combinations on the same pre-generated input. Ad-hoc tool —
results land in BENCH.md; the winning combination becomes bench.py's
default.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

INPUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zs_scale/tokens.parquet"
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 224534390
DOCS = int(sys.argv[3]) if len(sys.argv) > 3 else 160000
PAIR = sys.argv[4] if len(sys.argv) > 4 else "4:16"
VARIANTS = (sys.argv[5] if len(sys.argv) > 5 else "A,B,C").split(",")

lo, hi = (int(x) for x in PAIR.split(":"))

MATRIX = {
    # name -> (task_cpus_at, pin_extra)
    "A": ("17", "0"),   # r4 behavior: 16 workers on exactly 16 CPUs
    "B": ("16", "0"),   # task.cpus=2 AT 16: 8 workers on 16 CPUs
    "C": ("17", "2"),   # 16 workers on 18 CPUs (JVM headroom)
    "D": ("16", "2"),   # both
}

for name in VARIANTS:
    at, extra = MATRIX[name]
    os.environ["SPARK_GRAFT_TASK_CPUS_AT"] = at
    os.environ["SPARK_GRAFT_PIN_EXTRA"] = extra
    r = bench._run_scaling(INPUT, TOKENS, DOCS, lo, hi, visits=1, runs_per_visit=2)
    print(
        json.dumps(
            {
                "variant": name,
                "task_cpus_at": at,
                "pin_extra": extra,
                "pair": PAIR,
                "efficiency": round(r["efficiency"], 4),
                "cpu_efficiency": round(r["cpu_efficiency"], 4),
                "wall_lo": r["wall_lo_sec"],
                "wall_hi": r["wall_hi_sec"],
                "all_walls_lo": r["all_walls_lo"],
                "all_walls_hi": r["all_walls_hi"],
                "steal_lo": r["all_steal_lo"],
                "steal_hi": r["all_steal_hi"],
            }
        ),
        flush=True,
    )
