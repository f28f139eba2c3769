#!/usr/bin/env python
"""Deep trace of group 1 on the r5 mixture: why does the 1.42M-value mixed
page at 9.4 b/v survive split-time group-code pricing? Reconstructs the
group in clustered order, derives the group dictionary the engine will use
(train_group_dict), and replays the initial split with/without the gh cost
column — printing boundary positions and cost-model views around the giant
doc."""

import sys

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from zopfli_spark import EngineConfig
from zopfli_spark.engine import _doc_signature_keys, train_group_dict
from zopfli_spark.codecs.kernels import group_tokens
from zopfli_spark.datagen import synth_tokens_df
from zopfli_spark.pages import _RangeCost, split_by_cost
from zopfli_spark.plans.planner import GROUP_COL, plan_groups

PID = int(sys.argv[1]) if len(sys.argv) > 1 else 1
CFG = EngineConfig.ratio()

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
df = synth_tokens_df(spark, 4000, seed=42)
grouped, _ = plan_groups(df, CFG)
rows = (
    grouped.filter(f"{GROUP_COL} = {PID}")
    .select("doc_id", "tokens", "n_tok")
    .toPandas()
    .sort_values("doc_id")
)
spark.stop()

lens = rows["n_tok"].to_numpy().astype(np.int64)
values = np.concatenate([np.asarray(t) for t in rows["tokens"]]).astype(np.int64)
print(f"group {PID}: {len(lens)} docs, {len(values)} values")

# clustered order, as the engine applies it
off = np.concatenate(([0], np.cumsum(lens)))
keys = _doc_signature_keys(values, off)
perm = np.argsort(keys, kind="stable")
lens_c = lens[perm]
idx = (
    np.repeat(off[:-1][perm] - np.concatenate(([0], np.cumsum(lens_c)))[:-1], lens_c)
    + np.arange(len(values))
)
values_c = values[idx]
off_c = np.concatenate(([0], np.cumsum(lens_c)))
giant_row = int(np.argmax(lens_c))
print(f"giant doc at clustered row {giant_row}/{len(lens_c)}, n_tok {lens_c[giant_row]}, "
      f"value span [{off_c[giant_row]}, {off_c[giant_row+1]})")

ctx = train_group_dict(values_c, CFG)
print("dict:", "None" if ctx["blob"] is None else f"{len(ctx['blob'])}B card={len(ctx['gd'].vals)}")
gh_bits = None
if ctx["blob"] is not None:
    gd = ctx["gd"]
    sym, _ = group_tokens(values_c, gd)
    gh_bits = gd.lengths[sym].astype(np.float64)
    gh_bits[sym == len(gd.vals)] += 32.0
    # what does the gh model think of the giant doc vs its neighbors?
    for r0, r1, tag in [
        (giant_row, giant_row + 1, "giant doc"),
        (max(giant_row - 5, 0), giant_row, "5 docs before"),
        (giant_row + 1, min(giant_row + 6, len(lens_c)), "5 docs after"),
    ]:
        a, b = int(off_c[r0]), int(off_c[r1])
        if b <= a:
            continue
        seg = gh_bits[a:b]
        esc = float((sym[a:b] == len(gd.vals)).mean())
        print(f"  {tag}: rows[{r0},{r1}) {b-a}v gh={seg.mean():.2f} b/v esc={esc:.3f}")

for tag, gb in (("blind", None), ("priced", gh_bits)):
    bounds = split_by_cost(
        values_c, lens_c, CFG.page_budget_values, CFG.max_pages_per_group,
        mode="dp" if CFG.split_mode == "dp" else "greedy", gh_bits_per_value=gb,
    )
    rb = np.unique(np.concatenate(([0], bounds, [len(lens_c)]))).astype(np.int64)
    sizes_v = np.diff(off_c[rb])
    print(f"{tag}: {len(rb)-1} pages; largest pages (values): "
          f"{sorted(sizes_v.tolist(), reverse=True)[:6]}")
    k = int(np.searchsorted(rb, giant_row, side="right")) - 1
    print(f"  giant doc sits in page {k}: rows[{rb[k]},{rb[k+1]}) = "
          f"{int(off_c[rb[k+1]]-off_c[rb[k]])} values")
    rc = _RangeCost(values_c, lens_c, gb)
    i, j = int(rb[k]), int(rb[k + 1])
    whole = rc.cost_bits(i, j)
    a, b = rc.cost_bits(i, giant_row), rc.cost_bits(giant_row, j)
    c, d = rc.cost_bits(i, giant_row + 1), rc.cost_bits(giant_row + 1, j)
    print(f"  est cost: whole={whole/8:.0f}B; split@{giant_row}: {(a+b)/8:.0f}B; "
          f"split@{giant_row+1}: {(c+d)/8:.0f}B")
