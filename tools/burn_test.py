#!/usr/bin/env python
"""Spark-free scaling burn test — the host-capacity control for BENCH.md.

Forks K identical numpy worker processes doing encode-kernel-shaped work
(sort/unique/bincount + zlib over int32 pages) and measures aggregate
throughput at two process counts. No JVM, no shuffle, no Arrow: whatever
efficiency THIS loses between K=N and K=4N is host capacity (vCPU
overcommit, memory bandwidth, hypervisor scheduling), not the engine or the
Spark harness. Mirrors the bench harness's pinning discipline: optionally
taskset-pins the whole K-process group to exactly K host CPUs (or K+H with
headroom H) so the control measures the same CPU budget the pinned Spark
workers get.

Usage:
  python tools/burn_test.py [--pairs 4:16,2:8] [--iters 30] [--pin {none,exact,+2}]

Prints one JSON line per pair plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time
import zlib

import numpy as np


def _work_once(rng: np.random.Generator, n: int = 1 << 18) -> int:
    """One encode-kernel-shaped unit: zipf-ish page -> unique/bincount/sort
    + delta + zlib on a byte plane. Matches the hot mix of encode_best."""
    v = (rng.zipf(1.3, n) % 50_000).astype(np.int32)
    uniq, inv = np.unique(v, return_inverse=True)
    counts = np.bincount(inv)
    zz = np.diff(v.astype(np.int64))
    plane = (v & 0xFF).astype(np.uint8).tobytes()
    z = zlib.compress(plane, 6)
    return len(z) + int(counts.max()) + int(zz.sum() & 0xFF) + len(uniq)


def worker(iters: int, seed: int, q) -> None:
    rng = np.random.default_rng(seed)
    t0w, t0c = time.perf_counter(), time.process_time()
    acc = 0
    for _ in range(iters):
        acc += _work_once(rng)
    q.put(
        {
            "wall": time.perf_counter() - t0w,
            "cpu": time.process_time() - t0c,
            "acc": acc & 0xFFFF,
        }
    )


def _steal() -> int:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except Exception:
        return 0


def run_group(k: int, iters: int) -> dict:
    """K worker processes, each `iters` units; returns wall + per-proc CPU."""
    q = mp.Queue()
    s0 = _steal()
    t0 = time.perf_counter()
    procs = [mp.Process(target=worker, args=(iters, 1000 + i, q)) for i in range(k)]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    cpus = [r["cpu"] for r in results]
    total_units = k * iters
    return {
        "k": k,
        "wall": round(wall, 3),
        "units_per_sec": round(total_units / wall, 2),
        "cpu_sec_mean": round(float(np.mean(cpus)), 3),
        "units_per_cpu_sec": round(iters / float(np.mean(cpus)), 2),
        "steal_jiffies": _steal() - s0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="4:16")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pin", choices=["none", "exact", "+2"], default="exact")
    ap.add_argument("--group", type=int, help="(internal) run one pinned group")
    args = ap.parse_args()

    if args.group:
        print("GROUP_JSON:" + json.dumps(run_group(args.group, args.iters)))
        return

    def one(k: int) -> dict:
        if args.pin == "none" or not shutil.which("taskset"):
            return run_group(k, args.iters)
        ncpu = k if args.pin == "exact" else k + 2
        cmd = [
            "taskset", "-c", f"0-{ncpu - 1}",
            sys.executable, os.path.abspath(__file__),
            "--group", str(k), "--iters", str(args.iters),
        ]
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        line = [l for l in p.stdout.splitlines() if l.startswith("GROUP_JSON:")]
        if not line:
            raise RuntimeError(p.stderr[-500:])
        return json.loads(line[-1][len("GROUP_JSON:"):])

    out = {"pin": args.pin, "iters": args.iters, "pairs": []}
    for pair in args.pairs.split(","):
        lo, hi = (int(x) for x in pair.split(":"))
        # interleaved, 2 visits per side, best-of (same discipline as bench)
        r: dict[int, list[dict]] = {lo: [], hi: []}
        for _ in range(2):
            for k in (lo, hi):
                r[k].append(one(k))
        best = {k: max(rs, key=lambda x: x["units_per_sec"]) for k, rs in r.items()}
        eff = (best[hi]["units_per_sec"] / best[lo]["units_per_sec"]) / (hi / lo)
        cpu_eff = best[hi]["units_per_cpu_sec"] / best[lo]["units_per_cpu_sec"]
        out["pairs"].append(
            {
                "pair": f"{lo}->{hi}",
                "efficiency": round(eff, 4),
                "cpu_efficiency": round(cpu_eff, 4),
                "lo": best[lo],
                "hi": best[hi],
            }
        )
        print(json.dumps(out["pairs"][-1]), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
