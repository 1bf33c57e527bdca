"""Variance-controlled headline measurement (VERDICT round 3, item 3).

The round-3 headline was a 13.2–16.7 pairs/s range — a 26% spread between
sessions attributed to "axon-tunnel dispatch variance" without a measured
decomposition.  This tool produces the decomposition and a headline with an
error bar:

1. **Device-time-derived rate** — jit ONE executable that runs the full
   kitti_sep pipeline K+1 times serially on device (each iteration's input
   carries a data-dependent-but-always-zero epsilon from the previous
   iteration's output, so XLA cannot CSE/hoist the loop body), time the
   single dispatch, divide by K+1.  Host dispatch overhead appears once
   per K+1 pairs instead of once per pair, so this is the chip's own
   throughput, independent of tunnel jitter.
2. **Session sweep** — N fresh ``python bench.py`` processes (each
   AOT-cache-hit), collecting the queued_s each records.  The median is
   the honest serving-regime number; the spread IS the tunnel variance.
3. The difference (median queued_s − device_s) is the per-pair dispatch
   overhead, reported separately.

Writes bench_results/headline_variance.json.

Usage: python tools/headline_variance.py [--sessions N] [--chain K]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def device_time_rate(chain: int, reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from aswstereomatch_tpu.models import pipeline
    from aswstereomatch_tpu.utils import aotcache

    cfg, left, right, _ = bench._bench_setup("kitti_sep", "auto")

    def chained(l, r):
        def body(i, carry):
            disp = pipeline.match_pair(carry, r, cfg=cfg)
            # Data-dependent epsilon that is always 0.0 at runtime but
            # opaque at compile time: forces a serial dependency so XLA
            # cannot hoist the loop-invariant pipeline out of the loop.
            eps = jnp.where(disp[0, 0] > 1e30, 1e-6, 0.0).astype(l.dtype)
            return l + eps
        final = lax.fori_loop(0, chain, body, l)
        return pipeline.match_pair(final, r, cfg=cfg)

    t0 = time.perf_counter()
    fn, source = aotcache.compile_cached(
        chained, (left, right),
        key_parts=("devtime_chain", cfg.config_hash(), chain),
    )
    out = fn(left, right)
    float(out[0, 0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(left, right)
        float(out[0, 0])
        times.append(time.perf_counter() - t0)
    per_pair = min(times) / (chain + 1)
    return {
        "chain": chain + 1,
        "reps": reps,
        "dispatch_times_s": times,
        "device_s_per_pair": per_pair,
        "device_pairs_per_s": 1.0 / per_pair,
        "compile_source": source,
        "compile_or_load_s": compile_s,
    }


def session_sweep(n: int) -> list:
    detail_path = os.path.join(REPO, "bench_results", "bench_kitti_sep.json")
    rows = []
    for i in range(n):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--deadline-s", "600"],
            cwd=REPO, capture_output=True, text=True, timeout=700,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        rec = json.loads(line)
        stale = "STALE" in rec.get("metric", "")
        row = {"session": i, "value": rec.get("value"), "stale": stale}
        if not stale and os.path.exists(detail_path):
            with open(detail_path) as f:
                d = json.load(f)
            row.update(queued_s=d["queued_s"], best_s=d["best_s"],
                       compile_source=d["compile_source"])
        rows.append(row)
        print(f"session {i}: {row}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=5)
    ap.add_argument("--chain", type=int, default=19)
    args = ap.parse_args()

    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("headline_variance", timeout_s=1800):
        dev = device_time_rate(args.chain)
        print(f"device-time rate: {dev['device_pairs_per_s']:.2f} pairs/s "
              f"({dev['device_s_per_pair']*1e3:.1f} ms/pair, "
              f"{dev['compile_source']})", flush=True)
    # sessions run UNLOCKED on purpose: each bench.py child takes the lock
    # itself; holding it here would deadlock them.
    rows = session_sweep(args.sessions)

    live = [r for r in rows if not r.get("stale") and "queued_s" in r]
    queued = sorted(r["queued_s"] for r in live)
    med = queued[len(queued) // 2] if queued else None
    summary = {
        "preset": "kitti_sep",
        "device_time": dev,
        "sessions": rows,
        "median_queued_s": med,
        "median_queued_pairs_per_s": (1.0 / med) if med else None,
        "queued_spread_s": [min(queued), max(queued)] if queued else None,
        "dispatch_overhead_s_per_pair": (med - dev["device_s_per_pair"])
        if med else None,
        "note": "device_s_per_pair from a K-chained single-dispatch loop "
        "(no per-pair host round trip); queued_s from fresh bench.py "
        "processes (serving regime, pays tunnel dispatch).",
    }
    out = os.path.join(REPO, "bench_results", "headline_variance.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in (
        "median_queued_pairs_per_s", "dispatch_overhead_s_per_pair")}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
