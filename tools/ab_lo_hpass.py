"""Record + re-measure of the left-only horizontal-pass decision (round 4).

Through round 3 the separable left-only horizontal pass had two
implementations behind a module constant ``LO_HPASS``: a K-tap
broadcast-FMA loop ("fma", the shipped default) and a banded-MXU dot
("mxu", dark pending a hardware gate).  Round 4 A/B'd them ON THE CHIP
with queued dispatch (per-call timings at small geometries are swamped by
the axon tunnel's ~25 ms host round trip — the first per-call A/B of this
tool measured noise):

    geometry              fma queued   mxu queued   speedup   argmin agree
    small  (96x256 r8)    2.9 ms       2.6 ms       1.142x    100%
    small  (96x256 r12)   3.2 ms       2.8 ms       1.156x    100%
    small  (96x256 r16)   3.4 ms       3.4 ms       0.996x    100%
    kitti_lo (1242x375
              D128 r16)   34.9 ms      25.9 ms      1.348x    100%

Decision: the banded dot wins at the flagship geometry and never loses
meaningfully — it is now THE left-only horizontal pass and the FMA branch
is deleted (asw_sep_dlanes.py; no dark path, no constant).  Details in
docs/PERF_NOTES.md round 4.

This tool now just re-measures the shipped left-only kernel at those
geometries (regression probe for the table above).

Usage: python tools/ab_lo_hpass.py [--quick]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes as ASD
from aswstereomatch_tpu.utils import synthetic


def measure(left, right, cfg, iters: int = 4, queue: int = 16):
    """Returns (queued_s_per_call, best_percall_s, compile_s)."""
    fn = jax.jit(lambda l, r: ASD.wta_outputs(l, r, cfg))
    t0 = time.perf_counter()
    out = fn(left, right)
    float(out["bestc"][0, 0])  # axon: block_until_ready is a no-op
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(left, right)
        float(out["bestc"][0, 0])
        times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    outs = [fn(left, right) for _ in range(queue)]
    float(outs[-1]["bestc"][0, 0])
    queued_s = (time.perf_counter() - t0) / queue
    return queued_s, min(times), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small geometry only")
    args = ap.parse_args()

    geoms = [("small", 96, 256, 32, 8)]
    if not args.quick:
        geoms += [("small_r12", 96, 256, 32, 12),
                  ("small_r16", 96, 256, 32, 16),
                  ("kitti_lo", 375, 1242, 128, 16)]

    for name, h, w, D, r in geoms:
        cfg = StereoConfig(
            max_disparity=D, cost="tad_grad", aggregation="asw",
            window_radius=r, asw_symmetric=False, asw_separable=True,
            backend="pallas",
        )
        pair = synthetic.make_pair(height=h, width=w, max_disparity=D, seed=0)
        left, right = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        q, best, comp = measure(left, right, cfg)
        print(f"{name:9s} queued {q:.4f}s  percall {best:.4f}s  "
              f"compile {comp:.1f}s", flush=True)


if __name__ == "__main__":
    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("ab_lo_hpass", timeout_s=1800):
        main()
