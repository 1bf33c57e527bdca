"""Postprocess stage-cost ladder on real hardware.

The fused kernel emits (disparity or WTA inputs) and the postprocess —
LR check + hole fill, subpixel, median — runs as a jnp epilogue inside the
same jit program (SURVEY.md §3.1 L5).  This tool attributes wall time to
each stage by timing a cumulative config ladder:

    wta_only -> +subpixel -> +lr/fill -> +median  (= the preset default)

Each rung is one executable (AOT-cached, so re-runs are warm); the deltas
between rungs are the stage costs.  Motivation: at symmetric speed
(~0.48 s/pair) the epilogue is noise, but at the d-lanes fast modes
(11-24 pairs/s, 40-90 ms/pair) a few ms of epilogue is a measurable share —
this tool decides whether optimizing it is worth anything.

Usage: python tools/profile_stages.py [--geometry kitti] [--left-only]
       [--box] [--separable]
Emits one JSON line per rung plus a summary attribution.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GEOMS = {
    "kitti": dict(height=375, width=1242, max_disparity=128),
    "middlebury": dict(height=375, width=450, max_disparity=64),
    "tsukuba": dict(height=288, width=384, max_disparity=16),
    "tiny": dict(height=48, width=64, max_disparity=8, window_radius=4),  # CPU smoke
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="kitti", choices=sorted(GEOMS))
    ap.add_argument("--left-only", action="store_true")
    ap.add_argument("--box", action="store_true")
    ap.add_argument("--separable", action="store_true")
    ap.add_argument("--queue", type=int, default=8)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the jax platform (the axon plugin ignores "
                         "JAX_PLATFORMS env vars)")
    args = ap.parse_args()
    if args.box and args.separable:
        ap.error("--separable applies to ASW only; with --box the pipeline "
                 "would silently fall to the jnp path and the stage "
                 "attribution would be mislabeled")

    import contextlib

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from aswstereomatch_tpu.config import StereoConfig
    from aswstereomatch_tpu.utils import aotcache, devlock, synthetic

    # A cpu-forced run must not hold the TPU arbitration lock.
    lock = (
        contextlib.nullcontext() if args.platform == "cpu"
        else devlock.device_lock("profile_stages", timeout_s=120)
    )
    with lock:
        return _run(args, jnp, StereoConfig, aotcache, synthetic)


def _run(args, jnp, StereoConfig, aotcache, synthetic):

    g = dict(GEOMS[args.geometry])
    r_win = g.pop("window_radius", 16)
    pair = synthetic.make_pair(seed=0, **g)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])

    base = dict(
        max_disparity=g["max_disparity"], cost="tad_grad",
        aggregation="box" if args.box else "asw",
        window_radius=r_win,
        asw_symmetric=not args.left_only,
        asw_separable=args.separable,
    )
    ladder = [
        ("wta_only", dict(lr_check=False, fill_holes=False, subpixel=False,
                          median_filter=False)),
        ("+subpixel", dict(lr_check=False, fill_holes=False, subpixel=True,
                           median_filter=False)),
        ("+lr_fill", dict(lr_check=True, fill_holes=True, subpixel=True,
                          median_filter=False)),
        ("+median", dict(lr_check=True, fill_holes=True, subpixel=True,
                         median_filter=True)),
        ("+wmedian", dict(lr_check=True, fill_holes=True, subpixel=True,
                          median_filter=True, median_mode="weighted")),
    ]

    rows = []
    for name, over in ladder:
        cfg = StereoConfig(**base, **over)
        t0 = time.perf_counter()
        fn, src = aotcache.cached_match_pair(cfg, l, r)
        compile_s = time.perf_counter() - t0
        out = fn(l, r)
        float(out[0, 0])  # axon: scalar fetch = real sync
        out = fn(l, r)
        float(out[0, 0])
        Q = args.queue
        t0 = time.perf_counter()
        outs = [fn(l, r) for _ in range(Q)]
        float(outs[-1][0, 0])
        queued_s = (time.perf_counter() - t0) / Q
        row = {
            "rung": name,
            "s_per_pair": round(queued_s, 5),
            "delta_ms": round(
                1e3 * (queued_s - rows[-1]["s_per_pair"]), 2
            ) if rows else 0.0,
            "compile_source": src,
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    full = rows[-2]  # "+median" (plain) is the preset default
    print(json.dumps({
        "geometry": args.geometry,
        "mode": ("box" if args.box else
                 "left_only" if args.left_only else "symmetric")
        + ("+separable" if args.separable else ""),
        "epilogue_share_pct": round(
            100 * (full["s_per_pair"] - rows[0]["s_per_pair"])
            / full["s_per_pair"], 2),
        "pairs_per_s_full": round(1 / full["s_per_pair"], 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
