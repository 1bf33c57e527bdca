"""Separable-ASW hardware A/B: the routing decision for asw_sep_dlanes.

Measures, at the KITTI (and optionally venus) geometry on synthetic
exact-GT scenes:

  - exact symmetric ASW, auto backend (the shipping x-lanes kernel),
  - separable symmetric, fused d-lanes kernel (kernel_layout='dlanes'),
  - separable symmetric, jnp path (what auto currently routes),
  - exact left-only (d-lanes big-dot MXU kernel) and separable left-only
    kernel, for the speed-mode ladder,

each with per-call + queued throughput and bad-delta/EPE vs exact GT, plus
argmin-level agreement of the separable kernel against the jnp separable
path (the hardware-exactness check interpret mode cannot provide).

Decision rule (PERF_NOTES "Separable two-pass ASW kernel"): flip
asw_sep_dlanes.routed() auto-on iff the kernel beats the jnp separable
path AND tools/tpu_smoke.py's separable rows pass.  Writes
bench_results/separable_ab.json.

Usage: python tools/bench_separable.py [--geom kitti venus] [--queue 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Config-level CPU escape (the axon plugin can block on a dead tunnel even
# under a JAX_PLATFORMS=cpu env request) — lets the harness flow be smoke
# tested off-TPU.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def _measure(fn, l, r, queue):
    out = fn(l, r)
    float(out[0, 0])  # axon: scalar fetch = real sync
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(l, r)
        float(out[0, 0])
        times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    outs = [fn(l, r) for _ in range(queue)]
    float(outs[-1][0, 0])
    queued_s = (time.perf_counter() - t0) / queue
    return np.asarray(out), 1.0 / min(times), 1.0 / queued_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", nargs="+", default=["kitti"])
    ap.add_argument("--queue", type=int, default=8)
    ap.add_argument(
        "--out", default="bench_results/separable_ab.json"
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from aswstereomatch_tpu.config import StereoConfig
    from aswstereomatch_tpu.models import pipeline
    from aswstereomatch_tpu.utils import aotcache, devlock, evaluate, synthetic

    variants = [
        ("exact_sym_auto", dict(asw_symmetric=True)),
        ("sep_sym_kernel", dict(asw_symmetric=True, asw_separable=True,
                                kernel_layout="dlanes")),
        ("sep_sym_jnp", dict(asw_symmetric=True, asw_separable=True,
                             backend="jnp")),
        ("exact_lo_auto", dict(asw_symmetric=False)),
        ("sep_lo_kernel", dict(asw_symmetric=False, asw_separable=True,
                               kernel_layout="dlanes")),
        ("sep_lo_jnp", dict(asw_symmetric=False, asw_separable=True,
                            backend="jnp")),
    ]

    rows = []
    with devlock.device_lock("bench_separable", timeout_s=120):
        for geom in args.geom:
            pair = synthetic.make_dataset_pair(geom, seed=3)
            l = jnp.asarray(pair["left"])
            r = jnp.asarray(pair["right"])
            disps = {}
            for tag, overrides in variants:
                cfg = StereoConfig(
                    max_disparity={"venus": 64, "kitti": 128,
                                   "tsukuba": 16}.get(geom, 64),
                    cost="tad_grad", aggregation="asw", window_radius=16,
                    lr_check=True, fill_holes=True, subpixel=True,
                    median_filter=True, **overrides,
                )
                fn, _src = aotcache.cached_match_pair(cfg, l, r)
                t0 = time.perf_counter()
                disp, per_call, queued = _measure(fn, l, r, args.queue)
                disps[tag] = disp
                rep = evaluate.bad_report(
                    disp, pair["gt"], valid=~pair["occluded"]
                )
                row = {
                    "geometry": geom, "variant": tag,
                    "pairs_per_s": round(per_call, 4),
                    "pairs_per_s_queued": round(queued, 4),
                    "wall_s": round(time.perf_counter() - t0, 2),
                    **{k: round(float(v), 5) for k, v in rep.items()},
                }
                rows.append(row)
                print(row, flush=True)
            # Hardware exactness: kernel vs jnp separable (subpixel makes
            # exact equality fp-fragile; compare at the 1/16-px level and
            # report the raw max delta too).
            for mode in ("sym", "lo"):
                a, b = disps[f"sep_{mode}_kernel"], disps[f"sep_{mode}_jnp"]
                agree = float(np.mean(np.abs(a - b) < 1.0 / 16.0))
                rows.append({
                    "geometry": geom,
                    "variant": f"sep_{mode}_kernel_vs_jnp",
                    "agree_sixteenth_px": round(agree, 6),
                    "max_abs_delta": round(float(np.max(np.abs(a - b))), 5),
                })
                print(rows[-1], flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
