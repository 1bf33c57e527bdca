"""Symmetric vs left-only ASW weights: speed/accuracy trade (SURVEY §7
"decide by measurement").  Runs both weight modes at the venus and kitti
geometries on synthetic exact-GT scenes and records pairs/s + bad-δ/EPE
into bench_results/symmetric_vs_leftonly.json (the BASELINE.md table).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from aswstereomatch_tpu.config import StereoConfig
    from aswstereomatch_tpu.models import pipeline
    from aswstereomatch_tpu.utils import evaluate, synthetic

    geoms = {
        "venus": dict(height=375, width=450, max_disparity=64),
        "kitti": dict(height=375, width=1242, max_disparity=128),
    }
    rows = []
    for geom, g in geoms.items():
        pair = synthetic.make_dataset_pair(geom, seed=3)
        l = jnp.asarray(pair["left"])
        r = jnp.asarray(pair["right"])
        for sym in (True, False):
            cfg = StereoConfig(
                max_disparity=g["max_disparity"], cost="tad_grad",
                aggregation="asw", window_radius=16, lr_check=True,
                fill_holes=True, subpixel=True, median_filter=True,
                asw_symmetric=sym,
            )
            from aswstereomatch_tpu.utils import aotcache

            fn, _src = aotcache.cached_match_pair(cfg, l, r)
            out = fn(l, r)
            float(out[0, 0])  # axon: scalar fetch = real sync
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = fn(l, r)
                float(out[0, 0])
                times.append(time.perf_counter() - t0)
            # Queued throughput (see tools/run_baseline_configs.py): the
            # axon per-dispatch round trip dominates sub-100 ms configs;
            # a full device queue measures sustained pairs/s.
            Q = 8
            t0 = time.perf_counter()
            outs = [fn(l, r) for _ in range(Q)]
            float(outs[-1][0, 0])
            queued_s = (time.perf_counter() - t0) / Q
            disp = np.asarray(out)
            rep = evaluate.bad_report(
                disp, pair["gt"], valid=~pair["occluded"]
            )
            row = {
                "geometry": geom,
                "symmetric": sym,
                "pairs_per_s": round(1.0 / min(times), 4),
                "pairs_per_s_queued": round(1.0 / queued_s, 4),
                **{k: round(float(v), 5) for k, v in rep.items()},
            }
            rows.append(row)
            print(row, flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "symmetric_vs_leftonly.json",
    )
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("sym_vs_leftonly", timeout_s=120):
        main()
