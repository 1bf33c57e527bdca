"""Randomized hardware fuzz: pallas vs jnp agreement on the real chip.

tools/tpu_smoke.py runs a FIXED matrix; this samples random supported
configs (weight mode, separable, box, cost, r, D, geometry) and checks the
fused-kernel pipeline against the jnp pipeline — the check interpret mode
cannot provide (Mosaic alignment, dot lowering, DMA paths are
hardware-only).  Small geometries keep per-config Mosaic compiles in the
seconds range; the jnp reference runs on the HOST CPU backend (its
XLA:TPU compiles at odd shapes cost minutes each and timed out a 24-trial
session — measured round 3), which is also an independent-backend
cross-check.

    python tools/tpu_fuzz.py --trials 24 [--seed0 5000]

Exit code 0 = no counterexample.  Failures print the full config repr for
replay.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--seed0", type=int, default=5000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aswstereomatch_tpu.config import StereoConfig
    from aswstereomatch_tpu.models import pipeline
    from aswstereomatch_tpu.utils import synthetic

    def J(fn, **static):
        return jax.jit(functools.partial(fn, **static))

    failures = []
    t_start = time.perf_counter()
    for t in range(args.trials):
        rng = np.random.default_rng(args.seed0 + t)
        r = int(rng.choice([1, 2, 3, 4, 8, 12, 16, 24, 32]))
        D = int(rng.choice([4, 8, 16, 32, 64]))
        agg = str(rng.choice(["asw", "asw", "asw", "box"]))
        cfg = StereoConfig(
            max_disparity=D,
            cost=str(rng.choice(["tad_grad", "ad"])),
            aggregation=agg,
            window_radius=r,
            asw_symmetric=bool(rng.integers(2)) if agg == "asw" else True,
            asw_separable=bool(rng.integers(2)) if agg == "asw" else False,
            lr_check=bool(rng.integers(2)),
            fill_holes=True,
            subpixel=bool(rng.integers(2)),
            median_filter=bool(rng.integers(2)),
            median_mode=str(rng.choice(["plain", "weighted"])),
        )
        # geometry comfortably larger than the window and D
        h = int(rng.integers(3 * r + 9, 3 * r + 41))
        w = max(int(rng.integers(D + 4 * r + 16, D + 4 * r + 160)), 2 * D)
        pair = synthetic.make_pair(height=h, width=w, max_disparity=D,
                                   seed=int(rng.integers(1 << 16)))
        l, rr = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])

        backend = pipeline._resolve_backend(cfg, (h, w))
        if backend != "pallas":
            # routed to jnp (unsupported geometry / small-box fallback):
            # nothing hardware-specific to fuzz; running the jnp pipeline
            # on the TPU costs a minutes-long XLA compile for nothing.
            print(f"[{t}] skip  jnp-routed r={r} D={D} {cfg.aggregation} "
                  f"{h}x{w}", flush=True)
            continue
        with jax.default_device(jax.devices("cpu")[0]):
            d_jnp = np.asarray(J(pipeline.match_pair, cfg=cfg.replace(
                backend="jnp"))(
                    jnp.asarray(pair["left"]), jnp.asarray(pair["right"])))
        try:
            d_pal = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, rr))
        except Exception as e:  # noqa: BLE001 — a compile crash is a finding
            failures.append((cfg, f"{type(e).__name__}: {e}"))
            print(f"[{t}] CRASH {e}", flush=True)
            continue
        agree = float(np.mean(np.abs(d_pal - d_jnp) <= 0.51))
        gross = float(np.mean(np.abs(d_pal - d_jnp) > 2.0))
        ok = agree > 0.99 and gross < 0.005
        tag = "ok " if ok else "FAIL"
        print(
            f"[{t}] {tag} {backend:6s} r={r} D={D} {cfg.aggregation}"
            f"{' sep' if cfg.asw_separable else ''}"
            f"{' lo' if not cfg.asw_symmetric else ''} {h}x{w} "
            f"agree={agree:.4f} gross={gross:.4f}",
            flush=True,
        )
        if not ok:
            failures.append((cfg, f"agree={agree} gross={gross} {h}x{w}"))

    print(
        f"{args.trials} trials in {time.perf_counter() - t_start:.0f}s, "
        f"{len(failures)} failures"
    )
    for cfg, msg in failures:
        print("FAILURE:", msg, "\n  ", cfg)
    return 1 if failures else 0


if __name__ == "__main__":
    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("tpu_fuzz", timeout_s=300):
        sys.exit(main())
