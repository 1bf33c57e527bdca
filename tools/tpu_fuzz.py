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


def fuzz_dwindow_trials(n_trials: int, seed0: int, failures: list) -> None:
    """Mosaic-validate the d-SHARDED path's windowed x-lanes kernel form on
    the single chip (VERDICT round 3, item 8).

    parallel.dshard.shard_wta_outputs runs one shard's exact construction
    (slab-shifted right stack, D=ds+2 kernel with d_window=(1, ds+1),
    strip export) with a static shard index — the same kernel bytes the
    mesh path compiles, minus the collective combine (plain XLA, covered
    bit-exact by interpret tests).  Reference: the jnp aggregated volume's
    global-window argmin on the host CPU backend."""
    import jax
    import jax.numpy as jnp

    from aswstereomatch_tpu.config import StereoConfig
    from aswstereomatch_tpu.models import pipeline
    from aswstereomatch_tpu.ops import postprocess
    from aswstereomatch_tpu.parallel import dshard
    from aswstereomatch_tpu.utils import synthetic

    for t in range(n_trials):
        rng = np.random.default_rng(seed0 + t)
        r = int(rng.choice([2, 4, 8, 16]))
        D = int(rng.choice([16, 32, 64]))
        n = int(rng.choice([2, 4]))
        k = int(rng.integers(n))
        cfg = StereoConfig(
            max_disparity=D,
            cost=str(rng.choice(["tad_grad", "ad"])),
            aggregation="asw",
            window_radius=r,
            asw_symmetric=bool(rng.integers(2)),
        )
        ds = D // n
        h = int(rng.integers(3 * r + 9, 3 * r + 33))
        w = max(int(rng.integers(D + 4 * r + 16, D + 4 * r + 128)), 2 * D)
        pair = synthetic.make_pair(height=h, width=w, max_disparity=D,
                                   seed=int(rng.integers(1 << 16)))
        l, rr = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        try:
            outs = jax.jit(
                functools.partial(dshard.shard_wta_outputs, cfg=cfg, k=k, n=n)
            )(l, rr)
            bestc, bestd, _, _, rbestc, rbestd = map(np.asarray, outs)
        except Exception as e:  # noqa: BLE001 — a compile crash is a finding
            failures.append((cfg, f"dwindow k={k}/{n}: {type(e).__name__}: {e}"))
            print(f"[dw{t}] CRASH {e}", flush=True)
            continue
        with jax.default_device(jax.devices("cpu")[0]):
            vol = np.asarray(jax.jit(functools.partial(
                pipeline.aggregated_volume, cfg=cfg.replace(backend="jnp")
            ))(jnp.asarray(pair["left"]), jnp.asarray(pair["right"])))
            volr = np.asarray(jax.jit(postprocess.right_volume)(
                jnp.asarray(vol)))
        d0 = k * ds
        exp_d = d0 + np.argmin(vol[..., d0:d0 + ds], axis=-1)
        exp_rd = d0 + np.argmin(volr[..., d0:d0 + ds], axis=-1)
        exp_rc = np.min(volr[..., d0:d0 + ds], axis=-1)
        agree = float(np.mean(bestd == exp_d))
        # Right-view disparity is meaningful only where the shard's window
        # has a valid candidate (x' + d < W for some in-window d); where
        # every candidate is invalid both sides carry an inf cost with an
        # arbitrary placeholder d — the combine resolves those by cost.
        has_cand = np.isfinite(exp_rc)
        inf_match = float(np.mean(np.isfinite(rbestc) == has_cand))
        ragree = float(
            np.mean(rbestd[has_cand] == exp_rd[has_cand])
        ) if has_cand.any() else 1.0
        ragree = min(ragree, inf_match)
        cerr = float(np.max(np.abs(
            bestc - np.take_along_axis(vol, bestd[..., None], -1)[..., 0])))
        ok = agree > 0.995 and ragree > 0.995 and cerr < 1e-2
        tag = "ok " if ok else "FAIL"
        print(f"[dw{t}] {tag} dwindow k={k}/{n} r={r} D={D}"
              f"{' lo' if not cfg.asw_symmetric else ''} {h}x{w} "
              f"agree={agree:.4f} ragree={ragree:.4f} cerr={cerr:.2e}",
              flush=True)
        if not ok:
            failures.append(
                (cfg, f"dwindow k={k}/{n} agree={agree} ragree={ragree} "
                      f"cerr={cerr} {h}x{w}"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--dwindow-trials", type=int, default=6)
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
        sep = bool(rng.integers(2)) if agg == "asw" else False
        cfg = StereoConfig(
            max_disparity=D,
            cost=str(rng.choice(["tad_grad", "ad"])),
            aggregation=agg,
            window_radius=r,
            asw_symmetric=bool(rng.integers(2)) if agg == "asw" else True,
            asw_separable=sep,
            # separable-only storage-precision mode (round 4): the jnp
            # reference stays f32, so this also fuzzes quantization drift
            # against the 0.51-disparity agreement gate
            volume_dtype=str(rng.choice(["float32", "bfloat16"]))
            if sep else "float32",
            lr_check=bool(rng.integers(2)),
            fill_holes=True,
            subpixel=bool(rng.integers(2)),
            median_filter=bool(rng.integers(2)),
            median_mode=str(rng.choice(["plain", "weighted"])),
            # WTA-uniqueness gate (round 5): exercises the kernels'
            # second-best-excl-+-1 export (ubest) against the jnp volume
            # form; with fill_holes=True a mask mismatch shows up as a
            # filled-value disagreement
            uniqueness_ratio=float(rng.choice([0.0, 0.0, 5.0, 15.0])),
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
            f"{' bf16' if cfg.volume_dtype == 'bfloat16' else ''}"
            f"{' lo' if not cfg.asw_symmetric else ''} {h}x{w} "
            f"agree={agree:.4f} gross={gross:.4f}",
            flush=True,
        )
        if not ok:
            failures.append((cfg, f"agree={agree} gross={gross} {h}x{w}"))

    fuzz_dwindow_trials(args.dwindow_trials, args.seed0 + 100_000, failures)

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
