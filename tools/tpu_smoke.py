"""TPU hardware smoke matrix — the runnable Mosaic-alignment gate.

Interpret-mode tests (tests/) do not enforce Mosaic sublane/lane alignment
(ops/pallas/asw_kernel.py notes the constraint is hardware-only), so kernel
or tiling changes can silently regress hardware-only constraints.  This tool
re-runs the docs/PERF_NOTES.md smoke matrix ON THE REAL CHIP in a few
minutes: symmetric / left-only / AD-cost / box / weighted-median full
pipelines, the x-tiled strip-export path, and batch=2 through the real
batch API for both kernel families (vmapped x-lanes AND the lax.map
d-lanes route — Mosaic cannot vmap the d-lanes kernels), at small
geometries spanning r in {1,2,4} and D in {4,8,16}.

Each config's compiled-Pallas pipeline output is checked against the jnp
path on the same device (reduction orders differ, so the gate is >=99%
agreement within 0.51 disparity and <0.5%% gross outliers — the same bound
tests/test_pallas_kernel.py pins in interpret mode).

Usage: python tools/tpu_smoke.py [--quick]
Exit code 0 = all pass.  Wired into the verify skill as the hardware gate.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.models import pipeline
from aswstereomatch_tpu.utils import synthetic


def _sync(x):
    # axon quirk: block_until_ready does not block; fetch a scalar.
    float(np.asarray(x).ravel()[0])


def _agree(a, b, what):
    a, b = np.asarray(a), np.asarray(b)
    close = np.mean(np.abs(a - b) <= 0.51)
    gross = np.mean(np.abs(a - b) > 2.0)
    ok = close > 0.99 and gross < 0.005
    return ok, f"{what}: agree={close:.4%} gross={gross:.4%}"


def run_matrix(quick: bool = False) -> int:
    base = StereoConfig(
        max_disparity=8, cost="tad_grad", aggregation="asw", window_radius=2,
        lr_check=True, fill_holes=True, subpixel=True, median_filter=True,
    )
    cases = [
        ("symmetric r2 D8", base, (32, 144)),
        ("left_only r2 D8", base.replace(asw_symmetric=False), (32, 144)),
        ("ad_cost r2 D8", base.replace(cost="ad"), (32, 144)),
        ("box r2 D8", base.replace(aggregation="box"), (32, 144)),
        (
            "weighted_median r2 D8",
            base.replace(median_mode="weighted"),
            (32, 144),
        ),
        ("r1 D4", base.replace(window_radius=1, max_disparity=4), (24, 136)),
        ("r4 D16", base.replace(window_radius=4, max_disparity=16), (40, 160)),
        # separable two-pass kernel (opt-in layout pin; both weight modes)
        (
            "sep_sym r2 D8",
            base.replace(asw_separable=True, kernel_layout="dlanes"),
            (32, 144),
        ),
        (
            "sep_lo r4 D16",
            base.replace(asw_separable=True, asw_symmetric=False,
                         window_radius=4, max_disparity=16,
                         kernel_layout="dlanes"),
            (40, 160),
        ),
        # adaptive-tile-width corners (round 3: TXS = (128-2r)//8*8):
        # r=24 -> TXS=80 (a non-power-of-two width), r=32 -> TXS=64 (the
        # minimum supported width, K=65).  Interpret tests don't enforce
        # Mosaic alignment, so these widths must run on hardware.
        (
            "sep_sym r24 D32 (TXS=80)",
            base.replace(asw_separable=True, window_radius=24,
                         max_disparity=32, kernel_layout="dlanes"),
            (80, 200),
        ),
        (
            "sep_sym r32 D32 (TXS=64)",
            base.replace(asw_separable=True, window_radius=32,
                         max_disparity=32, kernel_layout="dlanes"),
            (80, 200),
        ),
        # left-only banded-MXU horizontal pass (the round-4 default) at
        # its TIGHT wrap bound: r=16 -> TXS=96, K=33, 129-TXS = K exactly
        (
            "sep_lo r16 D32 (TXS=96, tight band)",
            base.replace(asw_separable=True, asw_symmetric=False,
                         window_radius=16, max_disparity=32,
                         kernel_layout="dlanes"),
            (64, 200),
        ),
        # bf16 volume-storage mode (round 4): gate vs the jnp f32 path —
        # quantization drift must stay inside the smoke agreement bound
        (
            "sep_sym r4 D16 bf16vol",
            base.replace(asw_separable=True, window_radius=4,
                         max_disparity=16, volume_dtype="bfloat16",
                         kernel_layout="dlanes"),
            (40, 160),
        ),
        # uniqueness confidence gate (round 5): the kernels' ubest export
        # (x-lanes top-4 tracking; d-lanes lane reduction) feeds the gate
        # — with fill_holes on, a mask mismatch vs jnp shows up as a
        # filled-value disagreement in the smoke bound
        (
            "uniq15 sym r2 D8",
            base.replace(uniqueness_ratio=15.0),
            (32, 144),
        ),
        (
            "uniq15 sep_lo r4 D16",
            base.replace(asw_separable=True, asw_symmetric=False,
                         window_radius=4, max_disparity=16,
                         uniqueness_ratio=15.0, kernel_layout="dlanes"),
            (40, 160),
        ),
    ]
    if quick:
        cases = cases[:3]

    failures = []
    for name, cfg, (h, w) in cases:
        pair = synthetic.make_pair(
            height=h, width=w, max_disparity=cfg.max_disparity, seed=11
        )
        l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        t0 = time.perf_counter()
        d_pal = jax.jit(
            functools.partial(pipeline.match_pair, cfg=cfg.replace(backend="pallas"))
        )(l, r)
        _sync(d_pal)
        t_pal = time.perf_counter() - t0
        d_jnp = jax.jit(
            functools.partial(pipeline.match_pair, cfg=cfg.replace(backend="jnp"))
        )(l, r)
        _sync(d_jnp)
        ok, msg = _agree(d_pal, d_jnp, name)
        print(f"  [{'PASS' if ok else 'FAIL'}] {msg} (pallas {t_pal:.1f}s incl compile)",
              flush=True)
        if not ok:
            failures.append(name)

    # x-tiled strip-export path (exercises want_strip + dynamic d-window).
    from aswstereomatch_tpu.parallel import mesh as mesh_lib
    from aswstereomatch_tpu.parallel import tiling

    cfg = base.replace(backend="pallas")
    pair = synthetic.make_pair(height=32, width=144, max_disparity=8, seed=12)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    m = mesh_lib.single_device_mesh()
    d_x = jax.jit(
        functools.partial(tiling.match_pair_tiled_x, cfg=cfg, device_mesh=m)
    )(l, r)
    _sync(d_x)
    d_ref = jax.jit(functools.partial(pipeline.match_pair, cfg=cfg))(l, r)
    _sync(d_ref)
    exact = np.array_equal(np.asarray(d_x), np.asarray(d_ref))
    print(f"  [{'PASS' if exact else 'FAIL'}] x-strip path exact={exact}", flush=True)
    if not exact:
        failures.append("x_strip")

    # batch=2 through the real batch API, both kernel families: symmetric
    # (x-lanes, vmapped) and left-only (d-lanes, lax.map — Mosaic cannot
    # batch-block its ANY-memspace cost volume, a hardware-only error that
    # interpret-mode tests cannot see; this is the gate for it).
    lb = jnp.stack([l, l])
    rb = jnp.stack([r, r])
    for blabel, bcfg in (
        ("xlanes", cfg),
        ("dlanes", cfg.replace(asw_symmetric=False)),
    ):
        db = jax.jit(functools.partial(pipeline.match_batch, cfg=bcfg))(lb, rb)
        _sync(db)
        bok = np.array_equal(np.asarray(db[0]), np.asarray(db[1]))
        print(
            f"  [{'PASS' if bok else 'FAIL'}] batch=2 ({blabel}) "
            f"consistent={bok}", flush=True,
        )
        if not bok:
            failures.append(f"batch_{blabel}")

    if failures:
        print(f"SMOKE FAIL: {failures}")
        return 1
    print("SMOKE PASS")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="first 3 configs only")
    args = ap.parse_args()
    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("tpu_smoke", timeout_s=120):
        dev = jax.devices()[0]
        print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
        if dev.platform != "tpu":
            print(
                "WARNING: not a TPU — this gate is meant for hardware",
                flush=True,
            )
        sys.exit(run_matrix(quick=args.quick))


if __name__ == "__main__":
    main()
