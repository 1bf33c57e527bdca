"""Benchmark harness — emits ONE JSON line for the driver.

Headline metric (BASELINE.json): stereo pairs/sec/chip at KITTI resolution
(1242x375, D=128) running the full ASW pipeline (TAD+gradient cost, 33x33
symmetric adaptive support weights, WTA + LR + fill + subpixel + median).
The default preset is ``kitti_sep`` — the separable O(K) symmetric mode —
because it is the fastest configuration that satisfies the pinned
accuracy contract (<=1% bad-2.0 delta vs exact ASW in the north-star
form; tests/test_accuracy_regression.py, bench_results/
sep_vs_exact_kitti.json).  The exact-window mode stays measured as
``--preset kitti``.

``vs_baseline``: the reference repo publishes no numbers and its source was
unavailable (SURVEY.md section 0), so the baseline is *measured here*: a
vectorized NumPy implementation of the same symmetric-ASW pipeline (the
reference is single-process CPU code of exactly this class) timed on this
machine on a small crop and extrapolated linearly in window-aggregation work
(H*W*D*w^2 — the O() the algorithm is bound by).  The measurement is cached
in bench_results/cpu_baseline.json.

Usage: python bench.py [--preset kitti|middlebury|tsukuba] [--iters N]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results")

# Headline geometry (BASELINE config 4 class).
GEOM = {
    # Semi-global mode (round 5, beyond-reference): 4-path scanline
    # propagation, jnp/XLA scans (no Pallas kernel needed — the per-step
    # work is a handful of (H, D) vector mins).  The accuracy mode:
    # kitti-hard DENSE bad-2.0 1.4% vs local ASW dense 11%.
    "kitti_sgm": dict(
        height=375, width=1242, max_disparity=128, window_radius=16,
        aggregation="sgm",
    ),
    "kitti": dict(
        height=375, width=1242, max_disparity=128, window_radius=16, y_chunks=8
    ),
    "kitti_box": dict(
        height=375, width=1242, max_disparity=128, window_radius=16,
        aggregation="box",
    ),
    # Separable O(K) speed mode; auto routes onto the hardware-validated
    # asw_sep_dlanes kernel (bench_results/separable_ab.json).
    "kitti_sep": dict(
        height=375, width=1242, max_disparity=128, window_radius=16,
        asw_separable=True, y_chunks=8,
    ),
    # Maximum-throughput mode: separable LEFT-ONLY weights on the
    # banded-MXU horizontal pass (config preset kitti_seplo; accuracy
    # pinned in tests/test_accuracy_regression.py seplo rows).
    "kitti_seplo": dict(
        height=375, width=1242, max_disparity=128, window_radius=16,
        asw_separable=True, asw_symmetric=False, y_chunks=8,
    ),
    "middlebury": dict(height=375, width=450, max_disparity=64, window_radius=16),
    "tsukuba": dict(height=288, width=384, max_disparity=16, window_radius=16),
}


def _work(height, width, max_disparity, window_radius, **_):
    return height * width * max_disparity * (2 * window_radius + 1) ** 2


def _numpy_asw_reference_rate() -> float:
    """pairs/s of a reference-class CPU ASW at KITTI geometry (extrapolated).

    Vectorized NumPy symmetric ASW on a small crop — generously faster than
    the reference's scalar C++ loops — extrapolated by aggregation work.
    """
    cache = os.path.join(BENCH_DIR, "cpu_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["kitti_pairs_per_s"]

    from aswstereomatch_tpu.utils import synthetic, colorspace

    h, w, D, r = 96, 128, 16, 8
    pair = synthetic.make_pair(height=h, width=w, max_disparity=D, seed=0)
    left, right = pair["left"], pair["right"]
    lab_l = colorspace.rgb_to_lab(left, np)
    lab_r = colorspace.rgb_to_lab(right, np)
    gray_l = colorspace.rgb_to_gray(left, np)
    gray_r = colorspace.rgb_to_gray(right, np)
    t0 = time.perf_counter()
    pad = lambda a, yy, xx: np.pad(
        a, [(max(yy, 0), max(-yy, 0)), (max(xx, 0), max(-xx, 0))][: a.ndim]
        + [(0, 0)] * (a.ndim - 2), mode="edge",
    )
    num = np.zeros((h, w, D), np.float32)
    den = np.zeros((h, w, D), np.float32)
    xs = np.arange(w)
    # cost planes
    cost = np.empty((h, w, D), np.float32)
    for d in range(D):
        xr = np.maximum(xs - d, 0)
        ad = np.abs(left - right[:, xr]).mean(-1)
        gd = np.abs(gray_l - gray_r[:, xr])
        cost[..., d] = 0.9 * np.minimum(ad, 40.0) + 0.1 * np.minimum(gd, 10.0)
    labr_sh = [lab_r[:, np.maximum(xs - d, 0)] for d in range(D)]
    for wy in range(-r, r + 1):
        for wx in range(-r, r + 1):
            sd = np.exp(-np.hypot(wy, wx) / 31.0).astype(np.float32)
            # left weight plane
            yy = np.clip(np.arange(h) + wy, 0, h - 1)
            xx = np.clip(xs + wx, 0, w - 1)
            dl = np.sqrt(((lab_l - lab_l[yy][:, xx]) ** 2).sum(-1))
            wl = np.exp(-dl / 14.0) * sd
            ctap = cost[yy][:, xx]
            for d in range(D):
                lr_ = labr_sh[d]
                dr_ = np.sqrt(((lr_ - lr_[yy][:, xx]) ** 2).sum(-1))
                wgt = wl * np.exp(-dr_ / 14.0) * sd
                num[..., d] += wgt * ctap[..., d]
                den[..., d] += wgt
    _ = np.argmin(num / den, axis=-1)
    dt = time.perf_counter() - t0
    rate_crop = 1.0 / dt
    scale = _work(h, w, D, r) / _work(**GEOM["kitti"])
    rate = rate_crop * scale
    os.makedirs(BENCH_DIR, exist_ok=True)
    with open(cache, "w") as f:
        json.dump(
            {
                "kitti_pairs_per_s": rate,
                "crop_seconds": dt,
                "crop_geom": [h, w, D, r],
                "note": "vectorized NumPy symmetric ASW, extrapolated by H*W*D*w^2",
            },
            f,
            indent=2,
        )
    return rate


def _bench_setup(preset: str, backend: str):
    """Preset -> (cfg, left, right, geometry) — shared by the measured bench
    and the --warm-only cache populator so both resolve the same cache key."""
    from aswstereomatch_tpu.config import StereoConfig
    from aswstereomatch_tpu.utils import synthetic

    g = GEOM[preset]
    cfg = StereoConfig(
        max_disparity=g["max_disparity"],
        cost="tad_grad",
        aggregation=g.get("aggregation", "asw"),
        asw_separable=g.get("asw_separable", False),
        asw_symmetric=g.get("asw_symmetric", True),
        window_radius=g["window_radius"],
        lr_check=True,
        fill_holes=True,
        subpixel=True,
        median_filter=True,
        # jnp path at KITTI scale needs row streaming to fit HBM (the fused
        # Pallas kernel needs none of this).
        y_chunks=g.get("y_chunks", 1),
        backend=backend,
    )
    pair = synthetic.make_pair(
        height=g["height"], width=g["width"], max_disparity=g["max_disparity"], seed=0
    )
    import jax.numpy as jnp

    left = jnp.asarray(pair["left"])
    right = jnp.asarray(pair["right"])
    return cfg, left, right, g


def warm_cache(preset: str, backend: str) -> str:
    """Populate the AOT executable cache for a preset and return the compile
    source.  Also executes the pipeline ONCE: the first dispatch of a
    (cache-loaded) executable pays a device/tunnel-side program-load cost
    that was measured at ~230 s in a cold session (round 4: a bench run
    with compile_s=0.5s from aot-cache still missed its 240 s deadline on
    first touch; the identical re-run finished in seconds).  Warming must
    pay that cost here so a subsequent bench never can."""
    from aswstereomatch_tpu.utils import aotcache

    cfg, left, right, _ = _bench_setup(preset, backend)
    fn, source = aotcache.cached_match_pair(cfg, left, right)
    out = fn(left, right)
    float(out[0, 0])  # scalar fetch: block_until_ready is a no-op on axon
    return source


def run_bench(preset: str, iters: int, save: bool = True, backend: str = "auto") -> dict:
    import jax

    cfg, left, right, g = _bench_setup(preset, backend)
    # AOT executable cache: a committed prebuilt binary turns the multi-minute
    # Mosaic cold compile into a ~0.2 s load (utils/aotcache.py), so the
    # driver-run bench lands a live number inside its timeout.
    from aswstereomatch_tpu.utils import aotcache

    t0 = time.perf_counter()
    fn, compile_source = aotcache.cached_match_pair(cfg, left, right)
    compile_s = time.perf_counter() - t0

    def run_blocking(l, r):
        # jax.block_until_ready does not actually block under the axon TPU
        # tunnel (returns in ~0.2ms for 500ms of compute); a scalar fetch
        # forces real completion.
        out = fn(l, r)
        float(out[0, 0])
        return out

    run_blocking(left, right)  # first dispatch
    run_blocking(left, right)  # warm queue drain
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_blocking(left, right)
        times.append(time.perf_counter() - t0)
    best = min(times)
    # Headline: sustained throughput with a full device queue (submit Q
    # dispatches, sync once) — the production serving regime.  Per-call
    # latency (``best_s`` in the detail record) additionally pays the axon
    # tunnel's ~25-50 ms host dispatch round trip per pair, which is an
    # artifact of this environment, not chip work; at sub-100 ms configs it
    # dominates (tsukuba: 40 pairs/s per-call vs 300 queued).
    Q = max(iters, 5)
    t0 = time.perf_counter()
    outs = [fn(left, right) for _ in range(Q)]
    float(outs[-1][0, 0])
    queued_s = (time.perf_counter() - t0) / Q
    rate = 1.0 / queued_s
    base = _numpy_asw_reference_rate() * (
        _work(**GEOM["kitti"]) / _work(**g)
    )
    # Achieved aggregation throughput vs the VPU-bound analysis
    # (docs/ARCHITECTURE.md): symmetric ASW is ~5 flops per (pixel, window
    # tap, disparity) of pure VPU work.
    flops = _work(**g) * 5.0
    result = {
        "metric": f"stereo pairs/s/chip, {preset} ({g['width']}x{g['height']}, "
        f"D={g['max_disparity']}, {g.get('aggregation', 'asw').upper()} "
        f"{2*g['window_radius']+1}x{2*g['window_radius']+1}"
        f"{(' symmetric' if g.get('asw_symmetric', True) else ' left-only') if g.get('aggregation', 'asw') == 'asw' else ''}"
        f"{' separable' if g.get('asw_separable') else ''}"
        " + full postprocess; sustained queued throughput)",
        "value": round(rate, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(rate / base, 2),
    }
    achieved_tflops = flops * rate / 1e12
    if save:
        os.makedirs(BENCH_DIR, exist_ok=True)
        detail = dict(
            result,
            preset=preset,
            backend=backend,
            best_s=best,
            mean_s=float(np.mean(times)),
            queued_s=queued_s,
            compile_s=compile_s,
            compile_source=compile_source,
            iters=iters,
            device=str(jax.devices()[0]),
            backend_cfg_hash=cfg.config_hash(),
            baseline_pairs_per_s=base,
            achieved_window_tflops=round(achieved_tflops, 3),
            achieved_window_tflops_def=(
                "H*W*D*(2r+1)^2 * 5 flops/pair * pairs_per_s / 1e12 — the "
                "EXACT-window-equivalent aggregation rate (~5 VPU flops per "
                "(pixel, window tap, disparity) of symmetric ASW, "
                "docs/ARCHITECTURE.md).  For separable/box modes the "
                "executed work is O(K)/O(1) per tap, so this is an "
                "effective rate (work avoided counts as work done), "
                "comparable across modes; see BASELINE.md "
                "'Speed-of-light accounting'"
            ),
        )
        with open(os.path.join(BENCH_DIR, f"bench_{preset}.json"), "w") as f:
            json.dump(detail, f, indent=2)
    return result


_WARM_PID = os.path.join(BENCH_DIR, "warm_cache.pid")


def _warm_child_alive() -> bool:
    """True if a previously spawned --warm-only child is still running.

    The device is single and access is serialized: a second warm child (or a
    bench racing one) just queues behind the first, starving every later run
    past its deadline — observed live as a self-inflicted pile-up of STALE
    fallbacks.  One warm child at a time."""
    try:
        with open(_WARM_PID) as f:
            pid = int(f.read().strip())
        # The pid file is never reaped (the spawner exits immediately), so
        # guard against pid reuse: it only counts if that pid really is a
        # warm-only bench.
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return b"--warm-only" in f.read()
    except (OSError, ValueError):
        return False


def _cached_fallback(preset: str):
    """Last recorded measurement, marked stale — emitted only if a live run
    can't complete (e.g. the TPU tunnel wedges, which was observed once this
    round; a marked stale line beats a silent hang for the driver)."""
    path = os.path.join(BENCH_DIR, f"bench_{preset}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    return {
        "metric": d["metric"] + " [STALE: cached earlier measurement; live "
        "bench run did not complete before the deadline]",
        "value": d["value"],
        "unit": d["unit"],
        "vs_baseline": d["vs_baseline"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="kitti_sep", choices=sorted(GEOM))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    ap.add_argument(
        "--deadline-s", type=float,
        default=float(os.environ.get("BENCH_DEADLINE_S", 240)),
        help="hard wall-clock budget; past it, emit the cached result "
             "marked STALE instead of hanging",
    )
    ap.add_argument(
        "--warm-only", action="store_true",
        help="compile + populate the AOT executable cache, no deadline, "
             "no output line (spawned detached after a deadline miss so "
             "the next bench run hits the cache)",
    )
    args = ap.parse_args()

    if args.warm_only:
        from aswstereomatch_tpu.utils import devlock

        # Self-watchdog: nothing external times out a detached warmer, and a
        # backend outage blocks init indefinitely — exit rather than hold
        # the device lock for hours.
        import threading

        watchdog = threading.Timer(
            float(os.environ.get("BENCH_WARM_MAX_S", 1800)),
            lambda: os._exit(3),
        )
        watchdog.daemon = True  # a raised TimeoutError must not wait on it
        watchdog.start()
        # Generous lock wait: the warmer must not pile onto a live bench
        # (the exact failure this lock exists for).
        with devlock.device_lock("bench --warm-only", timeout_s=900):
            print(
                f"warm_cache({args.preset}): "
                f"{warm_cache(args.preset, args.backend)}"
            )
        os._exit(0)  # don't wait on the watchdog timer thread

    import threading

    box = {}

    def work():
        try:
            # Inside the deadline-bounded worker: the main thread must reach
            # its one-JSON-line fallback even if package import stalls.
            from aswstereomatch_tpu.utils import devlock

            # Half the deadline for lock wait: a named TimeoutError in the
            # STALE line ("held by pid N (serve)") beats silently queueing
            # on the device past the whole deadline.
            with devlock.device_lock("bench", timeout_s=args.deadline_s / 2):
                box["result"] = run_bench(
                    args.preset, args.iters, backend=args.backend
                )
        except Exception as e:  # noqa: BLE001
            box["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(args.deadline_s)
    if "result" in box:
        print(json.dumps(box["result"]))
        return
    fallback = _cached_fallback(args.preset)
    if fallback is not None:
        if "error" in box:
            fallback["metric"] += f" [live error: {box['error'][:200]}]"
        print(json.dumps(fallback))
    else:
        print(json.dumps({
            "metric": f"bench {args.preset} failed: "
            + box.get("error", "deadline exceeded"),
            "value": 0.0, "unit": "pairs/s/chip", "vs_baseline": 0.0,
        }))
    # Self-heal: exiting now (required — the caller waits on our exit) would
    # kill the worker mid-compile, so the AOT cache would miss identically
    # on every future run.  A detached child redoes compile+cache-save with
    # no deadline; the next bench run then lands a live number instantly.
    if "error" not in box and not _warm_child_alive():
        import subprocess
        import sys

        os.makedirs(BENCH_DIR, exist_ok=True)
        with open(os.path.join(BENCH_DIR, "warm_cache.log"), "ab") as log:
            child = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--preset", args.preset, "--backend", args.backend,
                 "--warm-only"],
                stdout=log, stderr=log, start_new_session=True,
            )
        with open(_WARM_PID, "w") as f:
            f.write(str(child.pid))
    # the worker thread is daemonic; exit without waiting on a wedged device
    os._exit(0)


if __name__ == "__main__":
    main()
