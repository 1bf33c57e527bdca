"""Ablation harness for the symmetric x-lanes kernel (perf analysis only).

Monkeypatches asw_kernel._accumulate with variants that REMOVE one class of
work (results become wrong — this measures cost shares, not correctness):

  baseline : shipped kernel, untouched
  norot    : right-weight lane rotate replaced by a static slice
  noden    : den FMA dropped from the inner (dy, d, dx) loop
  nomul    : wL*wR product mul dropped (num uses wL only)
  noexp    : bilateral weight build (exp/sqrt) replaced by spatial-only
  nowta    : accumulation kept, online dual-WTA loop reduced to a copy

Restructure candidates (numerically identical to baseline, candidate
replacements — measured here before porting into the kernel):

  dxrot    : per-dx (TY, TXR) rotates inside the dx loop instead of one
             bulk (K, TY, TXR) rotate per d (the bulk result spills to
             VMEM scratch and is re-read; per-plane rotates can stay in
             vregs straight into the FMA)
  geom256  : TILE_X=256, TILE_Y=16 — rotate/slice overhead per output
             scales with TXR/TX = (TX + D - 1)/TX: 2.0 at TX=128 vs 1.5
             at TX=256 (vreg count per FMA op unchanged)
  geom384  : TILE_X=384, TILE_Y=8 — ratio 1.33
  dxrot_geom256 : both

Slice-cost ablations (wrong results, quantify unaligned-slice overhead):

  crow_al  : crow[:, dx:dx+TX] replaced by the aligned crow[:, :TX]
  dxrot_crow_al : both of the above

Usage: python tools/ablate_sym_kernel.py [variant ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.ops.pallas import asw_kernel as AK
from aswstereomatch_tpu.utils import synthetic

from jax.experimental.pallas import tpu as pltpu
import jax.experimental.pallas as pl


def make_accumulate(mode: str):
    _lane_window = AK._lane_window
    _row_window = AK._row_window
    _ru128 = AK._ru128
    TILE_X = AK.TILE_X

    def _accumulate(cfg, lpatch_ref, rpatch_ref, sw_ref, cost_sc, num_sc,
                    den_sc, slrow_sc, srrow_sc, ty, tx=None):
        r = cfg.window_radius
        K = 2 * r + 1
        D = cfg.max_disparity
        TY, TX = ty, (tx if tx is not None else TILE_X)
        TXR = _ru128(TX + D - 1)
        sym = cfg.asw_symmetric
        inv_gc = np.float32(1.0 / cfg.gamma_color)

        cl = [lpatch_ref[0, 4 + c, r : r + TY, r : r + TX] for c in range(3)]
        cr = [rpatch_ref[0, 4 + c, r : r + TY, r : r + TXR] for c in range(3)]

        def dy_body(dy, _):
            swr = sw_ref[pl.ds(dy, 1), :][0]
            lrow = [_row_window(lpatch_ref[0, 4 + c], dy, TY) for c in range(3)]
            rrow = [_row_window(rpatch_ref[0, 4 + c], dy, TY) for c in range(3)]
            for dx in range(K):
                if mode == "noexp":
                    slrow_sc[dx] = jnp.full((TY, TX), 1.0, jnp.float32) * swr[dx]
                    srrow_sc[dx] = jnp.full((TY, TXR), 1.0, jnp.float32) * swr[dx]
                    continue
                d2 = jnp.zeros((TY, TX), jnp.float32)
                for c in range(3):
                    diff = lrow[c][:, dx : dx + TX] - cl[c]
                    d2 = d2 + diff * diff
                slrow_sc[dx] = jnp.exp(-jnp.sqrt(d2) * inv_gc) * swr[dx]
                d2r = jnp.zeros((TY, TXR), jnp.float32)
                for c in range(3):
                    diffr = rrow[c][:, dx : dx + TXR] - cr[c]
                    d2r = d2r + diffr * diffr
                srrow_sc[dx] = jnp.exp(-jnp.sqrt(d2r) * inv_gc) * swr[dx]

            if mode.startswith("u") and mode[1:].isdigit():
                U = int(mode[1:])
            else:
                U = 2 if D % 2 == 0 else 1

            dxrot = mode in ("dxrot", "dxrot_crow_al")
            crow_al = mode in ("crow_al", "dxrot_crow_al")

            def d_group(g, _):
                slrow = slrow_sc[...]
                srbulk = None if dxrot else srrow_sc[...]
                for u in range(U):
                    d = g * U + u
                    crow = _row_window(cost_sc[d], dy, TY)
                    if mode == "norot":
                        srs = srbulk[..., :TX]
                    elif dxrot:
                        srs = None
                    else:
                        srs = _lane_window(srbulk, (D - 1) - d, TX)
                    LANES = 4
                    nums = [jnp.zeros((TY, TX), jnp.float32) for _ in range(LANES)]
                    dens = [jnp.zeros((TY, TX), jnp.float32) for _ in range(LANES)]
                    for j, dx in enumerate(range(K)):
                        if mode == "nomul":
                            t_ = slrow[dx]
                        elif dxrot:
                            srs_dx = _lane_window(
                                srrow_sc[dx], (D - 1) - d, TX
                            )
                            t_ = slrow[dx] * srs_dx
                        else:
                            t_ = slrow[dx] * srs[dx]
                        k = j % LANES
                        ctap = crow[:, :TX] if crow_al else crow[:, dx : dx + TX]
                        nums[k] = nums[k] + t_ * ctap
                        if mode != "noden":
                            dens[k] = dens[k] + t_
                    num_sc[d] = num_sc[d] + ((nums[0] + nums[1]) + (nums[2] + nums[3]))
                    if mode != "noden":
                        den_sc[d] = den_sc[d] + (
                            (dens[0] + dens[1]) + (dens[2] + dens[3])
                        )
                return ()

            lax.fori_loop(0, D // U, d_group, (), unroll=False)
            return ()

        lax.fori_loop(0, K, dy_body, (), unroll=False)

    return _accumulate


GEOM = {  # variant suffix -> (TILE_X, TILE_Y)
    "geom256": (256, 16),
    "geom256y8": (256, 8),
    "geom384": (384, 8),
}


def run(variant: str, left, right, cfg):
    orig = AK._accumulate
    orig_tx, orig_ty = AK._tile_x, AK._tile_y
    try:
        accum_mode = variant
        for suffix, (tx, ty) in GEOM.items():
            if variant.endswith(suffix):
                # Pin the geometry by overriding the adaptive chooser
                # functions (the kernel no longer reads TILE_X/TILE_Y
                # globals on its hot path).
                AK._tile_x = lambda w, d, _tx=tx: _tx
                AK._tile_y = lambda h, t=None, _ty=ty: _ty
                accum_mode = variant[: -len(suffix)].rstrip("_") or "baseline"
        if accum_mode != "baseline":
            AK._accumulate = make_accumulate(accum_mode)

        fn = jax.jit(lambda l, r: AK.wta_outputs(l, r, cfg))
        t0 = time.perf_counter()
        out = fn(left, right)
        float(out["bestc"][0, 0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(left, right)
            float(out["bestc"][0, 0])
            times.append(time.perf_counter() - t0)
        return min(times), compile_s, np.asarray(out["bestd"])
    finally:
        AK._accumulate = orig
        AK._tile_x, AK._tile_y = orig_tx, orig_ty


def main():
    variants = sys.argv[1:] or [
        "baseline", "norot", "noden", "nomul", "noexp"
    ]
    cfg = StereoConfig(
        max_disparity=128, cost="tad_grad", aggregation="asw",
        window_radius=16, backend="pallas",
    )
    pair = synthetic.make_pair(height=375, width=1242, max_disparity=128, seed=0)
    left = jnp.asarray(pair["left"])
    right = jnp.asarray(pair["right"])
    # ABLATE_BASE_S skips re-measuring the (slow-compiling) baseline when its
    # time is already known; agreement is then checked vs the first variant.
    base = float(os.environ["ABLATE_BASE_S"]) if "ABLATE_BASE_S" in os.environ else None
    base_d = None
    # numerically identical variants (restructures, not ablations)
    exact_modes = (
        "baseline", "dxrot", "geom256", "geom256y8", "geom384",
        "dxrot_geom256", "u4", "u8",
    )
    for v in variants:
        best, comp, bestd = run(v, left, right, cfg)
        if v == "baseline":
            base, base_d = best, bestd
        if base_d is None and v in exact_modes:
            base_d = bestd  # first exact variant anchors agreement checks
        agree = ""
        if base_d is not None and v in exact_modes and v != "baseline":
            agree = f"  argmin agree {100*np.mean(bestd == base_d):.4f}%"
        delta = f"  saves {base - best:+.4f}s ({100*(base-best)/base:.1f}%)" if (
            base is not None and v != "baseline") else ""
        print(f"{v:14s} kernel best {best:.4f}s  compile {comp:.1f}s{delta}{agree}",
              flush=True)


if __name__ == "__main__":
    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("ablate_sym_kernel", timeout_s=120):
        main()
