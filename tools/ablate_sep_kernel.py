"""Ablation harness for the separable d-lanes kernel (perf analysis only).

Monkeypatches asw_sep_dlanes._compute with variants that REMOVE one class
of work (results become wrong — this measures cost shares):

  baseline  : shipped kernel, untouched
  nocolw_v  : vertical full-lane weight plane (cwv) build -> spatial row
  nocolw_h  : horizontal full-lane weight plane (cwh) build -> spatial row
  nocolw    : both
  noroll_v  : per-tap dynamic lane roll (cwv column extract) -> static
              column (isolates the _lane_window extraction cost)
  nosym     : all right factors off (Hankel rolls + ehr build) — the
              left-only cost structure with symmetric routing overheads
  noehr     : ehr exp-plane build replaced by a constant (keeps the
              per-tap Hankel rolls)
  nowta     : _wta_writeback reduced to plain scratch writes (drops the
              log-shear right-view partial + lane argmin reductions)

Exact restructures (numerically identical; argmin-agreement checked):

  geom64    : pin TILE_XS=64 (the round-2 fixed width; the shipped kernel
              adapts to (128 - 2r)//8*8 = 96 at r=16 — measured -16.7%)
  geom_y32  : TILE_YO=32 (halves the DMA halo re-read: RT/TYO 3 -> 2;
              measured flat)

Round-2 kernel shares measured with the pre-restructure version of this
tool (KITTI, baseline 0.1533 s): per-tap (S, 1) column-weight exp chains
12% (vertical) + 20% (horizontal) = 32%, right-factor machinery 5%, ehr
3% — the numbers that motivated the round-3 full-lane-plane restructure.

Usage: python tools/ablate_sep_kernel.py [variant ...]
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.ops.pallas import asw_dlanes as AD
from aswstereomatch_tpu.ops.pallas import asw_kernel as AK
from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes as ASD
from aswstereomatch_tpu.ops.pallas.asw_sym_dlanes import EW, MW
from aswstereomatch_tpu.utils import synthetic


_MODES = frozenset({
    "nocolw_v", "nocolw_h", "nocolw", "noroll_v", "nosym", "noehr", "nowta",
    "noden_v",  # drop the vertical denv accumulator: halves the vertical
                # fori's loop-carried vreg state (numv+denv = 32 vregs at
                # TXU=128) — a spill probe, not a work-share measurement.
                # Saving >> the ~5% den-FMA work implicates register
                # spills as the hidden accumulate-path cost.
                # MEASURED: 1.0% — no spills, and the den FMA is ~free.
    "part2_v",  # 2-way partial accumulators in the vertical fori (merge
                # after): breaks the 33-long serial numv/denv dependency
                # chain — the latency probe.  Changes summation order
                # (argmin-agreement checked, not bit-exact).
                # MEASURED: -7.5% — the chain is real.
    "unroll2_v",  # two taps per fori iteration, SINGLE accumulator: same
                  # dependency chain, half the loop trips — separates loop
                  # overhead from latency (bit-exact order).
                  # MEASURED: -9.1% — loop overhead, not latency, binds.
    "part4_v",  # 4-way partials: deeper latency hiding, 4x accumulator
                # state (64 vregs live).  MEASURED: -4.9% (worse than 2).
    "unrollfull_v",  # full static unroll of the vertical dy loop (the
                     # horizontal pass's existing structure): no fori
                     # machinery at all, per-tap weights become static
                     # lane slices of cwv.  Bit-exact order.
})


def make_compute(mode: str):
    if mode not in _MODES:
        # an unknown mode would silently measure the baseline kernel under
        # a wrong label (every removal flag reads as enabled)
        raise ValueError(f"unknown ablation mode {mode!r}; one of {sorted(_MODES)}")

    def _compute(ct, lyt, lrev, rrev, swl_ref, nv_ref, *outs_scratch,
                 cfg, nx, txs):
        bc_ref, bd_ref, cm_ref, cp_ref, rc_ref, rd_ref = outs_scratch[:6]
        bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc = outs_scratch[6:]
        r = cfg.window_radius
        K = 2 * r + 1
        D = cfg.max_disparity
        sym = cfg.asw_symmetric and mode != "nosym"
        TYO, TXS = ASD.TILE_YO, txs
        TXU = lyt.shape[1]
        DL = 128
        LY = lyt.shape[2]
        K8 = ASD._ru8(K)
        inv_gc = np.float32(1.0 / cfg.gamma_color)
        colw_v = mode not in ("nocolw_v", "nocolw")
        colw_h = mode not in ("nocolw_h", "nocolw")

        t = pl.program_id(0)
        x0 = (t % nx) * TXS
        n_valid = nv_ref[0, 0]

        def _hankel(row, sublanes):
            b = jnp.broadcast_to(row, (sublanes, MW))
            return pltpu.roll(b, 128, 1, stride=1, stride_axis=0)[:, :DL]

        def y_body(y, _):
            shift = lax.rem(jnp.int32(LY) - y, jnp.int32(LY))
            d2v = None
            ctrcols = []
            for c in range(3):
                tc = pltpu.roll(lyt[c], shift, axis=1)
                ctr = tc[:, r : r + 1]
                ctrcols.append(ctr)
                diff = tc - ctr
                d2v = diff * diff if d2v is None else d2v + diff * diff
            if colw_v:
                cwv = jnp.exp(-jnp.sqrt(d2v) * inv_gc) * swl_ref[0:1, :]
            else:
                cwv = jnp.broadcast_to(swl_ref[0:1, :], (TXU, 128))

            vrow = lrev[y + r]
            if colw_h:
                d2h = None
                for c in range(3):
                    b = jnp.broadcast_to(vrow[c : c + 1, :], (TXS, 128))
                    tap = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                    dh = tap - ctrcols[c][r : r + TXS, :]
                    d2h = dh * dh if d2h is None else d2h + dh * dh
                cwh = jnp.exp(-jnp.sqrt(d2h) * inv_gc) * swl_ref[1:2, :]
            else:
                # derive from real data: a pure-constant plane folds the
                # later (TXS, 1) lane slice into a (1,1)->full broadcast,
                # which Mosaic can't lower
                cwh = (
                    ctrcols[0][r : r + TXS, :] * np.float32(0.0)
                    + swl_ref[1:2, :]
                )

            rrow_c = rrev[y + r] if sym else None

            def dy_body(dy, carry):
                numv, denv = carry
                if mode == "noroll_v":
                    wvl = cwv[:, :1]
                elif isinstance(dy, int):  # static unroll: plain lane slice
                    wvl = cwv[:, dy : dy + 1]
                else:
                    wvl = AK._lane_window(cwv, dy, 1)
                crow = ct[y + dy][:TXU, :]
                if sym:
                    rtap = rrev[y + dy]
                    if mode == "noehr":
                        ev = rtap[0:1, :] * np.float32(0.0) + np.float32(1.0)
                    else:
                        e2 = None
                        for c in range(3):
                            dr = rrow_c[c : c + 1, :] - rtap[c : c + 1, :]
                            e2 = dr * dr if e2 is None else e2 + dr * dr
                        ev = jnp.exp(-jnp.sqrt(e2) * inv_gc)
                    wv = wvl * _hankel(ev[:, :MW], TXU)
                else:
                    wv = jnp.broadcast_to(wvl, (TXU, DL))
                numv = numv + wv * crow
                denv = denv + wv
                return (numv, denv)

            if mode == "part2_v":
                zero = jnp.zeros((TXU, DL), jnp.float32)

                def dy_pair(i, carry):
                    na, da, nb, db = carry
                    na, da = dy_body(2 * i, (na, da))
                    nb, db = dy_body(2 * i + 1, (nb, db))
                    return (na, da, nb, db)

                na, da, nb, db = lax.fori_loop(
                    0, K // 2, dy_pair, (zero, zero, zero, zero),
                    unroll=False,
                )
                if K % 2:
                    na, da = dy_body(jnp.int32(K - 1), (na, da))
                numv, denv = na + nb, da + db
            elif mode == "part4_v":
                zero = jnp.zeros((TXU, DL), jnp.float32)

                def dy_quad(i, carry):
                    parts = list(carry)
                    for j in range(4):
                        parts[2 * j], parts[2 * j + 1] = dy_body(
                            4 * i + j, (parts[2 * j], parts[2 * j + 1])
                        )
                    return tuple(parts)

                parts = lax.fori_loop(
                    0, K // 4, dy_quad, (zero,) * 8, unroll=False
                )
                parts = list(parts)
                for dy in range(4 * (K // 4), K):
                    parts[0], parts[1] = dy_body(
                        jnp.int32(dy), (parts[0], parts[1])
                    )
                numv = ((parts[0] + parts[2]) + (parts[4] + parts[6]))
                denv = ((parts[1] + parts[3]) + (parts[5] + parts[7]))
            elif mode == "unrollfull_v":
                zero = jnp.zeros((TXU, DL), jnp.float32)
                numv, denv = zero, zero
                for dy in range(K):
                    numv, denv = dy_body(dy, (numv, denv))
            elif mode == "unroll2_v":
                zero = jnp.zeros((TXU, DL), jnp.float32)

                def dy_two(i, carry):
                    carry = dy_body(2 * i, carry)
                    return dy_body(2 * i + 1, carry)

                numv, denv = lax.fori_loop(
                    0, K // 2, dy_two, (zero, zero), unroll=False
                )
                if K % 2:
                    numv, denv = dy_body(jnp.int32(K - 1), (numv, denv))
            elif mode == "noden_v":
                # single-carry probe: numv only (16 vregs live vs 32)
                def dy_num_only(dy, nv):
                    n2, _ = dy_body(dy, (nv, nv * np.float32(0.0)))
                    return n2

                numv = lax.fori_loop(
                    0, K, dy_num_only,
                    jnp.zeros((TXU, DL), jnp.float32), unroll=False,
                )
                denv = numv * np.float32(0.0) + np.float32(1.0)
            else:
                numv, denv = lax.fori_loop(
                    0, K, dy_body,
                    (jnp.zeros((TXU, DL), jnp.float32),
                     jnp.zeros((TXU, DL), jnp.float32)),
                    unroll=False,
                )

            if sym:
                crowr = pltpu.roll(rrow_c, r, 1)
                if mode == "noehr":
                    ehr = jnp.broadcast_to(crowr[0:1, :], (K8, EW))
                else:
                    e2 = None
                    for c in range(3):
                        b = jnp.broadcast_to(rrow_c[c : c + 1, :], (K8, EW))
                        tap = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                        dr = jnp.broadcast_to(
                            crowr[c : c + 1, :], (K8, EW)
                        ) - tap
                        e2 = dr * dr if e2 is None else e2 + dr * dr
                    ehr = jnp.exp(-jnp.sqrt(e2) * inv_gc)

            num = jnp.zeros((TXS, DL), jnp.float32)
            den = jnp.zeros((TXS, DL), jnp.float32)
            for dx in range(K):
                wh = cwh[:, 127 - dx : 128 - dx]
                if sym:
                    wh = wh * _hankel(ehr[dx : dx + 1, :MW], TXS)
                num = num + wh * numv[dx : dx + TXS, :]
                den = den + wh * denv[dx : dx + TXS, :]

            if mode == "nowta":
                agg = num / den
                J8 = rc_sc.shape[0]
                bc_sc[...] = jnp.broadcast_to(agg[:, :1], (TXS, 128))
                bd_sc[...] = jnp.zeros((TXS, 128), jnp.int32)
                cm_sc[...] = bc_sc[...]
                cp_sc[...] = bc_sc[...]
                rc_sc[...] = jnp.concatenate(
                    [agg, jnp.zeros((J8 - TXS, 128), jnp.float32)], axis=0
                )
                rd_sc[...] = jnp.zeros((J8, 128), jnp.int32)
            else:
                ASD._wta_writeback(
                    num / den, y, x0, n_valid, D,
                    bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,
                )
            return ()

        lax.fori_loop(0, TYO, y_body, (), unroll=False)

        bc_ref[0] = bc_sc[:, :TYO]
        bd_ref[0] = bd_sc[:, :TYO]
        cm_ref[0] = cm_sc[:, :TYO]
        cp_ref[0] = cp_sc[:, :TYO]
        rc_ref[0] = rc_sc[:, :TYO]
        rd_ref[0] = rd_sc[:, :TYO]

    return _compute


GEOM = {  # suffix -> (tile_xs override or None, TILE_YO)
    "geom64": (64, ASD.TILE_YO),   # the round-2 fixed width, for reference
    "geom_y32": (None, 32),
    "geom_y8": (None, 8),
}

# Config-level variants (run through the SHIPPED kernel, no monkeypatch):
CFGV = {
    "bf16vol": dict(volume_dtype="bfloat16"),  # storage-precision mode
}


def run(variant: str, left, right, cfg):
    orig_compute = ASD._compute
    orig_tile_xs, orig_yo = ASD._tile_xs, ASD.TILE_YO
    try:
        accum_mode = variant
        for suffix, (txs, tyo) in GEOM.items():
            if variant.endswith(suffix):
                if txs is not None:
                    ASD._tile_xs = lambda cfg, _t=txs: _t
                ASD.TILE_YO = tyo
                accum_mode = variant[: -len(suffix)].rstrip("_") or "baseline"
        for suffix, overrides in CFGV.items():
            if variant.endswith(suffix):
                cfg = cfg.replace(**overrides)
                accum_mode = variant[: -len(suffix)].rstrip("_") or "baseline"
        if accum_mode != "baseline":
            ASD._compute = make_compute(accum_mode)

        fn = jax.jit(lambda l, r: ASD.wta_outputs(l, r, cfg))
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
        ASD._compute = orig_compute
        ASD._tile_xs, ASD.TILE_YO = orig_tile_xs, orig_yo


def main():
    variants = sys.argv[1:] or [
        "baseline", "nocolw_v", "nocolw_h", "nocolw", "noroll_v", "nosym",
        "noehr", "nowta", "geom64", "geom_y32",
    ]
    cfg = StereoConfig(
        max_disparity=128, cost="tad_grad", aggregation="asw",
        window_radius=16, asw_separable=True, backend="pallas",
    )
    pair = synthetic.make_pair(
        height=375, width=1242, max_disparity=128, seed=0
    )
    left = jnp.asarray(pair["left"])
    right = jnp.asarray(pair["right"])
    base = float(os.environ["ABLATE_BASE_S"]) if "ABLATE_BASE_S" in os.environ else None
    base_d = None
    # agreement printed for restructures (exact) and bf16vol (approx —
    # its agreement number IS the accuracy result)
    exact_modes = ("baseline", "geom64", "geom_y32", "geom_y8", "bf16vol")
    for v in variants:
        best, comp, bestd = run(v, left, right, cfg)
        if v == "baseline":
            base, base_d = best, bestd
        if base_d is None and v in exact_modes:
            base_d = bestd
        agree = ""
        if base_d is not None and v in exact_modes and v != "baseline":
            agree = f"  argmin agree {100*np.mean(bestd == base_d):.4f}%"
        delta = f"  saves {base - best:+.4f}s ({100*(base-best)/base:.1f}%)" if (
            base is not None and v != "baseline") else ""
        print(f"{v:12s} kernel best {best:.4f}s  compile {comp:.1f}s{delta}{agree}",
              flush=True)


if __name__ == "__main__":
    from aswstereomatch_tpu.utils import devlock

    with devlock.device_lock("ablate_sep_kernel", timeout_s=300):
        main()
