"""Disparity-in-lanes fused kernel for SEPARABLE two-pass ASW.

Implements the ``asw_separable`` speed mode (ops/aggregate.py::
aggregate_asw_separable_from_stacks; oracle models/oracle_numpy.py::
aggregate_asw_separable): a vertical bilateral pass over the x-extended
cost plane, then a horizontal bilateral pass —

    numv[u, d] = sum_dy wvL[u; dy] * wvR[u-d; dy] * C[y+dy, u, d]
    num [x, d] = sum_dx whL[x; dx] * whR[x-d; dx] * numv[x+dx-r, d]

(denominators analogous, right factors only in symmetric mode).  O(K)
window taps per (pixel, d) instead of the exact kernels' O(K^2).

Why this layout wins here: with d in lanes, the d-coupled right factor of
each pass is ONE per-sublane strided lane roll (the Hankel trick from
asw_sym_dlanes) per window offset — K rolls per pass-row instead of the
exact symmetric kernel's K^2 — and every weight build is a small
elementwise column/row op.

Round-3 restructure (full-lane weight builds): the round-2 version built
each left column weight as a (S, 1) exp/sqrt chain — 1/128 lane
utilization — and tools/ablate_sep_kernel.py measured those builds at
**32% of kernel time** (vertical 12%, horizontal 20%; the symmetric-only
Hankel+ehr machinery is just 5%).  Both passes now build ALL K tap
weights for an output row in one full-width plane:

  - vertical: a transposed Lab operand lyt[c] (x in sublanes, IMAGE ROW in
    lanes) is lane-rolled by y once per output row; lane dy then holds the
    row-(y+dy) Lab column, so one exp over (TXU, 128) yields
    cwv[u, dy] = w_color(row y+dy, row y+r) for every dy at once.  The
    per-tap (TXU, 1) weight is a dynamic lane slice (asw_kernel's
    _lane_window roll) instead of a 10-op exp chain.
  - horizontal: a lane-REVERSED center-row Lab operand lhrow (the left-image
    analog of rrev) turns the tap structure cwh[s, dx] = f(lab[s + dx])
    into ONE per-sublane strided roll (tap[s, j] = vrev[j - s] =
    lab_ext[127 - j + s]; column j = 127 - dx is tap dx for every s), so
    one exp over (TXS, 128) yields all K horizontal weights.  TXS + K <=
    129 keeps the roll wrap-free — exactly the supports() bound.

The axial spatial factors fold into the planes as per-LANE constant rows
(swl), preserving the round-2 product order (colw * sw) bit-for-bit.
This also deletes the old lcx operand ((RT, TXU, 128) with 3 useful
lanes — 2.25 MB of ~97%-waste DMA per tile); lyt + lhrow together move
~0.4 MB per tile.

Left-only fast path (round-3 continuation): with d-invariant weights the
horizontal pass IS a banded matrix product — num = B @ numv with
B[s, u] = w_color(LabL(ctr, x0-r+u), LabL(ctr, x0+s)) * sw[u-s] for
u-s in [0, K), zero elsewhere — the same banded-MXU formulation the
exact left-only kernel rides (asw_dlanes v3).  B is three
(TXS,1)-vs-(1,128) broadcast-subtract-squares + one exp, masked by a
spatial band built from _swl_np row 0 with one strided roll
(swb_h[s, u] = sw[(u-s) mod 128]; wraps land at indices >= K where the
row is zero because TXS + K <= 129).  The denominator never enters the
tap loops at all: vertically it is the lane-sum of the cwv plane (the
K taps already live in lanes), horizontally a second B dot against the
broadcast column.  Two (TXS,128)x(128,DL) HIGHEST-precision dots per
output row replace 2K broadcast-FMAs + sublane slices; left-only mode
reads the horizontal-pass left rows UNREVERSED (the lhrow operand) and
never builds cwh.  Symmetric mode is untouched (its right factor
couples (s, dx, d) three ways — the documented MXU blocker).  Decided
by measurement round 4 (tools/ab_lo_hpass.py, on-chip, queued
dispatch): the dot beats the K-tap FMA loop 1.35x at the flagship
left-only geometry (KITTI r=16: 34.9 -> 25.9 ms/pair kernel) and
1.14-1.16x at small r8/r12 (wash at small r16), argmin agreement 100%
at every geometry — so the banded dot IS the left-only horizontal
pass and the FMA branch is deleted (no dark path).

Coordinates (shared with asw_dlanes/asw_sym_dlanes):
  - tile origin x0; output x = x0 + s, s in [0, TXS);
  - cost window sublane u covers x = x0 - r + u, u in [0, TXU);
  - rrev rows are lane-REVERSED right Lab, pre-rolled by -r:
    rrev[y][c, j] = LabR(y, x0 + 128 - r - j)  (virtual padded plane);
  - lhrow rows are left Lab, lane-REVERSED in symmetric mode (the cwh
    tap-roll operand): lhrow[y][c, j] = LabL(y, x0 - r + 127 - j);
    UNREVERSED in left-only mode (the B color operand):
    lhrow[y][c, j] = LabL(y, x0 - r + j);
  - lyt[c][u, j] = LabL(j - r, x0 - r + u)  (image rows in lanes);
  - both Hankel rolls use shift 128 (mod-128 residue 0), so the Mosaic
    strided-roll bound is sublanes-1 < 128: TXU = TXS + 2r <= 128.

Accumulation order per output is tile-origin independent, so
tiled == untiled stays bit-exact.  WTA/subpixel/right-view machinery is
shared with the other d-lanes kernels (_wta_writeback/_assemble_outputs).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import StereoConfig
from .. import preprocess
from . import asw_kernel
from . import asw_dlanes
from .asw_dlanes import (
    TILE_XS,
    TILE_YO,
    XW,
    _assemble_outputs,
    _extract_tiles_3d,
    _padded_volume,
    _ru8,
    _wta_writeback,
)
from .asw_sym_dlanes import EW, MW

def _tile_xs(cfg: StereoConfig) -> int:
    """Adaptive output-tile width: the widest 8-multiple with
    TXS + 2r <= 128 (the strided-roll sublane bound, the cost-window
    width, AND the horizontal weight-plane wrap bound TXS + K <= 129 —
    all three coincide).  Wider tiles cut the vertical pass's TXU/TXS
    read amplification (1.5 -> 1.33 at r=16) and the tile count: measured
    -16.7% kernel time at KITTI, bit-identical argmin (reproduce the
    inverse with tools/ablate_sep_kernel.py geom64, which pins the old
    fixed width).  r=16 -> 96, r=32 -> 64 (the round-2 width)."""
    return (128 - 2 * cfg.window_radius) // 8 * 8


def _txu(cfg: StereoConfig) -> int:
    """Vertical-pass sublane extent: centers for every horizontal tap."""
    return _ru8(_tile_xs(cfg) + 2 * cfg.window_radius)


def supports(cfg: StereoConfig) -> bool:
    """Separable ASW (either weight mode) with D <= 128 and a viable
    adaptive tile (>= 64 wide, i.e. r <= 32 / K <= 65 — the same bound
    the round-2 fixed TXS=64 enforced)."""
    return (
        cfg.aggregation == "asw"
        and cfg.asw_separable
        and 2 <= cfg.max_disparity <= 128
        and _tile_xs(cfg) >= 64
    )


def routed(cfg: StereoConfig) -> bool:
    if not cfg.asw_separable:
        return False
    if cfg.kernel_layout == "dlanes":
        if not supports(cfg):
            raise ValueError(
                "kernel_layout='dlanes' on separable ASW requires "
                "max_disparity in [2, 128] and window_size <= 65"
            )
        return True
    if cfg.kernel_layout == "xlanes":
        # No xlanes kernel exists for this mode; jnp serves the config
        # (an explicit backend='pallas' pin raises in _kernel_wta).
        return False
    # Auto: hardware-validated 2026-08-19 (tools/tpu_smoke.py separable
    # rows PASS; bench_results/separable_ab.json round 3: kernel 11.6
    # pairs/s queued vs jnp 1.01 at KITTI, 30.1 vs 5.8 at venus, argmin
    # agreement 1.0 at 1/16 px) — route every supported geometry onto the
    # kernel; unsupported ones fall to jnp.  No small-problem fallback
    # (unlike the box path's work threshold): at tsukuba — the smallest
    # BASELINE geometry, 384x288 D=16 — the kernel still wins 50.2 vs the
    # jnp path's 29.4 queued (separable_ab_tsukuba.json).
    return supports(cfg)


def _swl_np(cfg: StereoConfig) -> np.ndarray:
    """Axial spatial factors as per-LANE constants, (8, 128):

      row 0: swl[0, dy]       = sw[dy]       for dy < K, else 0
             (multiplies cwv, whose lane dy is the vertical tap dy)
      row 1: swl[1, 127 - dx] = sw[dx]       for dx < K, else 0
             (multiplies cwh, whose lane 127 - dx is the horizontal tap)

    sw[o] = exp(-|o - r| / gamma_p), squared in symmetric mode — identical
    values to the round-2 row constants, relocated into lanes."""
    r = cfg.window_radius
    K = cfg.window_size
    o = np.abs(np.arange(-r, r + 1)).astype(np.float64)
    sw = np.exp(-o / cfg.gamma_spatial)
    if cfg.asw_symmetric:
        sw = sw * sw
    sw = sw.astype(np.float32)
    out = np.zeros((8, 128), np.float32)
    out[0, :K] = sw
    out[1, 127 - np.arange(K)] = sw
    return out


def _compute(
    ct,        # ref view (RT, XW, DL): cost window, d in lanes
    lyt,       # ref view (3, TXU, 128): left Lab, image rows in LANES
    lhrow,     # ref view (RT, 8, 128): left Lab rows (lane-REVERSED in
               # symmetric mode, unreversed in left-only — see docstring)
    rrev,      # ref view (RT, 8, EW): right Lab rows, lane-REVERSED, -r roll
    swl_ref,   # (8, 128) per-lane axial spatial factors (_swl_np)
    nv_ref,    # (1, 1) i32 SMEM: count of real left columns
    bc_ref, bd_ref, cm_ref, cp_ref, rc_ref, rd_ref,  # (1, TXS|J8, TYO)
    u_ref,                                           # (1, TXS, TYO)
    bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,        # (TXS|J8, 128)
    u_sc=None,                                       # (TXS, 128)
    *,
    cfg: StereoConfig,
    nx: int,
    txs: int,
    unroll_v: bool,
):
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    sym = cfg.asw_symmetric
    TYO, TXS = TILE_YO, txs
    TXU = lyt.shape[1]
    DL = 128
    LY = lyt.shape[2]
    K8 = _ru8(K)
    inv_gc = np.float32(1.0 / cfg.gamma_color)

    t = pl.program_id(0)
    x0 = (t % nx) * TXS
    n_valid = nv_ref[0, 0]

    def _hankel(row, sublanes):
        """(1, MW) lane-reversed row -> (sublanes, DL) plane
        M[s, d] = row[(d + 128 - s) mod MW]  (the right factor at
        right-center x0 - r + s - d for the vertical pass, x0 + s - d for
        the horizontal pass — the coordinate shift rides in the row)."""
        b = jnp.broadcast_to(row, (sublanes, MW))
        return pltpu.roll(b, 128, 1, stride=1, stride_axis=0)[:, :DL]

    if not sym:
        # Spatial band for the left-only horizontal dot:
        # swb_h[s, u] = sw[(u - s) mod 128] — in-band entries are sw[u-s]
        # for u-s in [0, K); the minimum wrapped index is (u-s) mod 128 at
        # u=0, s=TXS-1, i.e. 129 - TXS >= K where _swl_np row 0 is zero
        # (exactly the TXS + K <= 129 bound _tile_xs enforces; at r=16,
        # TXS=96, K=33 the bound is TIGHT — 129-96 = 33 — no slack).
        # y-invariant: built once per tile.
        swb_h = pltpu.roll(
            jnp.broadcast_to(swl_ref[0:1, :], (TXS, 128)),
            0, 1, stride=1, stride_axis=0,
        )

    def y_body(y, _):
        # ---- full-lane left weight planes for this output row ------------
        # cwv[u, dy] = exp(-||LabL(y+dy, u) - LabL(y+r, u)|| / gc) * sw[dy]:
        # roll the transposed Lab once so lane j holds image row y + j,
        # then ONE exp covers every vertical tap (ablation: the old per-tap
        # (TXU, 1) chains were 12% of kernel time).
        shift = lax.rem(jnp.int32(LY) - y, jnp.int32(LY))
        d2v = None
        ctrcols = []
        for c in range(3):
            tc = pltpu.roll(lyt[c], shift, axis=1)  # lane j = image row y+j
            ctr = tc[:, r : r + 1]                  # (TXU, 1) center row Lab
            ctrcols.append(ctr)
            diff = tc - ctr
            d2v = diff * diff if d2v is None else d2v + diff * diff
        cwv = jnp.exp(-jnp.sqrt(d2v) * inv_gc) * swl_ref[0:1, :]

        vrow = lhrow[y + r]                         # (8, 128) center left row
        if sym:
            # cwh[s, 127 - dx] = exp(-||LabL(y+r, x0+s+dx-r) -
            # LabL(y+r, x0+s)|| / gc) * sw[dx]: one strided roll of the
            # lane-reversed center row gives tap[s, j] = lab_ext[127-j+s];
            # j = 127 - dx is tap dx for every output column s (wrap-free:
            # TXS + K <= 129).  Left-only skips cwh entirely — its
            # horizontal weights are the B band below.
            d2h = None
            for c in range(3):
                b = jnp.broadcast_to(vrow[c : c + 1, :], (TXS, 128))
                tap = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                dh = tap - ctrcols[c][r : r + TXS, :]
                d2h = dh * dh if d2h is None else d2h + dh * dh
            cwh = jnp.exp(-jnp.sqrt(d2h) * inv_gc) * swl_ref[1:2, :]

        rrow_c = rrev[y + r] if sym else None       # (8, EW) center right row

        # ---- vertical pass: numv/denv over the extended columns ----------
        # Statically unrolled on hardware (like the horizontal pass): the
        # fori form measured 19.6% SLOWER from pure loop machinery —
        # per-trip dynamic-roll weight extraction and trip bookkeeping —
        # at identical compile time (tools/ablate_sep_kernel.py
        # unrollfull_v vs unroll2_v/part2_v/part4_v probes).  Interpret
        # mode keeps the fori driver (unrolled bodies interpret ~6x
        # slower); both drivers accumulate in the SAME per-tap order, so
        # results are bit-identical and the interpret tests validate the
        # math while the hardware gates (tpu_smoke, A/B agreement,
        # tpu_fuzz) validate the unrolled structure.
        zero = jnp.zeros((TXU, DL), jnp.float32)
        if sym:
            def tap(dy, wvl, numv, denv):
                # bf16 storage mode converts on read; accumulation is f32
                # either way (astype is a no-op for f32 volumes)
                crow = ct[y + dy][:TXU, :].astype(jnp.float32)  # (TXU, DL)
                rtap = rrev[y + dy]
                e2 = None
                for c in range(3):
                    dr = rrow_c[c : c + 1, :] - rtap[c : c + 1, :]
                    e2 = dr * dr if e2 is None else e2 + dr * dr
                ev = jnp.exp(-jnp.sqrt(e2) * inv_gc)          # (1, EW)
                # rrev lane j = xr(x0 + 128 - r - j); Hankel wants the
                # vertical right center x0 - r + s - d at [s, d]:
                # row[(d + 128 - s)] = ev at xr = x0 - r + s - d. exact.
                wv = wvl * _hankel(ev[:, :MW], TXU)           # (TXU, DL)
                return numv + wv * crow, denv + wv

            if unroll_v:
                numv, denv = zero, zero
                for dy in range(K):
                    numv, denv = tap(dy, cwv[:, dy : dy + 1], numv, denv)
            else:
                numv, denv = lax.fori_loop(
                    0, K,
                    lambda dy, c: tap(
                        dy, asw_kernel._lane_window(cwv, dy, 1), *c
                    ),
                    (zero, zero), unroll=False,
                )
        else:
            # Left-only vertical pass: d-invariant weights, so each tap is
            # ONE (TXU,1)x(TXU,DL) broadcast FMA and the denominator never
            # enters the loop — the K tap weights already live in cwv's
            # lanes, so denv is a single lane-sum column.
            def tap_lo(dy, wvl, numv):
                return numv + wvl * ct[y + dy][:TXU, :].astype(jnp.float32)

            if unroll_v:
                numv = zero
                for dy in range(K):
                    numv = tap_lo(dy, cwv[:, dy : dy + 1], numv)
            else:
                numv = lax.fori_loop(
                    0, K,
                    lambda dy, nv: tap_lo(
                        dy, asw_kernel._lane_window(cwv, dy, 1), nv
                    ),
                    zero, unroll=False,
                )
            denv_col = jnp.sum(cwv, axis=1, keepdims=True)    # (TXU, 1)

        # ---- horizontal right exp plane, once per y -----------------------
        if sym:
            # ehr[s=dx, j] = exp(-||LabR(y, xr(j)) - LabR(y, xr(j)+s-r)||/gc)
            # via one strided tap roll of the pre-rolled (-r) center row —
            # identical construction to asw_sym_dlanes' E plane with the
            # tap row pinned to the center row.
            crowr = pltpu.roll(rrow_c, r, 1)   # un-rolled center row
            e2 = None
            for c in range(3):
                b = jnp.broadcast_to(rrow_c[c : c + 1, :], (K8, EW))
                tap = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                dr = jnp.broadcast_to(crowr[c : c + 1, :], (K8, EW)) - tap
                e2 = dr * dr if e2 is None else e2 + dr * dr
            ehr = jnp.exp(-jnp.sqrt(e2) * inv_gc)             # (K8, EW)

        # ---- horizontal pass ----------------------------------------------
        if sym:
            # K taps of numv/denv (the d-coupled right factor blocks the
            # MXU here — see the module docstring).
            num = jnp.zeros((TXS, DL), jnp.float32)
            den = jnp.zeros((TXS, DL), jnp.float32)
            for dx in range(K):
                wh = cwh[:, 127 - dx : 128 - dx]              # (TXS, 1)
                wh = wh * _hankel(ehr[dx : dx + 1, :MW], TXS)
                num = num + wh * numv[dx : dx + TXS, :]
                den = den + wh * denv[dx : dx + TXS, :]
        else:
            # Left-only: the pass IS a banded matmul.  B[s, u] =
            # w_color(LabL(ctr, x0-r+u), LabL(ctr, x0+s)) * sw[u-s] in the
            # band u-s in [0, K), zero outside (swb_h mask); vrow is the
            # UNREVERSED center left row, lane u = LabL(ctr, x0-r+u).
            d2h = None
            for c in range(3):
                dh = (
                    jnp.broadcast_to(vrow[c : c + 1, :], (TXS, 128))
                    - ctrcols[c][r : r + TXS, :]
                )
                d2h = dh * dh if d2h is None else d2h + dh * dh
            band = jnp.exp(-jnp.sqrt(d2h) * inv_gc) * swb_h   # (TXS, 128)
            # HIGHEST = one f32 MXU pass; Mosaic rejects HIGH/DEFAULT
            # (asw_dlanes v3 precedent).
            num = jax.lax.dot(
                band, numv,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            den = jax.lax.dot(
                band, jnp.broadcast_to(denv_col, (TXU, DL)),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        _wta_writeback(
            num / den, y, x0, n_valid, D,
            bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc, u_sc,
        )
        return ()

    lax.fori_loop(0, TYO, y_body, (), unroll=False)

    bc_ref[0] = bc_sc[:, :TYO]
    bd_ref[0] = bd_sc[:, :TYO]
    cm_ref[0] = cm_sc[:, :TYO]
    cp_ref[0] = cp_sc[:, :TYO]
    rc_ref[0] = rc_sc[:, :TYO]
    rd_ref[0] = rd_sc[:, :TYO]
    u_ref[0] = u_sc[:, :TYO]


def _kernel_blocked(ct_ref, lyt_ref, lhrow_ref, rrev_ref, *rest, cfg, nx,
                    txs):
    """Interpret/test path: overlapping windows pre-materialized as blocks."""
    _compute(
        ct_ref.at[0], lyt_ref.at[0], lhrow_ref.at[0], rrev_ref.at[0],
        *rest, cfg=cfg, nx=nx, txs=txs, unroll_v=False,
    )


def _kernel_dma(ct_hbm, lyt_hbm, lhrow_hbm, rrev_hbm, swl_ref, nv_ref, *rest,
                cfg, nx, txs):
    """Hardware path: planes stay untiled in HBM; each grid step DMAs its
    overlapping window into VMEM scratch (same scheme as asw_dlanes)."""
    outs, dma, scr = rest[:7], rest[7:15], rest[15:]
    ct_sc, lyt_sc, lhrow_sc, rrev_sc, s0, s1, s2, s3 = dma
    TYO, TXS = TILE_YO, txs
    TXU = lyt_sc.shape[1]
    RT = ct_sc.shape[0]
    t = pl.program_id(0)
    iy, ix = t // nx, t % nx
    copies = [
        pltpu.make_async_copy(
            ct_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, XW), :], ct_sc, s0
        ),
        pltpu.make_async_copy(
            lyt_hbm.at[iy, :, pl.ds(ix * TXS, TXU), :], lyt_sc, s1
        ),
        pltpu.make_async_copy(
            lhrow_hbm.at[ix, pl.ds(iy * TYO, RT)], lhrow_sc, s2
        ),
    ]
    if cfg.asw_symmetric:  # left-only never reads the right-Lab rows
        copies.append(
            pltpu.make_async_copy(
                rrev_hbm.at[ix, pl.ds(iy * TYO, RT)], rrev_sc, s3
            )
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    _compute(
        ct_sc, lyt_sc, lhrow_sc, rrev_sc, swl_ref, nv_ref, *outs, *scr,
        cfg=cfg, nx=nx, txs=txs, unroll_v=True,
    )


def wta_outputs(left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig):
    """Fused separable d-lanes kernel over an image pair; same output dict
    as asw_kernel.wta_outputs (bestd/bestc/cm/cp + rbestd)."""
    if not supports(cfg):
        raise ValueError(
            "separable dlanes kernel requires asw_separable with "
            "max_disparity in [2, 128] and window_size <= 65"
        )
    r = cfg.window_radius
    K = cfg.window_size
    D = cfg.max_disparity
    H, W = left.shape[:2]
    TYO, TXS = TILE_YO, _tile_xs(cfg)
    TXU = _txu(cfg)
    RT = TYO + 2 * r
    DL = 128
    J8 = _ru8(TXS + D - 1)
    ny = math.ceil(H / TYO)
    nx = math.ceil(W / TXS)
    T = ny * nx

    vol = _padded_volume(left, right, cfg, H, W, ny, nx, TYO, TXS)
    if cfg.volume_dtype == "bfloat16":
        # Storage-precision mode: halves the volume's HBM footprint and the
        # per-tile DMA bytes (the kernel's largest operand).  BIG survives
        # the cast (bf16 shares f32's exponent range); reads convert back
        # to f32 in _compute, so WTA/accumulation precision is unchanged —
        # only the stored costs are quantized to bf16's 8-bit mantissa.
        vol = vol.astype(jnp.bfloat16)

    # Left Lab on the virtual padded plane:
    # labx[y, ix*TXS + u] = LabL(y - r, x0 - r + u); padded wide enough for
    # the 128-lane lhrow slices ((nx-1)*TXS + 128 columns).
    lab_l = preprocess.rgb_to_lab(left)
    labx = jnp.pad(
        lab_l,
        ((r, ny * TYO - H + r), (r, (nx - 1) * TXS + 128 - r - W), (0, 0)),
        mode="edge",
    )
    Hp = labx.shape[0]
    # lyt: image rows in LANES, pre-tiled per y-band — (ny, 3, Wx, 128)
    # with [iy, c, x, j] = labx[iy*TYO + j, x, c] (row index clamped to the
    # padded plane).  Pre-tiling keeps the DMA lane window 128-aligned
    # (Mosaic rejects lane-dim slices at non-128-multiple offsets); lanes
    # past RT-1 are edge clones and never read.
    rows = jnp.clip(
        jnp.arange(ny)[:, None] * TYO + jnp.arange(128)[None, :], 0, Hp - 1
    )
    lyt = jnp.transpose(labx[rows], (0, 3, 2, 1))
    # lhrow: left Lab rows per x-tile, channels in sublanes — lane-REVERSED
    # where cwh is built (symmetric mode), UNREVERSED in left-only mode
    # (the horizontal B-band color operand).
    xsl = slice(None, None, -1) if cfg.asw_symmetric else slice(None)
    lhrow = jnp.stack(
        [
            jnp.moveaxis(labx[:, ix * TXS : ix * TXS + 128][:, xsl], 2, 1)
            for ix in range(nx)
        ],
        axis=0,
    )
    lhrow = jnp.pad(lhrow, ((0, 0), (0, 0), (0, 8 - 3), (0, 0)))

    # Reversed right rows, identical to asw_sym_dlanes.  Only the symmetric
    # mode reads them (static branch in _compute; the DMA path skips the
    # copy too) — left-only keeps a minimal dummy so both modes share one
    # kernel signature without building/moving ~EW*Hp*nx of dead data.
    if cfg.asw_symmetric:
        lab_r = preprocess.rgb_to_lab(right)
        labrp = jnp.pad(
            lab_r,
            ((r, ny * TYO - H + r), (255, (nx - 1) * TXS + 129 - W), (0, 0)),
            mode="edge",
        )
        rrev = jnp.stack(
            [
                jnp.moveaxis(labrp[:, ix * TXS : ix * TXS + EW][:, ::-1], 2, 1)
                for ix in range(nx)
            ],
            axis=0,
        )
        rrev = jnp.pad(rrev, ((0, 0), (0, 0), (0, 8 - 3), (0, 0)))
        rrev = jnp.roll(rrev, -r, axis=-1)
    else:
        rrev = jnp.zeros((nx, 8, 8, EW), jnp.float32)

    interpret = asw_kernel._interpret()
    swl = _swl_np(cfg)

    compute_scratch = [
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.int32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.int32),
        pltpu.VMEM((TXS, 128), jnp.float32),  # uniqueness lane-y plane
    ]
    if interpret:
        ctiles = _extract_tiles_3d(vol, ny, nx, TYO, TXS, RT, XW)

        def get_lyt(t):
            iy, ix = t // nx, t % nx
            return lax.dynamic_slice(
                lyt, (iy, 0, ix * TXS, 0), (1, 3, TXU, 128)
            )[0]

        lyttiles = jax.vmap(get_lyt)(jnp.arange(T))

        def get_rows(src):
            def f(t):
                iy, ix = t // nx, t % nx
                return lax.dynamic_slice(
                    src, (ix, iy * TYO, 0, 0), (1, RT, 8, src.shape[-1])
                )[0]

            return jax.vmap(f)(jnp.arange(T))

        lhrowtiles = get_rows(lhrow)
        if cfg.asw_symmetric:
            rrevtiles = get_rows(rrev)
        else:
            rrevtiles = jnp.zeros((T, RT, 8, EW), jnp.float32)
        kern = functools.partial(_kernel_blocked, cfg=cfg, nx=nx, txs=TXS)
        data_in = (ctiles, lyttiles, lhrowtiles, rrevtiles)
        data_specs = [
            pl.BlockSpec(
                (1, RT, XW, DL), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, TXU, 128), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, 8, 128), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, 8, EW), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = compute_scratch
    else:
        kern = functools.partial(_kernel_dma, cfg=cfg, nx=nx, txs=TXS)
        data_in = (vol, lyt, lhrow, rrev)
        data_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 4
        scratch = [
            pltpu.VMEM((RT, XW, DL), vol.dtype),
            pltpu.VMEM((3, TXU, 128), jnp.float32),
            pltpu.VMEM((RT, 8, 128), jnp.float32),
            pltpu.VMEM((RT, 8, EW), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + compute_scratch

    out_shapes = [
        jax.ShapeDtypeStruct((T, TXS, TYO), jnp.float32),  # bestc
        jax.ShapeDtypeStruct((T, TXS, TYO), jnp.int32),    # bestd
        jax.ShapeDtypeStruct((T, TXS, TYO), jnp.float32),  # cm
        jax.ShapeDtypeStruct((T, TXS, TYO), jnp.float32),  # cp
        jax.ShapeDtypeStruct((T, J8, TYO), jnp.float32),   # rbestc partial
        jax.ShapeDtypeStruct((T, J8, TYO), jnp.int32),     # rbestd partial
        jax.ShapeDtypeStruct((T, TXS, TYO), jnp.float32),  # ubest
    ]
    in_specs = data_specs + [
        pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        )
    ] * 4 + [
        pl.BlockSpec(
            (1, J8, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        )
    ] * 2 + [
        pl.BlockSpec(
            (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    bc, bd, cm, cp, rc, rd, u = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=asw_kernel.VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=T * TYO * K * (4 * TXU + 6 * TXS) * DL,
            bytes_accessed=T * (RT * XW * DL + 3 * TXU * 128) * 4,
            transcendentals=T * TYO * (2 * TXU + TXS + K * EW + _ru8(K) * EW),
        ),
    )(
        *data_in,
        jnp.asarray(swl),
        jnp.asarray(W, jnp.int32).reshape(1, 1),
    )

    return _assemble_outputs(bc, bd, cm, cp, rc, rd, ny, nx, H, W, D,
                             TYO, TXS, u=u)
