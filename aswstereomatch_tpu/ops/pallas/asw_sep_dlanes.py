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
elementwise column/row op (same-column vertical diffs need no shuffles at
all).  Per output row the inner work is ~2K rolls + ~6K FMAs vs the exact
symmetric kernel's ~K^2 (roll + 2 FMA): ~10x less shuffle-network traffic,
the resource both d-lanes symmetric kernels are bound by.

Coordinates (shared with asw_dlanes/asw_sym_dlanes):
  - tile origin x0; output x = x0 + s, s in [0, TXS);
  - cost/Lab window sublane u covers x = x0 - r + u, u in [0, TXU);
  - rrev rows are lane-REVERSED right Lab, pre-rolled by -r:
    rrev[y][c, j] = LabR(y, x0 + 128 - r - j)  (virtual padded plane);
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


def _txu(cfg: StereoConfig) -> int:
    """Vertical-pass sublane extent: centers for every horizontal tap."""
    return _ru8(TILE_XS + 2 * cfg.window_radius)


def supports(cfg: StereoConfig) -> bool:
    """Separable ASW (either weight mode) with D <= 128 and the extended
    column extent within one lane vreg (TXS + 2r <= 128, i.e. K <= 65 —
    the strided-roll sublane bound AND the cost-window width)."""
    return (
        cfg.aggregation == "asw"
        and cfg.asw_separable
        and 2 <= cfg.max_disparity <= 128
        and TILE_XS + 2 * cfg.window_radius <= min(XW, 128)
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
    # rows PASS; bench_results/separable_ab.json: kernel 5.93 pairs/s vs
    # jnp 0.99 at KITTI, argmin agreement 1.0 at 1/16 px) — route every
    # supported geometry onto the kernel; unsupported ones fall to jnp.
    return supports(cfg)


def _axial_sw_np(cfg: StereoConfig) -> np.ndarray:
    """Per-pass spatial factors as full lane rows (the dynamic-sublane-row
    read pattern asw_sym_dlanes uses on hardware): out[o, :] =
    exp(-|o - r| / gamma_p)^(2 if symmetric else 1), zero rows beyond K."""
    r = cfg.window_radius
    K = cfg.window_size
    o = np.abs(np.arange(-r, r + 1)).astype(np.float64)
    sw = np.exp(-o / cfg.gamma_spatial)
    if cfg.asw_symmetric:
        sw = sw * sw
    out = np.zeros((_ru8(K), 128), np.float32)
    out[:K, :] = sw.astype(np.float32)[:, None]
    return out


def _compute(
    ct,        # ref view (RT, XW, DL): cost window, d in lanes
    lcx,       # ref view (RT, TXU, 128): left Lab extended columns
    rrev,      # ref view (RT, 8, EW): right Lab rows, lane-REVERSED, -r roll
    sw_ref,    # (K8, 128) axial spatial factors sw_ref[o, :], zero rows > K
    nv_ref,    # (1, 1) i32 SMEM: count of real left columns
    bc_ref, bd_ref, cm_ref, cp_ref, rc_ref, rd_ref,  # (1, TXS|J8, TYO)
    bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,        # (TXS|J8, 128)
    *,
    cfg: StereoConfig,
    nx: int,
):
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    sym = cfg.asw_symmetric
    TYO, TXS = TILE_YO, TILE_XS
    TXU = lcx.shape[1]
    DL = 128
    K8 = _ru8(K)
    inv_gc = np.float32(1.0 / cfg.gamma_color)

    t = pl.program_id(0)
    x0 = (t % nx) * TXS
    n_valid = nv_ref[0, 0]

    def _col_w(rows_a, rows_b):
        """exp(-||Lab_a - Lab_b|| / gc) per sublane -> (S, 1)."""
        d2 = None
        for c in range(3):
            diff = rows_a[:, c : c + 1] - rows_b[:, c : c + 1]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        return jnp.exp(-jnp.sqrt(d2) * inv_gc)

    def _hankel(row, sublanes):
        """(1, MW) lane-reversed row -> (sublanes, DL) plane
        M[s, d] = row[(d + 128 - s) mod MW]  (the right factor at
        right-center x0 - r + s - d for the vertical pass, x0 + s - d for
        the horizontal pass — the coordinate shift rides in the row)."""
        b = jnp.broadcast_to(row, (sublanes, MW))
        return pltpu.roll(b, 128, 1, stride=1, stride_axis=0)[:, :DL]

    def y_body(y, _):
        lrow_c = lcx[y + r]                  # (TXU, 128) center Lab columns
        rrow_c = rrev[y + r] if sym else None  # (8, EW) center right row

        # ---- vertical pass: numv/denv over the extended columns ----------
        def dy_body(dy, carry):
            numv, denv = carry
            # (TXU, 1) * (128,) spatial row -> (TXU, DL) weight plane
            wvl = _col_w(lrow_c, lcx[y + dy]) * sw_ref[dy]
            crow = ct[y + dy][:TXU, :]                        # (TXU, DL)
            if sym:
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
            else:
                wv = wvl
            numv = numv + wv * crow
            denv = denv + wv
            return (numv, denv)

        numv, denv = lax.fori_loop(
            0, K, dy_body,
            (jnp.zeros((TXU, DL), jnp.float32),
             jnp.zeros((TXU, DL), jnp.float32)),
            unroll=False,
        )

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

        # ---- horizontal pass: K taps of numv/denv -------------------------
        lrow_out = lrow_c[r : r + TXS, :]      # center Lab at the outputs
        num = jnp.zeros((TXS, DL), jnp.float32)
        den = jnp.zeros((TXS, DL), jnp.float32)
        for dx in range(K):
            wh = _col_w(lrow_out, lrow_c[dx : dx + TXS, :]) * sw_ref[dx]
            if sym:
                wh = wh * _hankel(ehr[dx : dx + 1, :MW], TXS)
            num = num + wh * numv[dx : dx + TXS, :]
            den = den + wh * denv[dx : dx + TXS, :]

        _wta_writeback(
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


def _kernel_blocked(ct_ref, lcx_ref, rrev_ref, *rest, cfg, nx):
    """Interpret/test path: overlapping windows pre-materialized as blocks."""
    _compute(
        ct_ref.at[0], lcx_ref.at[0], rrev_ref.at[0], *rest, cfg=cfg, nx=nx
    )


def _kernel_dma(ct_hbm, lcx_hbm, rrev_hbm, sw_ref, nv_ref, *rest, cfg, nx):
    """Hardware path: planes stay untiled in HBM; each grid step DMAs its
    overlapping window into VMEM scratch (same scheme as asw_dlanes)."""
    outs, dma, scr = rest[:6], rest[6:12], rest[12:]
    ct_sc, lcx_sc, rrev_sc, s0, s1, s2 = dma
    TYO, TXS = TILE_YO, TILE_XS
    TXU = lcx_sc.shape[1]
    RT = ct_sc.shape[0]
    t = pl.program_id(0)
    iy, ix = t // nx, t % nx
    copies = [
        pltpu.make_async_copy(
            ct_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, XW), :], ct_sc, s0
        ),
        pltpu.make_async_copy(
            lcx_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, TXU), :],
            lcx_sc, s1,
        ),
    ]
    if cfg.asw_symmetric:  # left-only never reads the right-Lab rows
        copies.append(
            pltpu.make_async_copy(
                rrev_hbm.at[ix, pl.ds(iy * TYO, RT)], rrev_sc, s2
            )
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    _compute(ct_sc, lcx_sc, rrev_sc, sw_ref, nv_ref, *outs, *scr, cfg=cfg, nx=nx)


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
    TYO, TXS = TILE_YO, TILE_XS
    TXU = _txu(cfg)
    RT = TYO + 2 * r
    DL = 128
    J8 = _ru8(TXS + D - 1)
    ny = math.ceil(H / TYO)
    nx = math.ceil(W / TXS)
    T = ny * nx

    vol = _padded_volume(left, right, cfg, H, W, ny, nx)

    # Left Lab on the extended columns, x in SUBLANES (lanes 0..2 = c):
    # lcx[y, ix*TXS + u] = LabL(y - r, x0 - r + u) on the virtual plane.
    lab_l = preprocess.rgb_to_lab(left)
    labx = jnp.pad(
        lab_l,
        ((r, ny * TYO - H + r), (r, (nx - 1) * TXS + TXU - r - W), (0, 0)),
        mode="edge",
    )
    lcx = jnp.pad(labx, ((0, 0), (0, 0), (0, 128 - 3)))

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
    sw = _axial_sw_np(cfg)
    K8 = sw.shape[0]

    compute_scratch = [
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.int32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.int32),
    ]
    if interpret:
        ctiles = _extract_tiles_3d(vol, ny, nx, TYO, TXS, RT, XW)
        lcxtiles = _extract_tiles_3d(lcx, ny, nx, TYO, TXS, RT, TXU)

        if cfg.asw_symmetric:

            def get_rows(t):
                iy, ix = t // nx, t % nx
                return lax.dynamic_slice(
                    rrev, (ix, iy * TYO, 0, 0), (1, RT, 8, EW)
                )[0]

            rrevtiles = jax.vmap(get_rows)(jnp.arange(T))
        else:
            rrevtiles = jnp.zeros((T, RT, 8, EW), jnp.float32)
        kern = functools.partial(_kernel_blocked, cfg=cfg, nx=nx)
        data_in = (ctiles, lcxtiles, rrevtiles)
        data_specs = [
            pl.BlockSpec(
                (1, RT, XW, DL), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, TXU, 128), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, 8, EW), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = compute_scratch
    else:
        kern = functools.partial(_kernel_dma, cfg=cfg, nx=nx)
        data_in = (vol, lcx, rrev)
        data_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 3
        scratch = [
            pltpu.VMEM((RT, XW, DL), jnp.float32),
            pltpu.VMEM((RT, TXU, 128), jnp.float32),
            pltpu.VMEM((RT, 8, EW), jnp.float32),
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
    ]
    in_specs = data_specs + [
        pl.BlockSpec((K8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
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
    ] * 2
    bc, bd, cm, cp, rc, rd = pl.pallas_call(
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
            bytes_accessed=T * (RT * XW * DL + RT * TXU * 128) * 4,
            transcendentals=T * TYO * (K * (TXU + TXS + EW) + _ru8(K) * EW),
        ),
    )(
        *data_in,
        jnp.asarray(sw),
        jnp.asarray(W, jnp.int32).reshape(1, 1),
    )

    return _assemble_outputs(bc, bd, cm, cp, rc, rd, ny, nx, H, W, D)
