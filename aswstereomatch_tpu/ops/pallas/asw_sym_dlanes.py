"""Disparity-in-lanes fused kernel for SYMMETRIC (two-view) ASW.

The symmetric Yoon-Kweon weight (ops/aggregate.py:149-167; SURVEY.md
section 3.2) couples three factors per (window-row dy, window-col dx):

    num[x, d] += wL[x; dy, dx] * wR[x-d; dy, dx] * C[y+dy, x+dx, d]

dx appears in wL, wR AND the cost column, and d couples wR with C, so —
unlike the left-only case (asw_dlanes.py) — no banded-matmul/MXU form
exists (see docs/PERF_NOTES.md "Why the symmetric kernel cannot ride the
MXU").  What the d-in-lanes layout still buys over the x-in-lanes kernel
is *vector utilization* and *exp amortization*:

  - accumulators are (TXS, 128-d-lanes) planes: every VPU op touches 8
    vregs of useful work instead of the x-lanes kernel's per-d row ops;
  - the right-weight exp is computed ONCE per (y, dy) for all (xr, dx) in
    a compact plane E[dx, xr] and *reused across all 128 d lanes*, where
    the x-lanes kernel re-reads (and the jnp path re-slices) it per d.

The kernel leans on one Mosaic primitive, the per-sublane strided lane
roll (pltpu.roll(..., stride=1, stride_axis=0)), verified on hardware:
for a lane-REVERSED source row u' broadcast over sublanes,

    roll(b, shift, 1, stride=1, stride_axis=0)[s, j] = u'[(j - shift - s) mod N]

which yields, per (y, dy):

  1. the left tap plane  T[x, jj] = LabL(y+dy, x + (K-1-jj) - r)  (taps in
     reversed lane order jj = K-1-dx), from the lane-reversed Lab row —
     three rolls + broadcast-subtract-squares against the center column
     build wL as a (TXS, 128) plane, exp amortized over all output x;
  2. the right exp plane  E[s=dx, j] = exp(-||LabR(y, xr(j)) -
     LabR(y+dy, xr(j)+dx-r)||/gc)  on the lane-reversed right coordinate
     xr(j) = x0 + 128 - j — ONE exp for all (dx, xr) pairs;
  3. per dx, the Hankel plane  M[x, d] = E[dx, xr = x0+x-d]  (the right
     weight wR[x-d, dx] for every lane d at once) via one more strided
     roll of E's row dx — then two FMAs accumulate num and den with the
     cost tap as a static sublane slice.

The spatial weight enters the symmetric product once per view
(sw * sw): it is folded as sw^2 into the wL lane constant, so E stays a
pure color exp (same reals, fp order differs from jnp — parity tests use
the argmin-agreement bound, as for the other kernels).

Accumulation order is position-independent, so tiled == untiled stays
bit-exact.  WTA, subpixel triple, the right-view partial shear and the
cross-tile merge are shared with the left-only kernel
(asw_dlanes._wta_writeback / _assemble_outputs).
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
    BIG,
    TILE_XS,
    TILE_YO,
    XW,
    _assemble_outputs,
    _extract_tiles_3d,
    _left_lab_planes,
    _padded_volume,
    _ru8,
    _wta_writeback,
)

EW = 384  # reversed right-Lab plane lane extent: covers xr in [x0-255, x0+128]
MW = 256  # Hankel roll width (x - d + 127 for x < TXS=64, d < 128 fits 256)


def supports(cfg: StereoConfig) -> bool:
    """Symmetric ASW with D <= 128 (one lane vreg) and K <= 63: Mosaic's
    strided rotate requires (shift mod 128) + stride*(sublanes-1) < 128,
    and the left tap roll uses shift=K over TXS=64 sublanes."""
    return (
        cfg.aggregation == "asw"
        and cfg.asw_symmetric
        and not cfg.asw_separable
        and 2 <= cfg.max_disparity <= 128
        and cfg.window_size + TILE_XS - 1 < 128
    )


def routed(cfg: StereoConfig) -> bool:
    if cfg.kernel_layout == "dlanes":
        if cfg.aggregation == "asw" and cfg.asw_symmetric:
            if not supports(cfg):
                raise ValueError(
                    "kernel_layout='dlanes' on symmetric ASW requires "
                    "max_disparity in [2, 128] and window_size <= 63 "
                    "(window_size + 63 must stay under the 128-lane "
                    "strided-roll bound)"
                )
            return True
        return False  # left-only / box belong to asw_dlanes
    return False  # opt-in until hardware-validated faster than x-lanes


def _sw2_rev_np(cfg: StereoConfig) -> np.ndarray:
    """sw^2 in reversed lane order: out[dy, jj] = sw_spatial[dy, K-1-jj]^2
    for jj < K, zero beyond (masks the junk tap lanes)."""
    K = cfg.window_size
    sw = asw_kernel._spatial_weights_np(cfg)  # (K, K)
    out = np.zeros((_ru8(K), 128), np.float32)
    out[:K, :K] = (sw * sw)[:, ::-1]
    return out


def _compute(
    ct,        # ref view (RT, XW, DL): cost window, d in lanes
    lc,        # ref view (RT, TXS, 128): left Lab center columns
    lrev,      # ref view (RT, 8, 128): left Lab rows, lane-REVERSED
    rrev,      # ref view (RT, 8, EW): right Lab rows, lane-REVERSED
    sw2_ref,   # (K8, 128) spatial^2, reversed lane order, zero-padded
    nv_ref,    # (1, 1) i32 SMEM: count of real left columns
    bc_ref, bd_ref, cm_ref, cp_ref, rc_ref, rd_ref,  # (1, TXS|J8, TYO)
    u_ref,                                           # (1, TXS, TYO)
    bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,        # (TXS|J8, 128)
    u_sc=None,                                       # (TXS, 128)
    *,
    cfg: StereoConfig,
    nx: int,
):
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    TYO, TXS = TILE_YO, TILE_XS
    DL = 128
    K8 = sw2_ref.shape[0]
    inv_gc = np.float32(1.0 / cfg.gamma_color)

    t = pl.program_id(0)
    x0 = (t % nx) * TXS
    n_valid = nv_ref[0, 0]

    def y_body(y, _):
        crowl = lc[y + r]  # (TXS, 128); lanes 0..2 hold Lab
        ctrl = [crowl[:, c : c + 1] for c in range(3)]
        # rrev arrives pre-rolled by -r (see wta_outputs), so the per-(dy)
        # strided tap roll below needs shift 0 — Mosaic requires
        # (shift mod 128) + stride*(sublanes-1) < 128.  Undo the pre-roll
        # here to recover the un-shifted center row.
        crowr = pltpu.roll(rrev[y + r], r, 1)  # (8, EW); reversed center row

        def dy_body(dy, carry):
            num, den = carry

            # ---- wL plane (TXS, 128), taps in reversed lane order jj ----
            # tap[x, jj] = u'[(jj - K - x) mod 128] = LabL(y+dy, x+(K-1-jj)-r)
            urow = lrev[y + dy]  # (8, 128); reversed left Lab row
            d2 = jnp.zeros((TXS, 128), jnp.float32)
            for c in range(3):
                b = jnp.broadcast_to(urow[c : c + 1, :], (TXS, 128))
                tap = pltpu.roll(b, K, 1, stride=1, stride_axis=0)
                diff = ctrl[c] - tap
                d2 = d2 + diff * diff
            wl = jnp.exp(-jnp.sqrt(d2) * inv_gc) * sw2_ref[dy]

            # ---- E plane (K8, EW): right color exp, all (dx, xr) at once --
            # tap[s, j] = vpre[(j - s) mod EW] = v'[(j + r - s) mod EW]
            #           = LabR(y+dy, xr(j) + s - r)
            vrow = rrev[y + dy]  # (8, EW), pre-rolled by -r
            e2 = jnp.zeros((K8, EW), jnp.float32)
            for c in range(3):
                b = jnp.broadcast_to(vrow[c : c + 1, :], (K8, EW))
                tap = pltpu.roll(b, 0, 1, stride=1, stride_axis=0)
                diffr = jnp.broadcast_to(crowr[c : c + 1, :], (K8, EW)) - tap
                e2 = e2 + diffr * diffr
            ee = jnp.exp(-jnp.sqrt(e2) * inv_gc)

            # ---- inner dx: Hankel right-weight plane + two FMAs ----------
            crow = ct[y + dy]  # (XW, DL)
            for dx in range(K):
                # m[x, d] = ee[dx, (d + 128 - x) mod MW] = wR-exp at
                # right-center x0 + x - d (E lanes are xr-reversed).
                b = jnp.broadcast_to(ee[dx : dx + 1, :MW], (TXS, MW))
                m = pltpu.roll(b, 128, 1, stride=1, stride_axis=0)[:, :DL]
                tmp = wl[:, K - 1 - dx : K - dx] * m
                den = den + tmp
                num = num + tmp * crow[dx : dx + TXS, :]
            return (num, den)

        num, den = lax.fori_loop(
            0,
            K,
            dy_body,
            (
                jnp.zeros((TXS, DL), jnp.float32),
                jnp.zeros((TXS, DL), jnp.float32),
            ),
            unroll=False,
        )
        agg = num / den
        _wta_writeback(
            agg, y, x0, n_valid, D, bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,
            u_sc,
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


def _kernel_blocked(ct_ref, lc_ref, lrev_ref, rrev_ref, *rest, cfg, nx):
    """Interpret/test path: overlapping windows pre-materialized as blocks."""
    _compute(
        ct_ref.at[0],
        lc_ref.at[0],
        lrev_ref.at[0],
        rrev_ref.at[0],
        *rest,
        cfg=cfg,
        nx=nx,
    )


def _kernel_dma(ct_hbm, lc_hbm, lrev_hbm, rrev_hbm, sw2_ref, nv_ref, *rest, cfg, nx):
    """Hardware path: all planes stay untiled in HBM; each grid step DMAs
    its overlapping window into VMEM scratch (same scheme as asw_dlanes)."""
    outs, dma, scr = rest[:7], rest[7:15], rest[15:]
    ct_sc, lc_sc, lrev_sc, rrev_sc, s0, s1, s2, s3 = dma
    TYO, TXS = TILE_YO, TILE_XS
    RT = ct_sc.shape[0]
    t = pl.program_id(0)
    iy, ix = t // nx, t % nx
    copies = [
        pltpu.make_async_copy(
            ct_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, XW), :], ct_sc, s0
        ),
        pltpu.make_async_copy(
            lc_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, TXS), :], lc_sc, s1
        ),
        pltpu.make_async_copy(
            lrev_hbm.at[ix, pl.ds(iy * TYO, RT)], lrev_sc, s2
        ),
        pltpu.make_async_copy(
            rrev_hbm.at[ix, pl.ds(iy * TYO, RT)], rrev_sc, s3
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    _compute(
        ct_sc, lc_sc, lrev_sc, rrev_sc, sw2_ref, nv_ref, *outs, *scr,
        cfg=cfg, nx=nx,
    )


def wta_outputs(left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig):
    """Fused symmetric d-lanes kernel over an image pair; same output dict
    as asw_kernel.wta_outputs (bestd/bestc/cm/cp + rbestd)."""
    if not supports(cfg):
        raise ValueError(
            "symmetric dlanes kernel requires symmetric ASW, D in [2,128], "
            "window_size <= 65"
        )
    r = cfg.window_radius
    K = cfg.window_size
    D = cfg.max_disparity
    H, W = left.shape[:2]
    TYO, TXS = TILE_YO, TILE_XS
    RT = TYO + 2 * r
    DL = 128
    J8 = _ru8(TXS + D - 1)
    ny = math.ceil(H / TYO)
    nx = math.ceil(W / TXS)
    T = ny * nx

    vol = _padded_volume(left, right, cfg, H, W, ny, nx)

    lab_l = preprocess.rgb_to_lab(left)
    lc, lxw = _left_lab_planes(lab_l, cfg, H, W, ny, nx)
    lrev = lxw[..., ::-1]  # lrev[ix, y, c, j] = LabL(y, ix*TXS + (127-j) - r)

    # Reversed right rows: rrev[ix, y, c, j] = LabR_virtual(y, ix*TXS+128-j),
    # j in [0, EW) covering right centers AND taps down to x0 - 255 on the
    # edge-padded virtual plane (right weight centers reach x - (D-1); taps
    # reach r further; EW = 3 lane vregs covers both with room).
    lab_r = preprocess.rgb_to_lab(right)
    labrp = jnp.pad(
        lab_r,
        ((r, ny * TYO - H + r), (255, (nx - 1) * TXS + 129 - W), (0, 0)),
        mode="edge",
    )  # (Hp, (nx-1)*TXS + EW, 3); col i holds LabR(i - 255)
    rrev = jnp.stack(
        [
            jnp.moveaxis(labrp[:, ix * TXS : ix * TXS + EW][:, ::-1], 2, 1)
            for ix in range(nx)
        ],
        axis=0,
    )  # (nx, Hp, 3, EW)
    rrev = jnp.pad(rrev, ((0, 0), (0, 0), (0, 8 - 3), (0, 0)))
    # Pre-roll by -r so the kernel's strided tap rotate runs at shift 0
    # (Mosaic bounds (shift mod 128) + stride*(sublanes-1) by the vreg
    # width); the center row un-rolls with one static +r rotate per y.
    rrev = jnp.roll(rrev, -r, axis=-1)

    interpret = asw_kernel._interpret()
    sw2 = _sw2_rev_np(cfg)
    K8 = sw2.shape[0]

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
        lctiles = _extract_tiles_3d(lc, ny, nx, TYO, TXS, RT, TXS)

        def get_rows(arr, ext):
            def get(t):
                iy, ix = t // nx, t % nx
                return lax.dynamic_slice(
                    arr, (ix, iy * TYO, 0, 0), (1, RT, 8, ext)
                )[0]

            return jax.vmap(get)(jnp.arange(T))

        lrevtiles = get_rows(lrev, 128)
        rrevtiles = get_rows(rrev, EW)
        kern = functools.partial(_kernel_blocked, cfg=cfg, nx=nx)
        data_in = (ctiles, lctiles, lrevtiles, rrevtiles)
        data_specs = [
            pl.BlockSpec(
                (1, RT, XW, DL), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, RT, TXS, 128),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, 8, 128), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, RT, 8, EW), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        scratch = compute_scratch
    else:
        kern = functools.partial(_kernel_dma, cfg=cfg, nx=nx)
        data_in = (vol, lc, lrev, rrev)
        data_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 4
        scratch = [
            pltpu.VMEM((RT, XW, DL), jnp.float32),
            pltpu.VMEM((RT, TXS, 128), jnp.float32),
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
        pl.BlockSpec((K8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, J8, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, J8, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
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
            flops=T * 6 * K * K * TYO * TXS * DL,
            bytes_accessed=T * (RT * XW * DL + RT * TXS * 128) * 4,
            transcendentals=T * TYO * K * (TXS * 128 + K8 * EW),
        ),
    )(
        *data_in,
        jnp.asarray(sw2),
        jnp.asarray(W, jnp.int32).reshape(1, 1),
    )

    return _assemble_outputs(bc, bd, cm, cp, rc, rd, ny, nx, H, W, D, u=u)
