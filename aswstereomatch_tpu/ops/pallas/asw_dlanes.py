"""Disparity-in-lanes fused ASW kernel — the left-only-weights fast path.

The x-in-lanes kernel (asw_kernel.py) pays one dynamic (K, TY, TXR) lane
rotate per (window-row, disparity) to align the right-weight rows — ~1/3 of
its issue budget.  With LEFT-ONLY weights (``asw_symmetric=False``) the
bilateral weights are disparity-invariant, which unlocks a layout where the
rotate disappears entirely: put **x in sublanes and d in lanes**.  Each
(pixel, window-tap) weight then multiplies a whole 128-disparity vreg row,
window taps become *static sublane slices* of per-row cost planes (the cheap
class of Mosaic relayout), and the d loop vanishes into the vector lanes:

    num[x, :] += w(x; dy, dx) * C[y+dy][x+dx, :]     (one bcast-FMA per tap)

Per-tap vreg traffic drops from ~4.6 to ~2.3 touches/FMA-element (measured
2.05x end-to-end at KITTI geometry; see docs/PERF_NOTES.md round 2).

Stage structure (SURVEY.md sections 3.2, 7 PR3; reference analog: the same
5-deep aggregateASW loop, specialised to left-only weights):

  1. XLA precomputes (a) the raw cost volume in (y, x, d-lane) layout using
     the exact shared border semantics of ops/cost.py — the volume IS
     materialized here (238 MB at KITTI scale), traded for the kernel's 2x
     issue-rate win; HBM traffic stays ~2 GB/pair, ~3% of kernel time — and
     (b) the left-Lab window taps T[y, x, j] = Lab(y, x + j - r) so in-kernel
     weight rows are pure reads + exp.
  2. The Pallas grid tiles (TYO x TXS) outputs; per output row a fori over
     window rows dy builds the (TXS, K) weight plane (exp amortized over all
     128 lanes of d at once) and runs the K static-slice FMAs.
  3. WTA + the subpixel triple are lane reductions (first-occurrence argmin
     via min-of-index-where-minimal); the right-view partial argmin is a
     log-shear of the aggregated plane along the d-diagonal — the same
     (TY, TX + D - 1) partial-buffer convention as the x-in-lanes kernel, so
     ``asw_kernel._combine_right4`` and all downstream post-processing are
     shared unchanged.

Exactness: per-pixel accumulation order is (dy asc, dx asc) — position
independent, so tiled == untiled stays bit-exact (the same invariant the
x-lanes kernel pins).  Against the jnp oracle the reduction order differs
(jnp sums a (dy, dx) scan tree), so parity tests use the argmin-agreement
bound, like the x-lanes end-to-end tests.
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
from .. import cost as cost_lib
from .. import preprocess
from . import asw_kernel

# Output tile: TYO rows x TXS columns (x in sublanes).  TXS=64 keeps the
# (TXS, 128) accumulator at 8 vregs (register-resident through the tap loop)
# and the cost window (RT, TXS+2r, 128) within VMEM.
TILE_YO = 8
TILE_XS = 64

BIG = np.float32(1e30)  # finite +inf stand-in: avoids 0*inf NaN paths


def _ru8(n: int) -> int:
    return -(-n // 8) * 8


def supports(cfg: StereoConfig) -> bool:
    """Left-only ASW with D <= 128 (one lane vreg) and K <= 64 taps."""
    return (
        cfg.aggregation == "asw"
        and not cfg.asw_symmetric
        and 2 <= cfg.max_disparity <= 128
        and cfg.window_size <= 64
    )


def routed(cfg: StereoConfig) -> bool:
    if cfg.kernel_layout == "dlanes":
        if not supports(cfg):
            raise ValueError(
                "kernel_layout='dlanes' requires left-only ASW with "
                "max_disparity in [2, 128] and window_size <= 64"
            )
        return True
    return cfg.kernel_layout == "auto" and supports(cfg)


def _compute(
    ct,        # ref view (RT, X2, DL): cost window, d in lanes
    tt,        # ref view (3, RT, TXS, LW): left-Lab window taps
    sw_ref,    # (K, LW) spatial weights, zero-padded lanes >= K
    nv_ref,    # (1, 1) i32 SMEM: count of real left columns
    bc_ref,    # (1, TXS, TYO) f32   — column-major outputs (x, y);
    bd_ref,    # (1, TXS, TYO) i32     transposed to row-major in XLA
    cm_ref,    # (1, TXS, TYO) f32
    cp_ref,    # (1, TXS, TYO) f32
    rc_ref,    # (1, J8, TYO) f32    right-view partial (j = x - d + D - 1)
    rd_ref,    # (1, J8, TYO) i32
    bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,  # (TXS|J8, 128) lane-y planes
    *,
    cfg: StereoConfig,
    nx: int,
):
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    TYO, TXS = TILE_YO, TILE_XS
    X2 = TXS + 2 * r
    DL = 128
    LW = sw_ref.shape[1]
    J8 = rc_sc.shape[0]
    inv_gc = np.float32(1.0 / cfg.gamma_color)

    t = pl.program_id(0)
    x0 = (t % nx) * TXS
    n_valid = nv_ref[0, 0]

    lane_d = lax.broadcasted_iota(jnp.int32, (TXS, DL), 1)
    lane_dj = lax.broadcasted_iota(jnp.int32, (J8, DL), 1)
    sub_x = lax.broadcasted_iota(jnp.int32, (TXS, DL), 0)

    def y_body(y, _):
        # ---- aggregate: fori over window rows, static taps over columns ----
        ctr = [tt[c, y + r][:, r : r + 1] for c in range(3)]  # (TXS, 1)

        def dy_body(dy, carry):
            num, den = carry
            sw_row = sw_ref[pl.ds(dy, 1), :]  # (1, LW); 0 for lanes >= K
            d2 = jnp.zeros((TXS, LW), jnp.float32)
            for c in range(3):
                diff = tt[c, y + dy] - ctr[c]
                d2 = d2 + diff * diff
            w = jnp.exp(-jnp.sqrt(d2) * inv_gc) * sw_row  # (TXS, LW)
            den = den + jnp.sum(w, axis=1, keepdims=True)
            crow = ct[y + dy]  # (X2, DL) read once per (y, dy)
            for dx in range(K):
                num = num + w[:, dx : dx + 1] * crow[dx : dx + TXS, :]
            return (num, den)

        num, den = lax.fori_loop(
            0,
            K,
            dy_body,
            (jnp.zeros((TXS, DL), jnp.float32), jnp.zeros((TXS, 1), jnp.float32)),
            unroll=False,
        )
        agg = num * (np.float32(1.0) / den)

        # ---- left-view WTA + subpixel triple: lane reductions --------------
        minv = jnp.min(agg, axis=1, keepdims=True)
        cand = jnp.where(agg == minv, lane_d, DL)
        bd = jnp.min(cand, axis=1, keepdims=True)  # first-occurrence argmin
        cmv = jnp.sum(
            jnp.where(lane_d == bd - 1, agg, 0.0), axis=1, keepdims=True
        )
        cpv = jnp.sum(
            jnp.where(lane_d == bd + 1, agg, 0.0), axis=1, keepdims=True
        )

        ymask_x = lax.broadcasted_iota(jnp.int32, (TXS, 128), 1) == y
        bc_sc[...] = jnp.where(ymask_x, minv, bc_sc[...])
        bd_sc[...] = jnp.where(ymask_x, bd, bd_sc[...])
        cm_sc[...] = jnp.where(ymask_x, cmv, cm_sc[...])
        cp_sc[...] = jnp.where(ymask_x, cpv, cp_sc[...])

        # ---- right-view partial: log-shear along the d-diagonal ------------
        # Target: M[j, d] = agg[j - (D-1) + d, d]; lane d shifts down by
        # (D-1-d).  Rows [TXS, J8) start BIG, so every wrapped row during the
        # masked log-rolls is BIG by construction (shift <= D-1 <= J8 - TXS).
        aggr = jnp.where(x0 + sub_x < n_valid, agg, BIG)
        m = jnp.concatenate(
            [aggr, jnp.full((J8 - TXS, DL), BIG, jnp.float32)], axis=0
        )
        shift = (D - 1) - lane_dj
        b = 1
        while b < D:
            m = jnp.where((shift & b) != 0, pltpu.roll(m, b, axis=0), m)
            b *= 2
        rminv = jnp.min(m, axis=1, keepdims=True)
        rcand = jnp.where(m == rminv, lane_dj, DL)
        rbd = jnp.min(rcand, axis=1, keepdims=True)

        ymask_j = lax.broadcasted_iota(jnp.int32, (J8, 128), 1) == y
        rc_sc[...] = jnp.where(ymask_j, rminv, rc_sc[...])
        rd_sc[...] = jnp.where(ymask_j, rbd, rd_sc[...])
        return ()

    lax.fori_loop(0, TILE_YO, y_body, (), unroll=False)

    bc_ref[0] = bc_sc[:, :TYO]
    bd_ref[0] = bd_sc[:, :TYO]
    cm_ref[0] = cm_sc[:, :TYO]
    cp_ref[0] = cp_sc[:, :TYO]
    rc_ref[0] = rc_sc[:, :TYO]
    rd_ref[0] = rd_sc[:, :TYO]


def _kernel_blocked(ct_ref, tt_ref, *rest, cfg, nx):
    """Interpret/test path: overlapping windows pre-materialized as blocks."""
    _compute(ct_ref.at[0], tt_ref.at[0], *rest, cfg=cfg, nx=nx)


def _kernel_dma(
    ct_hbm, tt_hbm, sw_ref, nv_ref, *rest, cfg, nx
):
    """Hardware path: cost volume / Lab taps stay untiled in HBM; each grid
    step DMAs its overlapping window into VMEM scratch.  Avoids the 7.5x
    data amplification (and ~80 ms/pair of XLA gather time at KITTI scale)
    of materializing overlapped tiles."""
    outs, (ct_sc, tt_sc, csem, tsem), scr = rest[:6], rest[6:10], rest[10:]
    TYO, TXS = TILE_YO, TILE_XS
    RT, X2 = ct_sc.shape[0], ct_sc.shape[1]
    t = pl.program_id(0)
    iy, ix = t // nx, t % nx
    ccopy = pltpu.make_async_copy(
        ct_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, X2), :], ct_sc, csem
    )
    tcopy = pltpu.make_async_copy(
        tt_hbm.at[:, pl.ds(iy * TYO, RT), pl.ds(ix * TXS, TXS), :], tt_sc, tsem
    )
    ccopy.start()
    tcopy.start()
    ccopy.wait()
    tcopy.wait()
    _compute(ct_sc, tt_sc, sw_ref, nv_ref, *outs, *scr, cfg=cfg, nx=nx)


def _extract_tiles_3d(arr, ny, nx, ty, tx, bh, bw):
    """(H', W', L) -> (ny*nx, bh, bw, L) overlapping windows, strides (ty, tx)."""
    def get(t):
        iy, ix = t // nx, t % nx
        return lax.dynamic_slice(
            arr, (iy * ty, ix * tx, 0), (bh, bw, arr.shape[2])
        )

    return jax.vmap(get)(jnp.arange(ny * nx))


def wta_outputs(left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig):
    """Fused d-lanes kernel over an image pair; same output dict as
    asw_kernel.wta_outputs (bestd/bestc/cm/cp + rbestd)."""
    if not supports(cfg):
        raise ValueError("dlanes kernel requires left-only ASW, D in [2,128]")
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    H, W = left.shape[:2]
    TYO, TXS = TILE_YO, TILE_XS
    X2 = TXS + 2 * r
    RT = TYO + 2 * r
    DL = 128
    LW = 128  # lane width of the tap/weight planes: DMA lane slices must
              # be 128-aligned, so taps are padded to a full lane vreg
    J8 = _ru8(TXS + D - 1)
    ny = math.ceil(H / TYO)
    nx = math.ceil(W / TXS)
    T = ny * nx

    # ---- cost volume, (y, x+r-extended, d) with pinned border semantics ----
    vol = cost_lib.cost_volume(left, right, cfg, x_extend=r)  # (H, W+2r, D)
    vol = jnp.pad(
        vol,
        ((r, ny * TYO - H + r), (0, (nx - 1) * TXS + X2 - (W + 2 * r)), (0, 0)),
        mode="edge",
    )
    vol = jnp.pad(vol, ((0, 0), (0, 0), (0, DL - D)), constant_values=BIG)

    # ---- left-Lab window taps T[y, x, j] = Lab(y, x + j - r) ---------------
    lab = preprocess.rgb_to_lab(left)  # (H, W, 3)
    labp = jnp.pad(
        lab,
        ((r, ny * TYO - H + r), (r, (nx - 1) * TXS + TXS + r - W), (0, 0)),
        mode="edge",
    )
    taps = jnp.stack(
        [labp[:, j : j + nx * TXS] for j in range(K)], axis=-1
    )  # (Hp, nx*TXS, 3, K)
    taps = jnp.pad(taps, ((0, 0), (0, 0), (0, 0), (0, LW - K)))

    interpret = asw_kernel._interpret()
    sw = np.zeros((K, LW), np.float32)
    sw[:, :K] = asw_kernel._spatial_weights_np(cfg)

    compute_scratch = [
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.int32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.int32),
    ]
    if interpret:
        # Test path: pre-materialize overlapping tiles (DMA semantics are
        # hardware-only); the compute body is shared with the DMA path.
        ctiles = _extract_tiles_3d(vol, ny, nx, TYO, TXS, RT, X2)

        def get_t(t):
            iy, ix = t // nx, t % nx
            blk = lax.dynamic_slice(
                taps, (iy * TYO, ix * TXS, 0, 0), (RT, TXS, 3, LW)
            )
            return jnp.transpose(blk, (2, 0, 1, 3))  # (3, RT, TXS, LW)

        ttiles = jax.vmap(get_t)(jnp.arange(T))
        kern = functools.partial(_kernel_blocked, cfg=cfg, nx=nx)
        data_in = (ctiles, ttiles)
        data_specs = [
            pl.BlockSpec(
                (1, RT, X2, DL), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, RT, TXS, LW),
                lambda t: (t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = compute_scratch
    else:
        taps_t = jnp.transpose(taps, (2, 0, 1, 3))  # (3, Hp, nx*TXS, LW)
        kern = functools.partial(_kernel_dma, cfg=cfg, nx=nx)
        data_in = (vol, taps_t)
        data_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        scratch = [
            pltpu.VMEM((RT, X2, DL), jnp.float32),
            pltpu.VMEM((3, RT, TXS, LW), jnp.float32),
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
        pl.BlockSpec((K, LW), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
            pl.BlockSpec(
                (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, J8, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, J8, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
    ]
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
            flops=T * 2 * K * K * TYO * TXS * DL,
            bytes_accessed=T * (RT * X2 * DL + 3 * RT * TXS * LW) * 4,
            transcendentals=T * TYO * K * TXS * LW,
        ),
    )(
        *data_in,
        jnp.asarray(sw),
        jnp.asarray(W, jnp.int32).reshape(1, 1),
    )

    def untile(a):  # (T, S, TYO) column-major -> (ny*TYO, nx*S) row-major
        s = a.shape[1]
        a = a.reshape(ny, nx, s, TYO)
        a = jnp.moveaxis(a, 3, 1)  # (ny, TYO, nx, S)
        return a.reshape(ny * TYO, nx * s)

    out = {
        "bestd": untile(bd)[:H, :W],
        "bestc": untile(bc)[:H, :W],
        "cm": untile(cm)[:H, :W],
        "cp": untile(cp)[:H, :W],
    }
    rc4 = jnp.moveaxis(rc.reshape(ny, nx, J8, TYO), 3, 2)  # (ny, nx, TYO, J8)
    rd4 = jnp.moveaxis(rd.reshape(ny, nx, J8, TYO), 3, 2)
    _, own_d, _, _ = asw_kernel._combine_right4(rc4, rd4, H, W, D, TXS)
    out["rbestd"] = own_d
    return out
