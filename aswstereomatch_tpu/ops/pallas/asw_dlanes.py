"""Disparity-in-lanes fused ASW kernel — the left-only-weights fast path.

The x-in-lanes kernel (asw_kernel.py) pays one dynamic (K, TY, TXR) lane
rotate per (window-row, disparity) to align the right-weight rows — ~1/3 of
its issue budget.  With LEFT-ONLY weights (``asw_symmetric=False``) the
bilateral weights are disparity-invariant, which unlocks a layout where the
rotate disappears entirely: put **x in sublanes and d in lanes**.  Each
(pixel, window-tap) weight then multiplies a whole 128-disparity vreg row,
and — the round-2 insight — the window-column loop

    num[x, :] += w(x; dy, dx) * C[y+dy][x+dx, :]      for dx in range(K)

is a *banded matrix product*: with B[x, q] = w[x, q - x] (zero off the
band q - x in [0, K)),

    num = B @ C[y+dy]          # (TXS, 128) @ (128, 128) on the MXU

so the FLOP-dominant aggregation runs on the systolic array instead of K
scalar-broadcast VPU passes.

Building B is nearly free, because in band coordinates the window tap is
**independent of the output column**: the tap at (x, lane q) is
Lab(y+dy, q - r) for every x.  So

    B[x, q] = exp(-||Lab(y, x) - Lab(y+dy, q-r)|| / gamma_c) * SW[dy][x, q]

is an outer difference of a center *column* (TXS, 1) against a Lab *row*
(1, 128) — three broadcast-subtract-squares — and SW[dy][x, q] =
sw_spatial[dy, q-x] (zero off-band) is a compile-time numpy constant that
carries both the spatial weight and the band masking.  No per-step shear,
no tap gather, no channel folding.

Stage structure (SURVEY.md sections 3.2, 7 PR3; reference analog: the same
5-deep aggregateASW loop of SURVEY.md section 2.1, specialised to left-only
weights):

  1. XLA precomputes (a) the raw cost volume in (y, x, d-lane) layout using
     the exact shared border semantics of ops/cost.py — the volume IS
     materialized here (238 MB at KITTI scale), traded for the kernel's
     MXU win; HBM traffic stays ~2.5 GB/pair, a few ms — and (b) two thin
     Lab layouts: center columns (y, x-sublane, c-lane) and per-x-tile Lab
     rows (tile, y, c-sublane, q-lane).
  2. The Pallas grid tiles (TYO x TXS) outputs; per output row a fori over
     window rows dy builds the banded weight planes (exp amortized over all
     128 lanes) side by side into one (TXS, K*XW) matrix, then a SINGLE
     K*XW-deep MXU dot against the flattened cost rows y..y+K-1 performs
     the whole (dy, dx) aggregation.  One big dot pipelines its internal
     128-deep passes; K small per-dy dots each paid full MXU issue latency
     serialized through the fori carry (~5x slower measured at K=33).
  3. WTA + the subpixel triple are lane reductions (first-occurrence argmin
     via min-of-index-where-minimal); the right-view partial argmin is a
     log-shear of the aggregated plane along the d-diagonal — the same
     (TY, TX + D - 1) partial-buffer convention as the x-in-lanes kernel, so
     ``asw_kernel._combine_right4`` and all downstream post-processing are
     shared unchanged.

Box mode: with ``aggregation="box"`` the weight plane is the constant
uniform band itself (no exp, no Lab reads), so box aggregation + dual-view
WTA rides the same MXU matmul — see ``supports``.

Exactness: per-pixel accumulation is one f32 (precision=HIGHEST) dot over
the joint (dy, dx) contraction — position independent, so tiled ==
untiled stays bit-exact (the same invariant the x-lanes kernel pins).
Against the jnp oracle the reduction order differs (jnp sums a (dy, dx)
scan tree), so parity tests use the argmin-agreement bound, like the
x-lanes end-to-end tests.
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
# band matrix B at (64, 128) — q = x + dx <= 63 + 63 < 128 for every
# supported window — and the cost window (RT, 128, 128) within VMEM.
TILE_YO = 16
TILE_XS = 64
XW = 128  # cost-window q extent: one full lane-width band per tile

BIG = np.float32(1e30)  # finite +inf stand-in: avoids 0*inf NaN paths


def _ru8(n: int) -> int:
    return -(-n // 8) * 8


def supports(cfg: StereoConfig) -> bool:
    """Left-only ASW — or box — with D <= 128 (one lane vreg) and a window
    whose band fits one lane width (TXS + K - 1 <= 128, i.e. K <= 65)."""
    if not (2 <= cfg.max_disparity <= 128):
        return False
    if TILE_XS + cfg.window_size - 1 > XW:
        return False
    if cfg.asw_separable:
        return False  # separable ASW belongs to asw_sep_dlanes
    if cfg.aggregation == "box":
        return True
    return cfg.aggregation == "asw" and not cfg.asw_symmetric


def routed(cfg: StereoConfig) -> bool:
    if cfg.kernel_layout == "dlanes":
        if cfg.aggregation == "asw" and cfg.asw_symmetric:
            return False  # asw_sym_dlanes claims (or loudly rejects) these
        if not supports(cfg):
            raise ValueError(
                "kernel_layout='dlanes' requires left-only ASW or box "
                "aggregation with max_disparity in [2, 128] and "
                "window_size <= 65"
            )
        return True
    if cfg.kernel_layout != "auto":
        return False
    # auto covers the left-only ASW fast path at any supported D, and box
    # only when the d-lane vreg is well utilized: this kernel always pays
    # full 128-lane vregs, so its big dot beats the running-sum x-lanes
    # kernel at D=128 (KITTI: 21.9 vs 12.7 pairs/s) but LOSES at D=64
    # (venus: 50.7 vs 76.1) where running-sum work scales with D — measured
    # crossover pinned at D > 64.  (ASW economics differ: the MXU amortizes
    # the K^2 bilateral-weight VPU work, so left-only wins at D=64 too.)
    # The d-sharded / x-tiled paths still need the x-lanes kernel (its
    # disparity window / strip export) and pin their own layout — sharded
    # output is bit-exact vs unsharded at kernel_layout="xlanes", and
    # argmin-level vs this default (the documented layout-resolution
    # contract; see PARITY.md and test_sharding.py).
    if cfg.aggregation == "box":
        return cfg.max_disparity > 64 and supports(cfg)
    return cfg.aggregation == "asw" and supports(cfg)


def _spatial_band_np(cfg: StereoConfig) -> np.ndarray:
    """SW[dy][x, q] = sw_spatial[dy, q - x] for q - x in [0, K), else 0.

    Carries the spatial weight factor AND the band masking as one
    compile-time constant.  For box aggregation the uniform band is
    image-independent, so it ships pre-flattened in the (TXS, K*XW) layout
    the big dot consumes — no in-kernel band assembly at all."""
    K = cfg.window_size
    if cfg.aggregation == "box":
        sw = np.ones((K, K), np.float32)
    else:
        sw = asw_kernel._spatial_weights_np(cfg)
    band = np.zeros((K, TILE_XS, XW), np.float32)
    for x in range(TILE_XS):
        band[:, x, x : x + K] = sw
    if cfg.aggregation == "box":
        return np.moveaxis(band, 0, 1).reshape(TILE_XS, K * XW)
    return band


def _wta_writeback(
    agg, y, x0, n_valid, D, bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,
    u_sc=None,
):
    """Left-view WTA + subpixel triple + right-view partial argmin for one
    aggregated row ``agg`` (TXS, DL); writes the lane-y scratch planes.
    Shared by the left-only, symmetric, and separable d-lanes kernels.

    With ``u_sc`` additionally writes the second-best cost EXCLUDING
    disparities within +-1 of the winner — the WTA-uniqueness confidence
    operand (config ``uniqueness_ratio``, the knob cv2.StereoBM/SGBM
    ship).  With d in lanes the whole cost row is present, so this is one
    masked lane reduction — the x-lanes kernel has to track it online
    instead."""
    TXS, DL = agg.shape
    J8 = rc_sc.shape[0]
    lane_d = lax.broadcasted_iota(jnp.int32, (TXS, DL), 1)
    lane_dj = lax.broadcasted_iota(jnp.int32, (J8, DL), 1)
    sub_x = lax.broadcasted_iota(jnp.int32, (TXS, DL), 0)

    # ---- left-view WTA + subpixel triple: lane reductions -----------------
    minv = jnp.min(agg, axis=1, keepdims=True)
    cand = jnp.where(agg == minv, lane_d, DL)
    bd = jnp.min(cand, axis=1, keepdims=True)  # first-occurrence argmin
    cmv = jnp.sum(jnp.where(lane_d == bd - 1, agg, 0.0), axis=1, keepdims=True)
    cpv = jnp.sum(jnp.where(lane_d == bd + 1, agg, 0.0), axis=1, keepdims=True)

    ymask_x = lax.broadcasted_iota(jnp.int32, (TXS, 128), 1) == y
    bc_sc[...] = jnp.where(ymask_x, minv, bc_sc[...])
    bd_sc[...] = jnp.where(ymask_x, bd, bd_sc[...])
    cm_sc[...] = jnp.where(ymask_x, cmv, cm_sc[...])
    cp_sc[...] = jnp.where(ymask_x, cpv, cp_sc[...])
    if u_sc is not None:
        far = jnp.abs(lane_d - bd) > 1
        uv = jnp.min(jnp.where(far, agg, BIG), axis=1, keepdims=True)
        u_sc[...] = jnp.where(ymask_x, uv, u_sc[...])

    # ---- right-view partial: log-shear along the d-diagonal ---------------
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


def _compute(
    ct2,       # ref view (RT*XW, DL): cost window rows flattened, d in lanes
    lc,        # ref view (RT, TXS, 128): Lab center columns, lanes 0..2 = c
    lx,        # ref view (RT, 8, 128): Lab band rows, sublanes 0..2 = c
    swb_ref,   # ASW: (K, TXS, XW) spatial band; box: (TXS, K*XW) flat band
    nv_ref,    # (1, 1) i32 SMEM: count of real left columns
    bc_ref,    # (1, TXS, TYO) f32   — column-major outputs (x, y);
    bd_ref,    # (1, TXS, TYO) i32     transposed to row-major in XLA
    cm_ref,    # (1, TXS, TYO) f32
    cp_ref,    # (1, TXS, TYO) f32
    rc_ref,    # (1, J8, TYO) f32    right-view partial (j = x - d + D - 1)
    rd_ref,    # (1, J8, TYO) i32
    u_ref,     # (1, TXS, TYO) f32   second-best cost excl. best +-1
    bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,  # (TXS|J8, 128) lane-y planes
    ball_sc,   # (TXS, K*XW) f32: per-row concatenated bands (big-dot LHS)
    u_sc=None,  # (TXS, 128) f32 lane-y plane for u_ref
    *,
    cfg: StereoConfig,
    nx: int,
):
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    TYO, TXS = TILE_YO, TILE_XS
    KXW = K * XW
    uniform = cfg.aggregation == "box"
    inv_gc = np.float32(1.0 / cfg.gamma_color)

    t = pl.program_id(0)
    x0 = (t % nx) * TXS
    n_valid = nv_ref[0, 0]

    def y_body(y, _):
        # ---- build the (TXS, K*XW) band matrix for this output row --------
        # The K per-dy banded weight planes are laid side by side in lanes;
        # the whole (dy, dx) aggregation then rides ONE K*XW-deep MXU dot
        # against the cost rows y..y+K-1 (contiguous in the flattened ct2).
        # One big dot pipelines its internal 128-deep passes; K separate
        # per-dy dots each pay full MXU issue latency serialized through the
        # fori carry (measured ~5x slower at K=33).
        if uniform:
            bl = swb_ref[...]  # constant uniform band, den == K*K
        else:
            crow = lc[y + r]  # (TXS, 128); lanes 0..2 hold Lab
            ctr = [crow[:, c : c + 1] for c in range(3)]

            def dy_body(dy, carry):
                rowv = lx[y + dy]  # (8, 128); sublanes 0..2 hold Lab
                d2 = jnp.zeros((TXS, XW), jnp.float32)
                for c in range(3):
                    diff = ctr[c] - rowv[c : c + 1, :]  # (TXS,1)-(1,128)
                    d2 = d2 + diff * diff
                band = jnp.exp(-jnp.sqrt(d2) * inv_gc) * swb_ref[dy]
                ball_sc[:, pl.ds(dy * XW, XW)] = band
                return carry

            lax.fori_loop(0, K, dy_body, 0, unroll=False)
            bl = ball_sc[...]

        num = jax.lax.dot(
            bl,
            ct2[pl.ds(y * XW, KXW), :],
            # HIGHEST = one f32 pass; Mosaic's dot lowering rejects
            # HIGH/DEFAULT (NotImplementedError), and bf16 passes would
            # cost argmin agreement anyway.
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if uniform:
            agg = num * np.float32(1.0 / (K * K))
        else:
            den = jnp.sum(bl, axis=1, keepdims=True)
            agg = num * (np.float32(1.0) / den)

        _wta_writeback(
            agg, y, x0, n_valid, D, bc_sc, bd_sc, cm_sc, cp_sc, rc_sc, rd_sc,
            u_sc,
        )
        return ()

    lax.fori_loop(0, TILE_YO, y_body, (), unroll=False)

    bc_ref[0] = bc_sc[:, :TYO]
    bd_ref[0] = bd_sc[:, :TYO]
    cm_ref[0] = cm_sc[:, :TYO]
    cp_ref[0] = cp_sc[:, :TYO]
    rc_ref[0] = rc_sc[:, :TYO]
    rd_ref[0] = rd_sc[:, :TYO]
    u_ref[0] = u_sc[:, :TYO]


def _kernel_blocked(ct_ref, lc_ref, lx_ref, *rest, cfg, nx):
    """Interpret/test path: overlapping windows pre-materialized as blocks
    (cost tiles arrive already flattened to (RT*XW, DL))."""
    _compute(ct_ref.at[0], lc_ref.at[0], lx_ref.at[0], *rest, cfg=cfg, nx=nx)


def _kernel_dma(
    ct_hbm, lc_hbm, lx_hbm, swb_ref, nv_ref, *rest, cfg, nx
):
    """Hardware path: cost volume / Lab planes stay untiled in HBM; each grid
    step DMAs its overlapping window into VMEM scratch.  Avoids the 7.5x
    data amplification (and ~80 ms/pair of XLA gather time at KITTI scale)
    of materializing overlapped tiles."""
    outs, dma, scr = rest[:7], rest[7:13], rest[13:]
    ct_sc, lc_sc, lx_sc, csem, lcsem, lxsem = dma
    TYO, TXS = TILE_YO, TILE_XS
    RT = ct_sc.shape[0]
    t = pl.program_id(0)
    iy, ix = t // nx, t % nx
    ccopy = pltpu.make_async_copy(
        ct_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, XW), :], ct_sc, csem
    )
    ccopy.start()
    if cfg.aggregation != "box":  # box weights need no Lab planes
        lcopy = pltpu.make_async_copy(
            lc_hbm.at[pl.ds(iy * TYO, RT), pl.ds(ix * TXS, TXS), :], lc_sc, lcsem
        )
        xcopy = pltpu.make_async_copy(
            lx_hbm.at[ix, pl.ds(iy * TYO, RT)], lx_sc, lxsem
        )
        lcopy.start()
        xcopy.start()
        lcopy.wait()
        xcopy.wait()
    ccopy.wait()
    # (RT, XW, DL) -> (RT*XW, DL): layout-free (XW is a whole sublane tile),
    # so cost rows y..y+K-1 are one contiguous big-dot RHS slice.
    ct2 = ct_sc.reshape(RT * XW, ct_sc.shape[2])
    _compute(ct2, lc_sc, lx_sc, swb_ref, nv_ref, *outs, *scr, cfg=cfg, nx=nx)


def _padded_volume(left, right, cfg, H, W, ny, nx, tyo=None, txs=None):
    """d-lanes cost volume (ny*TYO + 2r, (nx-1)*TXS + XW, 128): rows/cols
    edge-padded to the tile grid, d padded to the 128-lane vreg with BIG.
    Shared by the left-only, symmetric, and separable d-lanes kernels
    (the separable kernel passes its adaptive tile width via ``txs``)."""
    r = cfg.window_radius
    D = cfg.max_disparity
    tyo = TILE_YO if tyo is None else tyo
    txs = TILE_XS if txs is None else txs
    vol = cost_lib.cost_volume(left, right, cfg, x_extend=r)  # (H, W+2r, D)
    vol = jnp.pad(
        vol,
        (
            (r, ny * tyo - H + r),
            (0, (nx - 1) * txs + XW - (W + 2 * r)),
            (0, 0),
        ),
        mode="edge",
    )
    return jnp.pad(vol, ((0, 0), (0, 0), (0, 128 - D)), constant_values=BIG)


def _left_lab_planes(lab, cfg, H, W, ny, nx):
    """(lc, lxw) Lab operand planes from a converted left image:
    lc (Hp, nx*TXS, 128) center columns (lanes 0..2 = channels);
    lxw (nx, Hp, 8, XW) per-tile band rows lxw[ix, y, c, j] =
    Lab_c(y, ix*TXS + j - r)."""
    r = cfg.window_radius
    TYO, TXS = TILE_YO, TILE_XS
    XT = nx * TXS
    labp = jnp.pad(
        lab, ((r, ny * TYO - H + r), (0, XT - W), (0, 0)), mode="edge"
    )  # (Hp, XT, 3)
    lc = jnp.pad(labp, ((0, 0), (0, 0), (0, 128 - 3)))
    labx = jnp.pad(
        lab,
        ((r, ny * TYO - H + r), (r, (nx - 1) * TXS + XW - r - W), (0, 0)),
        mode="edge",
    )  # (Hp, (nx-1)*TXS + XW, 3); column j of tile ix at index ix*TXS + j
    lxw = jnp.stack(
        [
            jnp.moveaxis(labx[:, ix * TXS : ix * TXS + XW], 2, 1)
            for ix in range(nx)
        ],
        axis=0,
    )  # (nx, Hp, 3, XW)
    return lc, jnp.pad(lxw, ((0, 0), (0, 0), (0, 8 - 3), (0, 0)))


def _assemble_outputs(bc, bd, cm, cp, rc, rd, ny, nx, H, W, D,
                      tyo=None, txs=None, u=None):
    """Column-major per-tile WTA outputs -> the wta_outputs dict (bestd /
    bestc / cm / cp / rbestd [+ ubest, the second-best-excl-+-1 cost for
    uniqueness confidence]), including the cross-tile right-view merge."""
    J8 = rc.shape[1]
    TYO = TILE_YO if tyo is None else tyo
    TXS = TILE_XS if txs is None else txs

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
    if u is not None:
        out["ubest"] = untile(u)[:H, :W]
    rc4 = jnp.moveaxis(rc.reshape(ny, nx, J8, TYO), 3, 2)  # (ny, nx, TYO, J8)
    rd4 = jnp.moveaxis(rd.reshape(ny, nx, J8, TYO), 3, 2)
    _, own_d, _, _ = asw_kernel._combine_right4(rc4, rd4, H, W, D, TXS)
    out["rbestd"] = own_d
    return out


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
        raise ValueError(
            "dlanes kernel requires left-only ASW or box, D in [2,128], "
            "window_size <= 65"
        )
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    H, W = left.shape[:2]
    TYO, TXS = TILE_YO, TILE_XS
    RT = TYO + 2 * r
    DL = 128
    J8 = _ru8(TXS + D - 1)
    ny = math.ceil(H / TYO)
    nx = math.ceil(W / TXS)
    T = ny * nx
    XT = nx * TXS
    uniform = cfg.aggregation == "box"

    # ---- cost volume, (y, x+r-extended, d) with pinned border semantics ----
    vol = _padded_volume(left, right, cfg, H, W, ny, nx)

    # ---- Lab planes: center columns + per-tile band rows -------------------
    if uniform:
        # Box weights are image-independent; the Lab operands are never
        # read (static branch), only shape-checked — keep them minimal.
        lc = jnp.zeros((8, 8, 128), jnp.float32)
        lxw = jnp.zeros((1, 8, 8, 128), jnp.float32)
    else:
        lab = preprocess.rgb_to_lab(left)  # (H, W, 3)
        lc, lxw = _left_lab_planes(lab, cfg, H, W, ny, nx)

    interpret = asw_kernel._interpret()
    swb = _spatial_band_np(cfg)

    compute_scratch = [
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.int32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((TXS, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.float32),
        pltpu.VMEM((J8, 128), jnp.int32),
        pltpu.VMEM((TXS, K * XW), jnp.float32),  # big-dot LHS band matrix
        pltpu.VMEM((TXS, 128), jnp.float32),     # uniqueness lane-y plane
    ]
    if interpret:
        # Test path: pre-materialize overlapping tiles (DMA semantics are
        # hardware-only); the compute body is shared with the DMA path.
        ctiles = _extract_tiles_3d(vol, ny, nx, TYO, TXS, RT, XW)
        ctiles = ctiles.reshape(T, RT * XW, DL)
        if uniform:
            lctiles = jnp.zeros((T, RT, TXS, 128), jnp.float32)
            lxtiles = jnp.zeros((T, RT, 8, XW), jnp.float32)
        else:
            lctiles = _extract_tiles_3d(lc, ny, nx, TYO, TXS, RT, TXS)

            def get_x(t):
                iy, ix = t // nx, t % nx
                return lax.dynamic_slice(
                    lxw, (ix, iy * TYO, 0, 0), (1, RT, 8, XW)
                )[0]

            lxtiles = jax.vmap(get_x)(jnp.arange(T))
        kern = functools.partial(_kernel_blocked, cfg=cfg, nx=nx)
        data_in = (ctiles, lctiles, lxtiles)
        data_specs = [
            pl.BlockSpec(
                (1, RT * XW, DL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, RT, TXS, 128),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, 8, XW),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = compute_scratch
    else:
        kern = functools.partial(_kernel_dma, cfg=cfg, nx=nx)
        data_in = (vol, lc, lxw)
        data_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        scratch = [
            pltpu.VMEM((RT, XW, DL), jnp.float32),
            pltpu.VMEM((RT, TXS, 128), jnp.float32),
            pltpu.VMEM((RT, 8, XW), jnp.float32),
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
    swb_spec = (
        pl.BlockSpec((TXS, K * XW), lambda t: (0, 0), memory_space=pltpu.VMEM)
        if uniform
        else pl.BlockSpec(
            (K, TXS, XW), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
        )
    )
    in_specs = data_specs + [
        swb_spec,
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
            pl.BlockSpec(
                (1, TXS, TYO), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
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
            flops=T * 2 * K * TYO * TXS * XW * DL,
            bytes_accessed=T * (RT * XW * DL + RT * TXS * 128) * 4,
            transcendentals=T * TYO * K * TXS * XW,
        ),
    )(
        *data_in,
        jnp.asarray(swb),
        jnp.asarray(W, jnp.int32).reshape(1, 1),
    )

    return _assemble_outputs(bc, bd, cm, cp, rc, rd, ny, nx, H, W, D, u=u)
