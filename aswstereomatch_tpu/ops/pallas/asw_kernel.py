"""Fused Pallas TPU kernel: cost + ASW aggregation + dual-view WTA.

This is the hot path the framework exists for (SURVEY.md sections 3.2/7 PR3;
reference analog: the 5-deep C++ loop in aggregateASW + the separate WTA /
right-view passes).  One kernel invocation per (TY, TX) output tile does,
entirely in VMEM:

  1. builds the raw TAD+gradient (or AD) cost for all D disparities over the
     tile + aggregation halo — from image patches, on the fly;
  2. runs Yoon-Kweon adaptive-support-weight aggregation with symmetric
     two-view weights: for each window row dy, the left/right bilateral
     weight planes are built once (exp amortized across all d) and the
     (dy, d, dx) accumulation loop is pure VPU mul-add on (TY, TX) vregs;
  3. tracks the running winner-take-all ONLINE for both views — left per
     pixel (with the (C[d*-1], C[d*], C[d*+1]) parabola triple for subpixel)
     and right view via the volume-reuse identity C_R(x', d) = C_L(x'+d, d),
     accumulated at lane offset (D-1-d) into a TX+D-1 wide partial buffer.

The H*W*D aggregated volume never exists anywhere: HBM sees only image
patches in and six (TY, TX)-sized planes per tile out (SURVEY section 6:
KITTI volume is 238 MB, VMEM is ~16 MB — fusion is mandatory).

Border semantics are the pinned virtual padded-plane rules (config.py), so
every access is a static or dynamic *slice* — no gathers — and results match
the jnp path to f32-reduction-order tolerance (and the Pallas path is
bit-deterministic across tilings, since per-pixel accumulation order is
position-independent).

Right-view partials overlap across x-tiles (a right pixel x' receives
candidates d from the tiles owning left pixels x'+d); ``_combine_right``
merges them with (cost, then lower-d, then lower-tile) ordering, reproducing
first-occurrence argmin exactly.
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

# Output-tile geometry.  The kernel is shuffle-bound, not FMA-bound
# (measured by ablation, tools/ablate_sym_kernel.py: the per-d right-weight
# rotate is 40% of runtime and the per-dx unaligned cost-tap slices another
# 41%, while dropping the den FMA changes nothing).  Both shuffle terms
# carry a read-amplification factor TXR/TX = ru128(TX + D - 1)/TX — wider
# tiles amortize the D-wide halo: 2.0x at TX=128/D=128 vs 1.5x at TX=256
# (measured -15.3% end-to-end, bit-identical).  But wider tiles waste
# padded columns on narrow images (TX=256 pads Tsukuba's 384 to 512), so
# _tile_geom picks TX per (W, D) from the measured cost model below.
# TY complements TX so each vector op still covers 4 full vregs
# ((32, 128) and (16, 256) are both 4096 elements); TY beyond that exceeds
# VMEM with D=128 cost slabs (TY=48/64 fail to fit).
TILE_Y = 32       # for TX=128 (and the dlanes kernels' _combine_right4)
TILE_X = 128      # narrow-image default; _tile_geom may widen to 256

# Mosaic's default VMEM budget is conservative; raising it is what allows
# the ~17 MB working set (cost slab + accumulators + weight rows).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024

# Shuffle share of kernel time (ablation-measured at KITTI geometry);
# the FMA share is geometry-independent per output element.
_SHUFFLE_FRAC = 0.45


def _tile_x(w: int, d: int) -> int:
    """Tile width minimizing padded work x shuffle amplification.

    score(TX) = nx * TX * ((1 - s) + s * ru128(TX + D - 1)/TX), s the
    measured shuffle share.  Picks 256 for KITTI (1242, D=128: -15%
    measured) and Middlebury (450, D=64), 128 for Tsukuba (384, D=16).
    """
    best_tx, best_score = 128, None
    for tx in (128, 256):
        nx = -(-w // tx)
        ratio = _ru128(tx + d - 1) / tx
        score = nx * tx * ((1.0 - _SHUFFLE_FRAC) + _SHUFFLE_FRAC * ratio)
        if best_score is None or score < best_score:
            best_tx, best_score = tx, score
    return best_tx


def _tile_y(h: int, tx: int = TILE_X) -> int:
    """Tile height: 4 vregs of rows per op (32 at TX=128, 16 at TX=256),
    or the f32 min tile (8) for short images."""
    ty = TILE_Y if tx <= 128 else TILE_Y * 128 // tx
    return ty if h >= ty else 8


def _ru128(n: int) -> int:
    """Round lane-dimension sizes up to a vreg multiple: Mosaic's dynamic
    rotates (and efficient layouts generally) need 128-aligned lanes."""
    return -(-n // 128) * 128


def _ru8(n: int) -> int:
    """Round sublane-dimension sizes up to the f32 sublane tile: Mosaic's
    dynamic sublane rotates need 8-aligned sublanes (caught on hardware
    only — interpret mode doesn't enforce it)."""
    return -(-n // 8) * 8


def _lane_window(x, start, size: int):
    """x[..., start : start + size] with a *traced* start.

    Mosaic only allows dynamic lane-dim slices at 128-aligned offsets, so
    this uses a dynamic lane rotate (tpu.dynamic_rotate) + static slice:
    roll right by (L - start) puts x[start] at lane 0.  Requires
    start + size <= L (no wraparound into the window).
    """
    L = x.shape[-1]
    shift = lax.rem(jnp.int32(L) - start.astype(jnp.int32), jnp.int32(L))
    rolled = pltpu.roll(x, shift, axis=x.ndim - 1)
    return rolled[..., :size]


def _row_window(x, start, size: int):
    """x[start : start + size, :] (2D) with a traced start, via a dynamic
    sublane rotate + static slice (same Mosaic alignment constraint as
    lanes).  Requires start + size <= x.shape[0]."""
    L = x.shape[0]
    shift = lax.rem(jnp.int32(L) - start.astype(jnp.int32), jnp.int32(L))
    rolled = pltpu.roll(x, shift, axis=0)
    return rolled[:size]


def supports(cfg: StereoConfig) -> bool:
    """The fused kernels cover ASW (both weight modes) and box aggregation,
    for both costs.  aggregation='none' and the separable-ASW approximation
    stay on the jnp path (the fused kernels implement the exact O(K^2)
    window sum)."""
    return cfg.aggregation in ("asw", "box") and not cfg.asw_separable


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _spatial_weights_np(cfg: StereoConfig) -> np.ndarray:
    r = cfg.window_radius
    wy, wx = np.mgrid[-r : r + 1, -r : r + 1]
    d = np.sqrt((wy**2 + wx**2).astype(np.float64))
    return np.exp(-d / cfg.gamma_spatial).astype(np.float32)


_channel_stack = preprocess.channel_stack


def _extract_tiles(stack: jnp.ndarray, ny, nx, ty, tx, ph, pw) -> jnp.ndarray:
    """(7, Hp, Wp) padded stack -> (ny*nx, 7, ph, pw) overlapping patches."""
    def get(t):
        iy, ix = t // nx, t % nx
        return lax.dynamic_slice(stack, (0, iy * ty, ix * tx), (7, ph, pw))

    return jax.vmap(get)(jnp.arange(ny * nx))


def _kernel(
    lpatch_ref,  # (1, 7, PH, PWL)
    rpatch_ref,  # (1, 7, PH, PWR)
    sw_ref,      # (K, K) spatial weights (pallas constants must be inputs)
    nvalid_ref,  # (1, 1) i32 in SMEM: count of real left columns
    dwin_ref,    # (1, 2) i32 in SMEM: [lo, hi) window of d's allowed to win
    bestc_ref,   # (1, TY, TX) f32
    bestd_ref,   # (1, TY, TX) i32
    cm_ref,      # (1, TY, TX) f32  cost at best-1
    cp_ref,      # (1, TY, TX) f32  cost at best+1
    rbestc_ref,  # (1, TY, TXR) f32 right-view partial
    rbestd_ref,  # (1, TY, TXR) i32
    u_ref,       # (1, TY, TX) f32 second-best cost excl. best +-1
    *scratch,    # asw: cost, num, den, slrow, srrow, prev; box: cost, prev;
                 # both + 6 top-4 tracking planes (c1, d1, c2, d2, c3, d3)
    cfg: StereoConfig,
    nx: int,
    ty: int,
    tx: int,
):
    if cfg.aggregation == "box":
        cost_sc, prev_sc = scratch[:2]
        num_sc = den_sc = slrow_sc = srrow_sc = None
    else:
        cost_sc, num_sc, den_sc, slrow_sc, srrow_sc, prev_sc = scratch[:6]
    u1c_sc, u1d_sc, u2c_sc, u2d_sc, u3c_sc, u3d_sc = scratch[-6:]
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    TY, TX = ty, tx
    TXR = _ru128(TX + D - 1)
    PH = _ru8(TY + 2 * r)
    PWL = _ru128(TX + 2 * r)
    sym = cfg.asw_symmetric

    # ---- 1. cost tensor over tile + halo, all disparities -------------------
    l_rgb0 = lpatch_ref[0, 0]
    l_rgb1 = lpatch_ref[0, 1]
    l_rgb2 = lpatch_ref[0, 2]
    l_grad = lpatch_ref[0, 3]

    def cost_body(d, _):
        sh = (D - 1) - d
        rsh = lambda c: _lane_window(rpatch_ref[0, c], sh, PWL)
        ad = (
            jnp.abs(l_rgb0 - rsh(0))
            + jnp.abs(l_rgb1 - rsh(1))
            + jnp.abs(l_rgb2 - rsh(2))
        ) * np.float32(1.0 / 3.0)
        if cfg.cost == "ad":
            plane = ad
        else:
            gd = jnp.abs(l_grad - rsh(3))
            plane = np.float32(cfg.alpha) * jnp.minimum(
                ad, np.float32(cfg.tau_color)
            ) + np.float32(1.0 - cfg.alpha) * jnp.minimum(
                gd, np.float32(cfg.tau_grad)
            )
        cost_sc[d] = plane.astype(jnp.float32)
        return ()

    lax.fori_loop(0, D, cost_body, (), unroll=False)

    if cfg.aggregation == "box":
        # Box mean: separable 33+33 static-shift adds per disparity, fused
        # directly into the WTA loop — no (D, TY, TX) accumulators needed.
        inv_n = np.float32(1.0 / (K * K))

        def agg_of_d(d):
            plane = cost_sc[d]  # (PH, PWL) value
            v = plane[0:TY, :]
            for k in range(1, K):
                v = v + plane[k : k + TY, :]
            hsum = v[:, 0:TX]
            for dx in range(1, K):
                hsum = hsum + v[:, dx : dx + TX]
            return hsum * inv_n

    else:
        # ---- 2. init accumulators ------------------------------------------
        num_sc[...] = jnp.zeros((D, TY, TX), jnp.float32)
        den_sc[...] = jnp.zeros((D, TY, TX), jnp.float32)

        # ---- 3. weight rows + (dy, d, dx) accumulation ---------------------
        _accumulate(
            cfg, lpatch_ref, rpatch_ref, sw_ref, cost_sc, num_sc, den_sc,
            slrow_sc, srrow_sc, ty, tx,
        )

        if cfg.asw_symmetric:

            def agg_of_d(d):
                return num_sc[d] / den_sc[d]

        else:
            # d-independent denominator (accumulated once per window row)
            def agg_of_d(d):
                return num_sc[d] / den_sc[0]

    # ---- 4. online dual-view WTA + subpixel triple -------------------------
    t = pl.program_id(0)
    ix = t % nx
    x0 = ix * TX
    xg = jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 1) + x0
    # padded / out-of-shard left columns must not feed the right view
    x_ok = xg < nvalid_ref[0, 0]

    d_lo = dwin_ref[0, 0]
    d_hi = dwin_ref[0, 1]
    bestc_ref[0] = jnp.full((TY, TX), jnp.inf, jnp.float32)
    bestd_ref[0] = jnp.full((TY, TX), d_lo, jnp.int32)
    cm_ref[0] = jnp.zeros((TY, TX), jnp.float32)
    cp_ref[0] = jnp.zeros((TY, TX), jnp.float32)
    prev_sc[...] = jnp.zeros((TY, TX), jnp.float32)
    rbestc_ref[0] = jnp.full((TY, TXR), jnp.inf, jnp.float32)
    rbestd_ref[0] = jnp.zeros((TY, TXR), jnp.int32)
    # Top-4 smallest-cost tracking (ranks 1-3 below the best): the
    # second-best EXCLUDING d within +-1 of the final winner — the
    # uniqueness-confidence operand — is always among the 4 smallest
    # overall (the excluded set {d0-1, d0, d0+1} holds at most 3 costs),
    # so an online sorted insert of depth 4 computes it exactly in one
    # pass.  The d-lanes kernels read it off the full lane row instead.
    for ref in (u1c_sc, u2c_sc, u3c_sc):
        ref[...] = jnp.full((TY, TX), jnp.inf, jnp.float32)
    for ref in (u1d_sc, u2d_sc, u3d_sc):
        ref[...] = jnp.full((TY, TX), -9, jnp.int32)

    def wta_body(d, _):
        agg = agg_of_d(d)  # (TY, TX)
        # Disparity-shard window: every d's plane is computed (the slab
        # carries one overlap d per side for the subpixel triple), but only
        # in-window d's may win either view.
        in_win = (d >= d_lo) & (d < d_hi)
        # left view: pending C(d*+1) capture, then strict-< update
        bd = bestd_ref[0]
        bc = bestc_ref[0]
        pend = bd == (d - 1)
        cp_ref[0] = jnp.where(pend, agg, cp_ref[0])
        better = (agg < bc) & in_win
        cm_ref[0] = jnp.where(better, prev_sc[...], cm_ref[0])
        bestc_ref[0] = jnp.where(better, agg, bc)
        bestd_ref[0] = jnp.where(better, d, bd)
        prev_sc[...] = agg
        # sorted insert into ranks 1..3 (rank 0 is the best update above);
        # better => lt1 => lt2 => lt3 by the sortedness invariant
        cwin = jnp.where(in_win, agg, jnp.inf)
        c1, d1 = u1c_sc[...], u1d_sc[...]
        c2, d2 = u2c_sc[...], u2d_sc[...]
        c3, d3 = u3c_sc[...], u3d_sc[...]
        lt1 = cwin < c1
        lt2 = cwin < c2
        lt3 = cwin < c3
        u3c_sc[...] = jnp.where(lt2, c2, jnp.where(lt3, cwin, c3))
        u3d_sc[...] = jnp.where(lt2, d2, jnp.where(lt3, d, d3))
        u2c_sc[...] = jnp.where(lt1, c1, jnp.where(lt2, cwin, c2))
        u2d_sc[...] = jnp.where(lt1, d1, jnp.where(lt2, d, d2))
        u1c_sc[...] = jnp.where(better, bc, jnp.where(lt1, cwin, c1))
        u1d_sc[...] = jnp.where(better, bd, jnp.where(lt1, d, d1))
        # right view: C_R(x - d, d) = agg(x); lands at lane offset D-1-d.
        # Build a full-width candidate plane (inf outside [off, off+TX)) via
        # a dynamic lane rotate, then min-update the whole buffer.
        off = (D - 1) - d
        agg_r = jnp.where(x_ok & in_win, agg, jnp.inf)
        full = jnp.concatenate(
            [agg_r, jnp.full((TY, TXR - TX), jnp.inf, jnp.float32)], axis=-1
        )
        shifted = pltpu.roll(full, off, axis=1)
        rc = rbestc_ref[0]
        rbetter = shifted < rc
        rbestc_ref[0] = jnp.where(rbetter, shifted, rc)
        rbestd_ref[0] = jnp.where(rbetter, d, rbestd_ref[0])
        return ()

    lax.fori_loop(0, D, wta_body, (), unroll=False)

    # second-best cost excluding d within +-1 of the final winner
    bd0 = bestd_ref[0]
    u = jnp.full((TY, TX), jnp.inf, jnp.float32)
    for ci_sc, di_sc in ((u1c_sc, u1d_sc), (u2c_sc, u2d_sc), (u3c_sc, u3d_sc)):
        far = jnp.abs(di_sc[...] - bd0) > 1
        u = jnp.minimum(u, jnp.where(far, ci_sc[...], jnp.inf))
    u_ref[0] = u


def _accumulate(cfg, lpatch_ref, rpatch_ref, sw_ref, cost_sc, num_sc, den_sc,
                slrow_sc, srrow_sc, ty, tx):
    """fori over window rows dy; per row build the bilateral weight planes
    once (exp amortized over all d), then fori over d with the unrolled dx
    accumulation — pure (TY, TX)-vreg mul-adds."""
    r = cfg.window_radius
    K = 2 * r + 1
    D = cfg.max_disparity
    TY, TX = ty, tx
    TXR = _ru128(TX + D - 1)
    sym = cfg.asw_symmetric
    inv_gc = np.float32(1.0 / cfg.gamma_color)

    # Window centers (read once): left Lab over the tile, right Lab over the
    # extended right-center span x' in [x0-(D-1), x1].
    cl = [lpatch_ref[0, 4 + c, r : r + TY, r : r + TX] for c in range(3)]
    cr = (
        [rpatch_ref[0, 4 + c, r : r + TY, r : r + TXR] for c in range(3)]
        if sym
        else None
    )

    def dy_body(dy, _):
        swr = sw_ref[pl.ds(dy, 1), :][0]  # (K,) this window row's weights
        # Row blocks [dy, dy+TY) of each Lab channel (dynamic sublane rotate).
        lrow = [
            _row_window(lpatch_ref[0, 4 + c], dy, TY) for c in range(3)
        ]  # 3 x (TY, PWL)
        if sym:
            rrow = [
                _row_window(rpatch_ref[0, 4 + c], dy, TY) for c in range(3)
            ]  # 3 x (TY, PWR)
        for dx in range(K):
            d2 = jnp.zeros((TY, TX), jnp.float32)
            for c in range(3):
                diff = lrow[c][:, dx : dx + TX] - cl[c]
                d2 = d2 + diff * diff
            slrow_sc[dx] = jnp.exp(-jnp.sqrt(d2) * inv_gc) * swr[dx]
            if sym:
                d2r = jnp.zeros((TY, TXR), jnp.float32)
                for c in range(3):
                    diffr = rrow[c][:, dx : dx + TXR] - cr[c]
                    d2r = d2r + diffr * diffr
                srrow_sc[dx] = jnp.exp(-jnp.sqrt(d2r) * inv_gc) * swr[dx]

        if not sym:
            # Left-only weights are disparity-independent, so the
            # normalization denominator is too: accumulate it once per
            # window row into den_sc[0] instead of per (d, dx).
            sl = slrow_sc[...]
            dacc = sl[0]
            for dx in range(1, K):
                dacc = dacc + sl[dx]
            den_sc[0] = den_sc[0] + dacc

        # Manual 2-way unroll over d: consecutive disparities share the bulk
        # weight-row reads (the dominant VMEM traffic), differing only in the
        # srs rotate offset and the cost row.  Per-pixel accumulation order
        # is unchanged (d ascending), so results are bit-identical to U=1.
        # (Round-2 measured alternative: one rotate per d-group + static
        # unaligned sub-slices — only 6.5% faster at U=4 but 14x the Mosaic
        # compile time; unaligned lane slices materialize as near-rotate-cost
        # copies on this Mosaic.  See docs/PERF_NOTES.md.)
        U = 2 if D % 2 == 0 else 1

        def d_group(g, _):
            slrow = slrow_sc[...]  # one bulk read per group
            srbulk = srrow_sc[...] if sym else None
            for u in range(U):
                d = g * U + u
                crow = _row_window(cost_sc[d], dy, TY)  # (TY, PWL) value
                if sym:
                    srs = _lane_window(srbulk, (D - 1) - d, TX)
                # 4 interleaved partial accumulators: a single running sum
                # is a serial FMA chain; independent partials restore ILP.
                LANES = 4
                nums = [jnp.zeros((TY, TX), jnp.float32) for _ in range(LANES)]
                dens = [jnp.zeros((TY, TX), jnp.float32) for _ in range(LANES)]
                for j, dx in enumerate(range(K)):
                    if sym:
                        t_ = slrow[dx] * srs[dx]
                    else:
                        t_ = slrow[dx]
                    k = j % LANES
                    nums[k] = nums[k] + t_ * crow[:, dx : dx + TX]
                    if sym:
                        dens[k] = dens[k] + t_
                num_sc[d] = num_sc[d] + ((nums[0] + nums[1]) + (nums[2] + nums[3]))
                if sym:
                    den_sc[d] = den_sc[d] + ((dens[0] + dens[1]) + (dens[2] + dens[3]))
            return ()

        lax.fori_loop(0, D // U, d_group, (), unroll=False)
        return ()

    lax.fori_loop(0, K, dy_body, (), unroll=False)


def wta_outputs(left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig):
    """Run the fused kernel over the image.

    Returns dict with f32/i32 (H, W) planes:
      bestd, bestc, cm, cp  — left-view integer WTA + parabola triple
      rbestd                — right-view WTA (volume reuse), for the LR check
    """
    if not supports(cfg):
        raise ValueError("pallas kernels require aggregation 'asw' or 'box'")
    r = cfg.window_radius
    D = cfg.max_disparity
    ls = _channel_stack(left)
    rs = _channel_stack(right)
    ls_ext = jnp.pad(ls, ((0, 0), (0, 0), (r, r)), mode="edge")
    rs_ext = jnp.pad(rs, ((0, 0), (0, 0), (r + D - 1, r)), mode="edge")
    return wta_outputs_from_stacks(ls_ext, rs_ext, cfg, left.shape[1])


def wta_outputs_from_stacks(
    ls_ext: jnp.ndarray,
    rs_ext: jnp.ndarray,
    cfg: StereoConfig,
    n_valid_cols: int,
    want_strip: bool = False,
    d_window=None,
):
    """Fused kernel over pre-extended channel stacks (preprocess.channel_stack
    layout) — the entry the x-tiled shard path uses, where the extended
    columns hold *real neighbor data* from halo exchange.

    ls_ext: (7, H, Wo + 2r); rs_ext: (7, H, Wo + 2r + D - 1), Wo = owned
    width.  ``n_valid_cols``: how many local columns are real left pixels
    (candidates from alignment-padding columns are excluded from the right
    view).  With ``want_strip`` the dict additionally carries the right-view
    partial for columns [-(D-1), -1] plus the owned-region partial costs,
    for the caller's cross-shard strict-< merge (requires D - 1 <= TILE_X).
    """
    if cfg.asw_separable:
        # This kernel computes the exact O(K^2) window; silently running it
        # for a separable config would diverge from the jnp/oracle paths.
        raise ValueError(
            "the exact x-lanes kernel does not implement separable ASW; "
            "sharded separable runs use the jnp from_stacks path"
        )
    H = ls_ext.shape[1]
    W = ls_ext.shape[2] - 2 * cfg.window_radius
    r = cfg.window_radius
    D = cfg.max_disparity
    TX = _tile_x(W, D)
    TY = _tile_y(H, TX)
    TXR = _ru128(TX + D - 1)
    ny = math.ceil(H / TY)
    nx = math.ceil(W / TX)
    PH = _ru8(TY + 2 * r)  # sublane-aligned patch height
    PWL = _ru128(TX + 2 * r)
    # right patch must cover taps [dx, dx + TXR) for dx < 2r+1
    PWR = _ru128(2 * r + TXR)
    K = 2 * r + 1
    T = ny * nx
    if want_strip and D - 1 > TX:
        raise ValueError("strip export requires max_disparity - 1 <= TILE_X")
    if d_window is None:
        d_window = (0, D)

    # Alignment padding only (the semantic halo columns are already present);
    # bottom rows reach (ny-1)*TY + PH.
    pad_y = (r, (ny - 1) * TY + PH - r - H)
    lsp = jnp.pad(
        ls_ext,
        ((0, 0), pad_y, (0, (nx - 1) * TX + PWL - (W + 2 * r))),
        mode="edge",
    )
    rsp = jnp.pad(
        rs_ext,
        ((0, 0), pad_y, (0, (nx - 1) * TX + PWR - (W + 2 * r + D - 1))),
        mode="edge",
    )
    ltiles = _extract_tiles(lsp, ny, nx, TY, TX, PH, PWL)
    rtiles = _extract_tiles(rsp, ny, nx, TY, TX, PH, PWR)

    kern = functools.partial(_kernel, cfg=cfg, nx=nx, ty=TY, tx=TX)
    out_shapes = [
        jax.ShapeDtypeStruct((T, TY, TX), jnp.float32),   # bestc
        jax.ShapeDtypeStruct((T, TY, TX), jnp.int32),     # bestd
        jax.ShapeDtypeStruct((T, TY, TX), jnp.float32),   # cm
        jax.ShapeDtypeStruct((T, TY, TX), jnp.float32),   # cp
        jax.ShapeDtypeStruct((T, TY, TXR), jnp.float32),  # rbestc
        jax.ShapeDtypeStruct((T, TY, TXR), jnp.int32),    # rbestd
        jax.ShapeDtypeStruct((T, TY, TX), jnp.float32),   # ubest
    ]
    in_specs = [
        pl.BlockSpec((1, 7, PH, PWL), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 7, PH, PWR), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, TY, TX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TY, TX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TY, TX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TY, TX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TY, TXR), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TY, TXR), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TY, TX), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
    ]
    if cfg.aggregation == "box":
        scratch = [
            pltpu.VMEM((D, PH, PWL), jnp.float32),   # cost
            pltpu.VMEM((TY, TX), jnp.float32),       # prev agg plane
        ]
        flops_tile = 2 * K * D * TY * TX  # separable box
    else:
        scratch = [
            pltpu.VMEM((D, PH, PWL), jnp.float32),   # cost
            pltpu.VMEM((D, TY, TX), jnp.float32),    # num
            pltpu.VMEM((D, TY, TX), jnp.float32),    # den
            pltpu.VMEM((K, TY, TX), jnp.float32),    # sl row
            pltpu.VMEM((K, TY, TXR), jnp.float32),   # sr row
            pltpu.VMEM((TY, TX), jnp.float32),       # prev agg plane
        ]
        flops_tile = K * K * D * TY * TX * (5 if cfg.asw_symmetric else 4)
    scratch += [  # top-4 tracking planes (c1, d1, c2, d2, c3, d3)
        pltpu.VMEM((TY, TX), jnp.float32),
        pltpu.VMEM((TY, TX), jnp.int32),
        pltpu.VMEM((TY, TX), jnp.float32),
        pltpu.VMEM((TY, TX), jnp.int32),
        pltpu.VMEM((TY, TX), jnp.float32),
        pltpu.VMEM((TY, TX), jnp.int32),
    ]
    bestc, bestd, cm, cp, rbestc, rbestd, ubest = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        cost_estimate=pl.CostEstimate(
            flops=T * flops_tile,
            bytes_accessed=T * (7 * PH * (PWL + PWR) + 6 * TY * TX) * 4,
            transcendentals=T * K * K * (TY * (TX + TXR)),
        ),
    )(
        ltiles,
        rtiles,
        jnp.asarray(_spatial_weights_np(cfg)),
        jnp.asarray(n_valid_cols, jnp.int32).reshape(1, 1),
        jnp.stack(
            [jnp.asarray(d_window[0], jnp.int32),
             jnp.asarray(d_window[1], jnp.int32)]
        ).reshape(1, 2),
    )

    def assemble(tiles, w_tile):
        # (T, TY, wt) -> (H, nx*wt) crop later per-use
        a = tiles.reshape(ny, nx, TY, w_tile)
        a = jnp.moveaxis(a, 2, 1).reshape(ny * TY, nx * w_tile)
        return a

    out = {
        "bestd": assemble(bestd, TX)[:H, :W],
        "bestc": assemble(bestc, TX)[:H, :W],
        "cm": assemble(cm, TX)[:H, :W],
        "cp": assemble(cp, TX)[:H, :W],
        "ubest": assemble(ubest, TX)[:H, :W],
    }
    own_c, own_d, strip_c, strip_d = _combine_right(
        rbestc, rbestd, ny, nx, H, W, D, TX
    )
    out["rbestd"] = own_d
    if want_strip:
        out["rbestc"] = own_c
        out["r_strip_c"] = strip_c
        out["r_strip_d"] = strip_d
    return out


def _combine_right(rbestc, rbestd, ny, nx, H, W, D, tx=TILE_X):
    """Merge per-tile right-view partials into the (H, W) right disparity
    ((T, TY, TXR) buffers from the x-lanes kernel)."""
    TY = rbestc.shape[1]
    TXR = _ru128(tx + D - 1)
    return _combine_right4(
        rbestc.reshape(ny, nx, TY, TXR),
        rbestd.reshape(ny, nx, TY, TXR),
        H, W, D, tx,
    )


def _combine_right4(rc, rd, H, W, D, TX):
    """Merge per-tile right-view partials into the (H, W) right disparity.

    Tile ix's buffer covers right columns [ix*TX - (D-1), ix*TX + TX - 1];
    column x' receives its low disparities (d in [0, x1-x']) from the tile
    owning x' and higher d's from tiles to the right.  Merge preserves
    first-occurrence argmin: later tiles only win on strictly smaller cost
    (their candidates have strictly larger d).

    rc/rd: (ny, nx, TY, >= TX + D - 1) partial buffers, lane k of tile ix
    holding right column ix*TX - (D-1) + k; shared by the x-lanes
    (TXR-padded) and d-lanes (J8-padded) kernels.
    """
    ny, nx, TY, TXR = rc.shape
    # own contribution: lanes [D-1, D-1+TX) are right cols [x0, x1]
    best_c = rc[:, :, :, D - 1 : D - 1 + TX]
    best_d = rd[:, :, :, D - 1 : D - 1 + TX]
    n_nb = math.ceil((D - 1) / TX) if D > 1 else 0
    inf = jnp.inf
    for m in range(1, n_nb + 1):
        # neighbor ix+m covers col x' at its lane k = x' - (ix+m)*TX + D-1
        # = j - m*TX + D-1 for j in [0, TX); valid where k >= 0.
        lo = D - 1 - m * TX  # k for j=0
        nb_c = jnp.concatenate(
            [rc[:, m:, :, :], jnp.full((ny, m, TY, TXR), inf, rc.dtype)], axis=1
        )
        nb_d = jnp.concatenate(
            [rd[:, m:, :, :], jnp.zeros((ny, m, TY, TXR), rd.dtype)], axis=1
        )
        if lo >= 0:
            cand_c = nb_c[:, :, :, lo : lo + TX]
            cand_d = nb_d[:, :, :, lo : lo + TX]
        else:
            pad = -lo
            cand_c = jnp.concatenate(
                [jnp.full((ny, nx, TY, pad), inf, rc.dtype),
                 nb_c[:, :, :, : TX - pad]], axis=3,
            )
            cand_d = jnp.concatenate(
                [jnp.zeros((ny, nx, TY, pad), rd.dtype),
                 nb_d[:, :, :, : TX - pad]], axis=3,
            )
        take = cand_c < best_c  # strict: neighbor has strictly larger d
        best_c = jnp.where(take, cand_c, best_c)
        best_d = jnp.where(take, cand_d, best_d)

    def flat(a, wt):
        return jnp.moveaxis(a, 2, 1).reshape(ny * TY, a.shape[1] * wt)

    # Partial for columns left of the local origin (x' in [-(D-1), -1]):
    # with D - 1 <= TX these candidates live wholly in tile ix=0's lanes
    # [0, D-1) — exported for cross-shard merges.
    if D > 1:
        strip_c = flat(rc[:, 0:1, :, 0 : D - 1], D - 1)[:H]
        strip_d = flat(rd[:, 0:1, :, 0 : D - 1], D - 1)[:H]
    else:
        strip_c = jnp.zeros((H, 0), rc.dtype)
        strip_d = jnp.zeros((H, 0), rd.dtype)
    return (
        flat(best_c, TX)[:H, :W],
        flat(best_d, TX)[:H, :W],
        strip_c,
        strip_d,
    )
