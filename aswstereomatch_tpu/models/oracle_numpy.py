"""Literal NumPy oracle for the full stereo pipeline.

This is the in-repo golden: a direct, loop-level transcription of the pinned
numeric spec in ``config.py`` — the same role the reference's C++ inner loops
play (SURVEY.md section 3.1/3.2), written for *obvious correctness*, not
speed.  Use only on small images/crops; every vectorized JAX stage and every
Pallas kernel must match this bit-for-bit in f32 (tests/test_pipeline.py).

The ASW aggregation below is the 5-deep loop (y, x, d, wy, wx) of
Yoon-Kweon TPAMI 2006 section 3 with symmetric two-view weights:

    w(p, q)   = exp(-||Lab(p)-Lab(q)||_2 / gamma_c - ||p-q||_2 / gamma_p)
    E(p, d)   = sum_q wL(p,q) * wR(p-d, q-d) * e(q, q-d) / sum_q wL*wR
"""

from __future__ import annotations

import numpy as np

from ..config import StereoConfig
from ..utils import colorspace


# ---------------------------------------------------------------------------
# Stage implementations (all replicate-border, per the pinned spec)
# ---------------------------------------------------------------------------

def gray_and_grad(img: np.ndarray):
    gray = colorspace.rgb_to_gray(img, np) if img.ndim == 3 else img.astype(np.float32)
    h, w = gray.shape
    grad = np.empty_like(gray)
    for x in range(w):
        xm = max(x - 1, 0)
        xp = min(x + 1, w - 1)
        grad[:, x] = gray[:, xp] - gray[:, xm]
    return gray, grad


def cost_volume(left: np.ndarray, right: np.ndarray, cfg: StereoConfig) -> np.ndarray:
    """Raw cost volume C[y, x, d] per the pinned AD / TAD+grad spec."""
    h, w = left.shape[:2]
    D = cfg.max_disparity
    if left.ndim == 3:
        lc, rc = left, right
    else:
        lc, rc = left[..., None], right[..., None]
    _, gl = gray_and_grad(left)
    _, gr = gray_and_grad(right)
    vol = np.zeros((h, w, D), np.float32)
    for d in range(D):
        for x in range(w):
            xr = max(x - d, 0)  # clamp (replicate border)
            ad = np.abs(lc[:, x, :] - rc[:, xr, :]).mean(axis=-1)
            if cfg.cost == "ad":
                vol[:, x, d] = ad
            else:
                gd = np.abs(gl[:, x] - gr[:, xr])
                vol[:, x, d] = cfg.alpha * np.minimum(
                    ad, cfg.tau_color
                ) + (1.0 - cfg.alpha) * np.minimum(gd, cfg.tau_grad)
    return vol


def aggregate_box(vol: np.ndarray, cfg: StereoConfig) -> np.ndarray:
    """Mean over (2r+1)^2 window, replicate border."""
    h, w, D = vol.shape
    r = cfg.window_radius
    out = np.zeros_like(vol)
    for y in range(h):
        for x in range(w):
            acc = np.zeros(D, np.float64)
            for wy in range(-r, r + 1):
                for wx in range(-r, r + 1):
                    yy = min(max(y + wy, 0), h - 1)
                    xx = min(max(x + wx, 0), w - 1)
                    acc += vol[yy, xx]
            out[y, x] = acc / float((2 * r + 1) ** 2)
    return out.astype(np.float32)


def asw_weight(
    lab: np.ndarray, y: int, x: int, yy: int, xx: int, wy: int, wx: int, cfg: StereoConfig
) -> float:
    """Yoon-Kweon bilateral weight.

    Color term uses the (border-clamped) tap pixel; the spatial term uses the
    *nominal* window offset (wy, wx) — pinned so that border behavior equals
    edge-padding + fixed per-offset spatial weight in the vectorized kernels.
    """
    dc = float(np.sqrt(((lab[y, x] - lab[yy, xx]) ** 2).sum()))
    dg = float(np.sqrt(wy * wy + wx * wx))
    return float(np.exp(-dc / cfg.gamma_color - dg / cfg.gamma_spatial))


def aggregate_asw(
    vol: np.ndarray, left: np.ndarray, right: np.ndarray, cfg: StereoConfig
) -> np.ndarray:
    """Yoon-Kweon adaptive-support-weight aggregation, literal 5-loop form.

    Replicate-border on window taps AND on the right-view center/taps
    (x - d clamped to >= 0), matching the vectorized pipeline exactly.
    """
    h, w, D = vol.shape
    r = cfg.window_radius
    lab_l = colorspace.rgb_to_lab(left, np)
    lab_r = colorspace.rgb_to_lab(right, np)
    out = np.zeros_like(vol)
    for y in range(h):
        for x in range(w):
            for d in range(D):
                xr = max(x - d, 0)  # right-view center (clamped)
                num = 0.0
                den = 0.0
                for wy in range(-r, r + 1):
                    for wx in range(-r, r + 1):
                        yy = min(max(y + wy, 0), h - 1)
                        xx = min(max(x + wx, 0), w - 1)
                        wl = asw_weight(lab_l, y, x, yy, xx, wy, wx, cfg)
                        if cfg.asw_symmetric:
                            yyr = yy
                            xxr = min(max(xr + wx, 0), w - 1)
                            wr_ = asw_weight(lab_r, y, xr, yyr, xxr, wy, wx, cfg)
                        else:
                            wr_ = 1.0
                        wgt = wl * wr_
                        num += wgt * vol[yy, xx, d]
                        den += wgt
                out[y, x, d] = num / den
    return out.astype(np.float32)


def wta(vol: np.ndarray) -> np.ndarray:
    return np.argmin(vol, axis=-1).astype(np.int32)


def subpixel(vol: np.ndarray, disp: np.ndarray) -> np.ndarray:
    h, w, D = vol.shape
    out = disp.astype(np.float32).copy()
    for y in range(h):
        for x in range(w):
            d = int(disp[y, x])
            if d <= 0 or d >= D - 1:
                continue
            c0, cm, cp = vol[y, x, d], vol[y, x, d - 1], vol[y, x, d + 1]
            denom = cp - 2.0 * c0 + cm
            if abs(denom) <= 1e-6:
                continue
            off = (cp - cm) / (2.0 * denom)
            out[y, x] = d - float(np.clip(off, -0.5, 0.5))
    return out


def right_volume(vol: np.ndarray) -> np.ndarray:
    """C_R(x, d) = C_L(min(x+d, W-1), d) (volume reuse, SURVEY section 3.3)."""
    h, w, D = vol.shape
    out = np.zeros_like(vol)
    for d in range(D):
        for x in range(w):
            out[:, x, d] = vol[:, min(x + d, w - 1), d]
    return out


def lr_check(disp_l: np.ndarray, disp_r: np.ndarray, cfg: StereoConfig) -> np.ndarray:
    """Validity mask: |dL(x) - dR(x - round(dL(x)))| <= lr_tol, x-d in range."""
    h, w = disp_l.shape
    valid = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            d = float(disp_l[y, x])
            xr = x - int(round(d))
            if xr < 0 or xr >= w:
                continue
            if abs(d - float(disp_r[y, xr])) <= cfg.lr_tol:
                valid[y, x] = True
    return valid


def fill_holes(disp: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Invalid pixels take min(nearest valid left, nearest valid right)."""
    h, w = disp.shape
    out = disp.astype(np.float32).copy()
    BIG = np.float32(np.inf)
    for y in range(h):
        left_fill = np.full(w, BIG, np.float32)
        run = BIG
        for x in range(w):
            if valid[y, x]:
                run = out[y, x]
            left_fill[x] = run
        right_fill = np.full(w, BIG, np.float32)
        run = BIG
        for x in range(w - 1, -1, -1):
            if valid[y, x]:
                run = out[y, x]
            right_fill[x] = run
        for x in range(w):
            if not valid[y, x]:
                v = min(left_fill[x], right_fill[x])
                out[y, x] = 0.0 if np.isinf(v) else v
    return out


def median3(disp: np.ndarray) -> np.ndarray:
    h, w = disp.shape
    out = np.empty_like(disp)
    for y in range(h):
        for x in range(w):
            vals = []
            for wy in (-1, 0, 1):
                for wx in (-1, 0, 1):
                    yy = min(max(y + wy, 0), h - 1)
                    xx = min(max(x + wx, 0), w - 1)
                    vals.append(disp[yy, xx])
            out[y, x] = np.sort(np.asarray(vals))[4]
    return out


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def match_pair(left: np.ndarray, right: np.ndarray, cfg: StereoConfig) -> np.ndarray:
    """End-to-end oracle: images -> float32 disparity map (SURVEY section 3.1)."""
    vol = cost_volume(left, right, cfg)
    if cfg.aggregation == "box":
        vol = aggregate_box(vol, cfg)
    elif cfg.aggregation == "asw":
        vol = aggregate_asw(vol, left, right, cfg)
    disp_i = wta(vol)
    disp = subpixel(vol, disp_i) if cfg.subpixel else disp_i.astype(np.float32)
    if cfg.lr_check:
        vol_r = right_volume(vol)
        disp_r_i = wta(vol_r)
        valid = lr_check(disp_i.astype(np.float32), disp_r_i.astype(np.float32), cfg)
        if cfg.fill_holes:
            disp = fill_holes(disp, valid)
        else:
            disp = np.where(valid, disp, -1.0).astype(np.float32)
    if cfg.median_filter:
        disp = median3(disp)
    return disp.astype(np.float32)
