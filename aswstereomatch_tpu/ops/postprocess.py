"""Post-processing (SURVEY.md section 1, L5) in JAX.

Left-right consistency via cost-volume reuse (C_R(x,d) = C_L(x+d,d),
SURVEY.md section 3.3), hole filling with background bias, and a final 3x3
median — all static-shape, scan-free formulations:

  - the LR gather ``dispR[x - round(dispL)]`` is a take_along_axis along x;
  - nearest-valid-left/right fill uses running maximums of valid indices
    (``lax.cummax``-style) instead of a sequential scan, so it vectorizes and
    tiles trivially (rows are independent — the pinned spec is per-row).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import StereoConfig


def right_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """C_R(x', d) = C_L(x' + d, d) by volume reuse; candidates with
    x' + d > W - 1 have no left pixel and are excluded (+inf).  vol: (H, W, D).
    """
    h, w, D = vol.shape
    x = jnp.arange(w)[:, None]
    d = jnp.arange(D)[None, :]
    idx = x + d  # (W, D)
    gathered = jnp.take_along_axis(
        vol, jnp.broadcast_to(jnp.minimum(idx, w - 1)[None], (h, w, D)), axis=1
    )
    return jnp.where(idx[None] <= w - 1, gathered, jnp.inf).astype(jnp.float32)


def lr_check(
    disp_l: jnp.ndarray, disp_r: jnp.ndarray, cfg: StereoConfig
) -> jnp.ndarray:
    """Validity mask per the pinned spec.  Inputs are (H, W) float or int."""
    h, w = disp_l.shape
    dl = disp_l.astype(jnp.float32)
    xr = jnp.arange(w)[None, :] - jnp.round(dl).astype(jnp.int32)
    in_range = (xr >= 0) & (xr < w)
    xr_c = jnp.clip(xr, 0, w - 1)
    dr = jnp.take_along_axis(disp_r.astype(jnp.float32), xr_c, axis=1)
    return in_range & (jnp.abs(dl - dr) <= cfg.lr_tol)


def fill_holes(disp: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Invalid pixels take min(nearest valid left, nearest valid right).

    Per-row; one-sided at row edges; rows with no valid pixel fill with 0.
    """
    h, w = disp.shape
    x = jnp.arange(w)[None, :]
    big = jnp.float32(jnp.inf)

    # Index of nearest valid pixel at or to the left (-1 if none).
    li = lax.cummax(jnp.where(valid, x, -1), axis=1)
    # Nearest valid at or to the right (w if none): same trick on the
    # x-reversed mask, then map reversed indices back.
    li_rev = lax.cummax(jnp.where(valid[:, ::-1], x, -1), axis=1)
    ri = (w - 1) - li_rev[:, ::-1]  # "none" (-1) maps to w

    dl = jnp.take_along_axis(disp.astype(jnp.float32), jnp.clip(li, 0, w - 1), axis=1)
    dl = jnp.where(li >= 0, dl, big)
    dr = jnp.take_along_axis(disp.astype(jnp.float32), jnp.clip(ri, 0, w - 1), axis=1)
    dr = jnp.where(ri <= w - 1, dr, big)

    fill = jnp.minimum(dl, dr)
    fill = jnp.where(jnp.isinf(fill), 0.0, fill)
    return jnp.where(valid, disp.astype(jnp.float32), fill)


def median3(disp: jnp.ndarray) -> jnp.ndarray:
    """3x3 median, replicate border — final smoothing stage."""
    pad = jnp.pad(disp, ((1, 1), (1, 1)), mode="edge")
    h, w = disp.shape
    taps = jnp.stack(
        [pad[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    return jnp.sort(taps, axis=-1)[..., 4].astype(jnp.float32)


def weighted_median3(
    disp: jnp.ndarray, guide_lab: jnp.ndarray, cfg: StereoConfig
) -> jnp.ndarray:
    """Bilateral-guided 3x3 weighted median (config.py pinned spec).

    Weights come from the left image's Lab planes (the aggregation guidance),
    ``exp(-dLab/gamma_c - |o|/gamma_p)``; taps are sorted ascending by
    disparity (stable) and the output is the first value whose cumulative
    weight reaches half the total — the standard occlusion-edge-preserving
    refinement of the plain median (reference capability: SURVEY.md section
    2.1 "Median/weighted-median filter").
    """
    import numpy as np

    h, w = disp.shape
    pd = jnp.pad(disp, ((1, 1), (1, 1)), mode="edge")
    pg = jnp.pad(guide_lab, ((1, 1), (1, 1), (0, 0)), mode="edge")
    vals = []
    wgts = []
    for dy in range(3):
        for dx in range(3):
            vals.append(pd[dy : dy + h, dx : dx + w])
            dlab = jnp.sqrt(
                jnp.sum(
                    (pg[dy : dy + h, dx : dx + w] - guide_lab) ** 2, axis=-1
                )
            )
            sp = np.float32(
                np.hypot(dy - 1, dx - 1) / cfg.gamma_spatial
            )
            wgts.append(jnp.exp(-dlab / cfg.gamma_color - sp))
    v = jnp.stack(vals, axis=-1)  # (H, W, 9)
    g = jnp.stack(wgts, axis=-1)
    order = jnp.argsort(v, axis=-1, stable=True)
    v_s = jnp.take_along_axis(v, order, axis=-1)
    g_s = jnp.take_along_axis(g, order, axis=-1)
    cum = jnp.cumsum(g_s, axis=-1)
    half = cum[..., -1:] * 0.5
    k = jnp.argmax(cum >= half, axis=-1)
    return jnp.take_along_axis(v_s, k[..., None], axis=-1)[..., 0].astype(
        jnp.float32
    )


def median_filter(
    disp: jnp.ndarray, cfg: StereoConfig, guide_lab: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Dispatch to the configured final median variant."""
    if cfg.median_mode == "weighted":
        if guide_lab is None:
            raise ValueError("weighted median needs the left-image Lab guide")
        return weighted_median3(disp, guide_lab, cfg)
    return median3(disp)
