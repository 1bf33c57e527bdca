"""Cost aggregation (SURVEY.md section 1, L3) in JAX.

Two aggregators, per the reference's capability set (SURVEY.md section 2.1):

  - ``aggregate_box``: fixed-window mean (the BASELINE config-1 path), via
    edge-pad + ``lax.reduce_window`` — XLA lowers this to an efficient
    separable sliding-window sum.

  - ``aggregate_asw``: Yoon-Kweon adaptive-support-weight bilateral
    aggregation (TPAMI 2006 section 3) with symmetric two-view weights — the
    algorithm the reference repo exists for (SURVEY.md section 3.2).  The
    structure exploits the two key facts from the survey: weights depend on
    the *images*, not the cost, so the left-weight planes are computed once
    and reused across all d; the right weights are the same planes indexed at
    x-d, realized as one edge-padded buffer + per-d dynamic slice inside a
    ``lax.scan`` over disparities.  The raw cost is computed per-plane inside
    the scan, so no unaggregated H*W*D volume is materialized.

This is the readable/verifiable implementation (it does materialize the
(H, W, K^2) weight planes and the aggregated output volume in HBM); the fused
Pallas kernel in ``ops/pallas`` is the speed-of-light path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..config import StereoConfig
from . import cost as cost_ops
from . import preprocess


def _patches_2d(arr: jnp.ndarray, radius: int) -> jnp.ndarray:
    """All (2r+1)^2 window taps of a 2D array with replicate border.

    Returns (H, W, O) with offsets in row-major (wy, wx) order — the same
    order the NumPy oracle's window loops use.
    """
    k = 2 * radius + 1
    h, w = arr.shape
    pad = jnp.pad(arr, ((radius, radius), (radius, radius)), mode="edge")
    # Explicit static slices, NOT conv_general_dilated_patches: the conv
    # lowering computes in reduced precision on some backends (observed
    # ~bf16-level error on XLA CPU here), which breaks bit-parity with the
    # oracle.  Slices + stack are exact data movement.
    taps = [
        pad[wy : wy + h, wx : wx + w] for wy in range(k) for wx in range(k)
    ]
    return jnp.stack(taps, axis=-1)  # (H, W, O)


def _spatial_weights(cfg: StereoConfig) -> np.ndarray:
    r = cfg.window_radius
    wy, wx = np.mgrid[-r : r + 1, -r : r + 1]
    dist = np.sqrt((wy**2 + wx**2).astype(np.float64))
    return np.exp(-dist / cfg.gamma_spatial).astype(np.float32).reshape(-1)


def _bilateral_planes(img: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """Per-pixel ASW weight planes w(p, p+o) for all window offsets o.

    Returns (H, W, O), O = (2r+1)^2.  w = exp(-dLab/gamma_c) * exp(-|o|/gamma_p).
    """
    lab = preprocess.rgb_to_lab(img)
    r = cfg.window_radius
    d2 = None
    for c in range(3):
        p = _patches_2d(lab[..., c], r)
        diff = p - lab[..., c : c + 1]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    dcolor = jnp.sqrt(d2)
    sw = jnp.asarray(_spatial_weights(cfg))
    return (jnp.exp(-dcolor / cfg.gamma_color) * sw).astype(jnp.float32)


def aggregate_box(vol: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """Mean over the (2r+1)^2 window, replicate border.  vol: (H, W, D)."""
    r = cfg.window_radius
    if r == 0:
        return vol
    k = 2 * r + 1
    pad = jnp.pad(vol, ((r, r), (r, r), (0, 0)), mode="edge")
    summed = lax.reduce_window(
        pad, 0.0, lax.add, (k, k, 1), (1, 1, 1), "VALID"
    )
    return (summed / float(k * k)).astype(jnp.float32)


def aggregate_asw(
    left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig
) -> jnp.ndarray:
    """Full ASW-aggregated cost volume (H, W, D), fused cost construction.

    Matches the oracle's aggregate_asw(cost_volume(...)) composition.
    """
    r = cfg.window_radius
    D = cfg.max_disparity
    h, w = left.shape[:2]

    wl = _bilateral_planes(left, cfg)  # (H, W, O)
    lc, rc, gl, gr = cost_ops.precompute(left, right)

    if cfg.asw_symmetric:
        wr = _bilateral_planes(right, cfg)
        # Pre-pad along x so step d can slice wr evaluated at clamp(x - d).
        wr_pad = jnp.pad(wr, ((0, 0), (D - 1, 0), (0, 0)), mode="edge")
    else:
        wr_pad = None

    def step(_, d):
        plane = cost_ops.cost_plane(lc, rc, gl, gr, d, cfg)  # (H, W)
        taps = _patches_2d(plane, r)  # (H, W, O)
        if wr_pad is not None:
            wr_d = lax.dynamic_slice(wr_pad, (0, (D - 1) - d, 0), (h, w, wl.shape[-1]))
            wgt = wl * wr_d
        else:
            wgt = wl
        num = jnp.sum(wgt * taps, axis=-1)
        den = jnp.sum(wgt, axis=-1)
        return None, (num / den).astype(jnp.float32)

    _, planes = lax.scan(step, None, jnp.arange(D))
    return jnp.moveaxis(planes, 0, -1)  # (H, W, D)
