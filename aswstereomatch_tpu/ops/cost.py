"""Cost-volume construction (SURVEY.md section 1, L2) in JAX.

Per the pinned spec (config.py):
  AD:        C(x, y, d) = mean_c |L_c(x) - R_c(clamp(x-d))|
  TAD+grad:  C = alpha * min(AD, tau1) + (1-alpha) * min(|gL - gR(x-d)|, tau2)

Two entry points:
  - ``cost_plane``: one (H, W) slice for a single d — used by fused scans so
    the H*W*D volume never has to exist (the fusion-mandatory point in
    SURVEY.md section 6).
  - ``cost_volume``: materialized (H, W, D) — reference path / box-filter
    path / tests.

All ops are static-shape and elementwise; the x-d access is a static slice of
a left-edge-padded right image, so XLA lowers everything to fused VPU code.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import StereoConfig
from . import preprocess


def _as_chw(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W[, C]) -> (H, W, C) float32."""
    if img.ndim == 2:
        img = img[..., None]
    return img.astype(jnp.float32)


def precompute(left: jnp.ndarray, right: jnp.ndarray):
    """Shared per-pair tensors: color planes and x-gradients."""
    lc, rc = _as_chw(left), _as_chw(right)
    gl = preprocess.x_gradient(preprocess.rgb_to_gray(left))
    gr = preprocess.x_gradient(preprocess.rgb_to_gray(right))
    return lc, rc, gl, gr


def _shift_right_image(arr: jnp.ndarray, d, max_d: int) -> jnp.ndarray:
    """arr(y, clamp(x - d)) for scalar d (traced ok), via edge pad + slice.

    arr: (H, W) or (H, W, C).  Pads max_d-1 columns of edge values on the
    left once; a dynamic slice then selects the d-shifted view.
    """
    pad_w = max_d - 1
    if pad_w == 0:
        return arr
    widths = [(0, 0), (pad_w, 0)] + [(0, 0)] * (arr.ndim - 2)
    pad = jnp.pad(arr, widths, mode="edge")
    start = [0, pad_w - d] + [0] * (arr.ndim - 2)
    return lax.dynamic_slice(pad, start, arr.shape)


def cost_plane(lc, rc, gl, gr, d, cfg: StereoConfig) -> jnp.ndarray:
    """(H, W) raw cost for one disparity d (python int or traced scalar)."""
    rs = _shift_right_image(rc, d, cfg.max_disparity)
    ad = jnp.abs(lc - rs).mean(axis=-1)
    if cfg.cost == "ad":
        return ad.astype(jnp.float32)
    gs = _shift_right_image(gr, d, cfg.max_disparity)
    gd = jnp.abs(gl - gs)
    out = cfg.alpha * jnp.minimum(ad, cfg.tau_color) + (1.0 - cfg.alpha) * jnp.minimum(
        gd, cfg.tau_grad
    )
    return out.astype(jnp.float32)


def cost_volume(left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """Materialized (H, W, D) raw cost volume."""
    lc, rc, gl, gr = precompute(left, right)

    def step(_, d):
        return None, cost_plane(lc, rc, gl, gr, d, cfg)

    _, planes = lax.scan(step, None, jnp.arange(cfg.max_disparity))
    return jnp.moveaxis(planes, 0, -1)  # (H, W, D)
