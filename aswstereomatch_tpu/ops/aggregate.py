"""Cost aggregation (SURVEY.md section 1, L3) in JAX.

Two aggregators, per the reference's capability set (SURVEY.md section 2.1),
both under the pinned virtual padded-plane border semantics (config.py):

  - ``aggregate_box``: fixed-window mean (the BASELINE config-1 path) —
    x taps slide VALID over the x-extended cost, y taps over edge-replicated
    rows, via ``lax.reduce_window``.

  - ``aggregate_asw``: Yoon-Kweon adaptive-support-weight bilateral
    aggregation (TPAMI 2006 section 3) with symmetric two-view weights — the
    algorithm the reference repo exists for (SURVEY.md section 3.2).  The
    structure exploits the two key facts from the survey: weights depend on
    the *images*, not the cost, so the left-weight planes are computed once
    and reused across all d; and the right weights are the same planes on the
    x-extended right domain, indexed at x - d — a pure dynamic slice inside a
    ``lax.scan`` over disparities.  Raw cost is computed per-plane inside the
    scan, so no unaggregated H*W*D volume is materialized.

This is the readable/verifiable implementation (it materializes (H, W, K^2)
weight planes and the aggregated output volume in HBM); the fused Pallas
kernel in ``ops/pallas`` shares its exact semantics and keeps everything in
VMEM.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..config import StereoConfig
from . import cost as cost_ops
from . import preprocess


def _patches_2d(arr: jnp.ndarray, radius: int, x_valid: bool = False) -> jnp.ndarray:
    """All (2r+1)^2 window taps of a 2D array.

    y: edge-replicate padding.  x: edge-replicate padding, or — when
    ``x_valid`` — the array is already x-extended by ``radius`` per side and
    taps slide VALID (output width = arr width - 2*radius).

    Returns (H, W_out, O) with offsets in row-major (wy, wx) order, matching
    the NumPy oracle's window loops.  Explicit static slices, NOT
    conv_general_dilated_patches: the conv lowering computes in reduced
    precision on some backends, which breaks bit-parity with the oracle.
    """
    k = 2 * radius + 1
    h, w_in = arr.shape
    if x_valid:
        pad = jnp.pad(arr, ((radius, radius), (0, 0)), mode="edge")
        w_out = w_in - 2 * radius
    else:
        pad = jnp.pad(arr, ((radius, radius), (radius, radius)), mode="edge")
        w_out = w_in
    taps = [
        pad[wy : wy + h, wx : wx + w_out] for wy in range(k) for wx in range(k)
    ]
    return jnp.stack(taps, axis=-1)  # (H, W_out, O)


def _spatial_weights(cfg: StereoConfig) -> np.ndarray:
    r = cfg.window_radius
    wy, wx = np.mgrid[-r : r + 1, -r : r + 1]
    dist = np.sqrt((wy**2 + wx**2).astype(np.float64))
    return np.exp(-dist / cfg.gamma_spatial).astype(np.float32).reshape(-1)


def bilateral_planes_from_lab(lab_ext: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """Per-center ASW weight planes w(p, p+o) from a pre-extended Lab image.

    lab_ext: (H, We + 2r, 3) covering [centers - r, centers + r]; extended
    columns may be real neighbor data (x-tiling) or edge replicas (the
    virtual padded plane) — identical math either way.  Returns (H, We, O).
    """
    r = cfg.window_radius
    we = lab_ext.shape[-2]
    d2 = None
    for c in range(3):
        p = _patches_2d(lab_ext[..., c], r, x_valid=True)
        diff = p - lab_ext[..., r : we - r, c : c + 1]  # ([r:-r] breaks at r=0)
        d2 = diff * diff if d2 is None else d2 + diff * diff
    dcolor = jnp.sqrt(d2)
    sw = jnp.asarray(_spatial_weights(cfg))
    return (jnp.exp(-dcolor / cfg.gamma_color) * sw).astype(jnp.float32)


def _bilateral_planes(
    img: jnp.ndarray, cfg: StereoConfig, x_pad_left: int = 0, x_pad_right: int = 0
) -> jnp.ndarray:
    """Weight planes for centers on [-x_pad_left, W-1+x_pad_right], taps on
    the edge-padded virtual plane.  Returns (H, W + xl + xr, O)."""
    r = cfg.window_radius
    imgp = cost_ops._pad_x(img, x_pad_left + r, x_pad_right + r)
    return bilateral_planes_from_lab(preprocess.rgb_to_lab(imgp), cfg)


def aggregate_box(vol_ext: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """Mean over the (2r+1)^2 window.  vol_ext: x-extended (H, W+2r, D)."""
    r = cfg.window_radius
    if r == 0:
        return vol_ext
    k = 2 * r + 1
    pad = jnp.pad(vol_ext, ((r, r), (0, 0), (0, 0)), mode="edge")
    summed = lax.reduce_window(pad, 0.0, lax.add, (k, k, 1), (1, 1, 1), "VALID")
    return (summed / float(k * k)).astype(jnp.float32)


def cost_volume_from_stacks(
    l_stack_ext: jnp.ndarray,
    r_stack_ext: jnp.ndarray,
    cfg: StereoConfig,
) -> jnp.ndarray:
    """x-extended raw cost volume (H, W + 2r, D) from pre-extended stacks —
    the box-aggregation input for the x-tiled path."""
    r = cfg.window_radius
    planes = cost_ops.planes_from_stacks(l_stack_ext, r_stack_ext, r)

    def step(_, d):
        return None, cost_ops.cost_plane(planes, d, cfg)

    _, out = lax.scan(step, None, jnp.arange(cfg.max_disparity))
    return jnp.moveaxis(out, 0, -1)


def aggregate_asw_from_stacks(
    l_stack_ext: jnp.ndarray,
    r_stack_ext: jnp.ndarray,
    cfg: StereoConfig,
    d_indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ASW-aggregated cost volume from pre-extended channel stacks.

    l_stack_ext: (7, H, W + 2r); r_stack_ext: (7, H, W + 2r + D - 1) —
    preprocess.channel_stack layout, columns extended per the pinned
    padded-plane semantics (edge replicas for a whole image; real neighbor
    columns for an x-tile — same math either way, which is exactly why the
    padded-plane spec was chosen).  Returns (H, W, len(d_indices)).
    """
    r = cfg.window_radius
    D = cfg.max_disparity
    h = l_stack_ext.shape[1]
    w = l_stack_ext.shape[2] - 2 * r

    planes = cost_ops.planes_from_stacks(l_stack_ext, r_stack_ext, r)
    lab_l = jnp.moveaxis(l_stack_ext[4:7], 0, -1)
    wl = bilateral_planes_from_lab(lab_l, cfg)  # (H, W, O)
    if cfg.asw_symmetric:
        # Right-weight planes on centers x' in [-(D-1), W-1]; step d slices
        # the window starting at (D-1) - d.
        lab_r = jnp.moveaxis(r_stack_ext[4:7], 0, -1)
        wr = bilateral_planes_from_lab(lab_r, cfg)  # (H, W + D - 1, O)
    else:
        wr = None
    O = wl.shape[-1]

    def step(_, d):
        plane = cost_ops.cost_plane(planes, d, cfg)  # (H, W + 2r)
        taps = _patches_2d(plane, r, x_valid=True)  # (H, W, O)
        if wr is not None:
            wr_d = lax.dynamic_slice(wr, (0, (D - 1) - d, 0), (h, w, O))
            wgt = wl * wr_d
        else:
            wgt = wl
        num = jnp.sum(wgt * taps, axis=-1)
        den = jnp.sum(wgt, axis=-1)
        return None, (num / den).astype(jnp.float32)

    if d_indices is None:
        d_indices = jnp.arange(D)
    _, out = lax.scan(step, None, d_indices)
    return jnp.moveaxis(out, 0, -1)  # (H, W, len(d_indices))


def aggregate_asw(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoConfig,
    d_indices: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ASW-aggregated cost volume for a full pair, fused cost construction.

    Edge-pads the channel stacks to the virtual padded planes and defers to
    ``aggregate_asw_from_stacks``.  Matches the oracle's
    aggregate_asw(cost_volume_ext(...)) composition.
    """
    r = cfg.window_radius
    D = cfg.max_disparity

    def pad(stack, pl_, pr_):
        return jnp.pad(stack, ((0, 0), (0, 0), (pl_, pr_)), mode="edge")

    ls = preprocess.channel_stack(left)
    rs = preprocess.channel_stack(right)
    return aggregate_asw_from_stacks(
        pad(ls, r, r), pad(rs, r + D - 1, r), cfg, d_indices
    )
