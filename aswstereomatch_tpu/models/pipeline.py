"""End-to-end stereo matching pipeline (SURVEY.md section 3.5 target shape).

``match_pair(left, right, cfg)`` is the jittable forward step on one pair:
images -> cost (fused into aggregation) -> WTA -> subpixel -> LR check ->
fill -> median -> float32 disparity map.  It composes the stage ops from
``aswstereomatch_tpu.ops`` and mirrors the NumPy oracle
(models/oracle_numpy.py) stage for stage.

Backends:
  - "jnp":    pure jax.numpy stages (this file) — correct everywhere, the
              oracle for kernel work; fine on CPU/TPU.
  - "pallas": fused Pallas TPU kernel for cost+ASW+WTA (ops/pallas) with the
              jnp post-processing stages on top.
  - "auto":   pallas when the config and platform support it, else jnp.

``StereoMatcher`` wraps a config with cached jitted single/batch entry points
— the "model" object of this framework; the five BASELINE presets in
config.PRESETS are its model zoo.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import StereoConfig, get_preset
from ..ops import aggregate, cost, postprocess, wta


def aggregated_volume(
    left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig
) -> jnp.ndarray:
    """(H, W, D) aggregated cost volume per the configured cost/aggregation."""
    if cfg.aggregation == "asw":
        return aggregate.aggregate_asw(left, right, cfg)
    vol = cost.cost_volume(left, right, cfg)
    if cfg.aggregation == "box":
        vol = aggregate.aggregate_box(vol, cfg)
    return vol


def _postprocess_from_volume(vol: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """WTA + subpixel + LR + fill + median from an aggregated volume."""
    disp_i = wta.wta(vol)
    disp = (
        wta.subpixel(vol, disp_i) if cfg.subpixel else disp_i.astype(jnp.float32)
    )
    if cfg.lr_check:
        vol_r = postprocess.right_volume(vol)
        disp_r_i = wta.wta(vol_r)
        valid = postprocess.lr_check(
            disp_i.astype(jnp.float32), disp_r_i.astype(jnp.float32), cfg
        )
        if cfg.fill_holes:
            disp = postprocess.fill_holes(disp, valid)
        else:
            disp = jnp.where(valid, disp, -1.0).astype(jnp.float32)
    if cfg.median_filter:
        disp = postprocess.median3(disp)
    return disp.astype(jnp.float32)


def _resolve_backend(cfg: StereoConfig) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    from ..ops.pallas import asw_kernel  # local import: optional path

    if asw_kernel.supports(cfg):
        return "pallas"
    return "jnp"


def match_pair(
    left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig
) -> jnp.ndarray:
    """Match one rectified pair -> float32 (H, W) disparity.  Jit-friendly."""
    backend = _resolve_backend(cfg)
    if backend == "pallas":
        from ..ops.pallas import asw_kernel

        vol = asw_kernel.aggregated_volume(left, right, cfg)
    else:
        vol = aggregated_volume(left, right, cfg)
    return _postprocess_from_volume(vol, cfg)


def match_batch(left: jnp.ndarray, right: jnp.ndarray, cfg: StereoConfig) -> jnp.ndarray:
    """Batched throughput mode: (B, H, W, 3) x2 -> (B, H, W)."""
    return jax.vmap(lambda l, r: match_pair(l, r, cfg))(left, right)


class StereoMatcher:
    """A configured matcher with cached jitted entry points.

    >>> m = StereoMatcher.from_preset("middlebury_asw")
    >>> disp = m(left, right)             # single pair
    >>> disps = m.batch(lefts, rights)    # batched
    """

    def __init__(self, cfg: StereoConfig):
        self.cfg = cfg
        self._match = jax.jit(functools.partial(match_pair, cfg=cfg))
        self._match_batch = jax.jit(functools.partial(match_batch, cfg=cfg))

    @classmethod
    def from_preset(cls, name: str, **overrides) -> "StereoMatcher":
        cfg = get_preset(name)
        if overrides:
            cfg = cfg.replace(**overrides)
        return cls(cfg)

    def __call__(self, left, right):
        return self._match(jnp.asarray(left), jnp.asarray(right))

    def batch(self, lefts, rights):
        return self._match_batch(jnp.asarray(lefts), jnp.asarray(rights))
