"""Pinned accuracy-regression thresholds on the adversarial synthetic regime.

Round 1's layered scenes were too easy (bad-2.0 <= 0.4% everywhere) to catch
accuracy regressions from performance work (bf16 operand storage, left-only
fast paths, kernel restructurings).  ``synthetic.make_hard_pair`` adds
textureless patches, per-view sensor noise, fractional disparities, and a
brightness/contrast mismatch between views; measured error rates there are
1.6-8.6% bad-2.0 — real signal.  Thresholds pin the measured round-2 values
with ~1.4x headroom: a perf change that degrades matching quality trips them.

(SURVEY.md section 4.6 property tests; VERDICT round-1 item 8.)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.models import pipeline
from aswstereomatch_tpu.utils import evaluate, synthetic

CFG = StereoConfig(
    max_disparity=24, cost="tad_grad", aggregation="asw", window_radius=8,
    lr_check=True, fill_holes=True, subpixel=True, median_filter=True,
    backend="jnp",
)

# (mode, cfg, per-seed {seed: (bad2_max, epe_max)}); measured round 2:
#   sym      b2 = 1.60 / 4.70 / 1.83 %,  epe = 0.19 / 0.44 / 0.27
#   leftonly b2 = 2.41 / 6.75 / 2.64 %,  epe = 0.27 / 0.73 / 0.37
#   box      b2 = 4.91 / 8.55 / 4.96 %,  epe = 0.51 / 0.92 / 0.57
CASES = [
    ("sym", CFG, {0: (0.023, 0.28), 1: (0.066, 0.62), 2: (0.026, 0.38)}),
    (
        "leftonly",
        CFG.replace(asw_symmetric=False),
        {0: (0.034, 0.39), 1: (0.095, 1.03), 2: (0.037, 0.52)},
    ),
    (
        "box",
        CFG.replace(aggregation="box"),
        {0: (0.069, 0.72), 1: (0.120, 1.30), 2: (0.070, 0.80)},
    ),
    # Two-pass separable approximation (asw_separable): measured round 2
    #   sepsym b2 = 1.68 / 4.57 / 1.87 %, epe = 0.18 / 0.39 / 0.28 —
    #   within noise of exact sym (1.60 / 4.70 / 1.83); the approximation
    #   must KEEP tracking exact, hence same-headroom pins.
    (
        "sepsym",
        CFG.replace(asw_separable=True),
        {0: (0.024, 0.26), 1: (0.064, 0.55), 2: (0.027, 0.39)},
    ),
    (
        "seplo",
        CFG.replace(asw_separable=True, asw_symmetric=False),
        {0: (0.027, 0.30), 1: (0.087, 0.93), 2: (0.032, 0.45)},
    ),
]


def _run(cfg, pair):
    disp = jax.jit(functools.partial(pipeline.match_pair, cfg=cfg))(
        jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    )
    nonocc = ~pair["occluded"]
    disp = np.asarray(disp)
    return (
        evaluate.bad_delta(disp, pair["gt"], 2.0, nonocc),
        float(np.abs(disp - pair["gt"])[nonocc].mean()),
    )


@pytest.mark.parametrize("mode,cfg,bounds", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("seed", [0, 1])
def test_hard_scene_accuracy_pinned(mode, cfg, bounds, seed):
    pair = synthetic.make_hard_pair(96, 160, 24, seed=seed)
    bad2, epe = _run(cfg, pair)
    bad2_max, epe_max = bounds[seed]
    assert bad2 <= bad2_max, f"{mode} seed{seed}: bad-2.0 {bad2:.4f} > {bad2_max}"
    assert epe <= epe_max, f"{mode} seed{seed}: EPE {epe:.3f} > {epe_max}"


def test_symmetric_beats_left_only_on_hard_scene():
    """Ordering invariant (BASELINE.md symmetric-vs-left-only table): the
    accuracy argument for the symmetric default must keep holding in the
    hard regime."""
    pair = synthetic.make_hard_pair(96, 160, 24, seed=1)
    bad2_sym, _ = _run(CFG, pair)
    bad2_lo, _ = _run(CFG.replace(asw_symmetric=False), pair)
    assert bad2_sym < bad2_lo


def test_slanted_plane_subpixel_quality():
    """Slanted-plane EPE is dominated by subpixel interpolation quality;
    measured ~0.11 px (round 2).  A parabola-refinement or triple-capture
    regression shows up here first."""
    pair = synthetic.make_slanted_pair(96, 160, 24, seed=0)
    disp = np.asarray(
        jax.jit(functools.partial(pipeline.match_pair, cfg=CFG))(
            jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        )
    )
    epe = float(np.abs(disp - pair["gt"]).mean())
    bad1 = evaluate.bad_delta(disp, pair["gt"], 1.0, None)
    assert epe <= 0.16, f"slanted EPE {epe:.3f}"
    assert bad1 <= 0.005, f"slanted bad-1.0 {bad1:.4f}"
