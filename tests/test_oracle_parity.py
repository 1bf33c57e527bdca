"""Stage-by-stage parity: vectorized JAX ops vs the literal NumPy oracle.

The oracle (models/oracle_numpy.py) is the in-repo golden (SURVEY.md section
4.1); every jnp stage must match it to f32 tolerance on small images, and the
integer/argmin stages must match exactly.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.models import oracle_numpy as oracle
from aswstereomatch_tpu.models import pipeline
from aswstereomatch_tpu.ops import aggregate, cost, postprocess, preprocess, wta

def J(fn, **static):
    """Jit with config bound statically — eager dispatch is pathologically slow
    in this environment, so every jnp-path call in tests goes through jit."""
    return jax.jit(functools.partial(fn, **static))


CFG_AD = StereoConfig(max_disparity=12, cost="ad", aggregation="box", window_radius=3,
                      lr_check=False, fill_holes=False, subpixel=False, median_filter=False)
CFG_TAD = StereoConfig(max_disparity=12, cost="tad_grad", aggregation="asw",
                       window_radius=4, gamma_color=14.0, gamma_spatial=9.0)
CFG_ASW_LEFT = CFG_TAD.replace(asw_symmetric=False)


def test_gradient_matches_oracle(small_pair):
    g_o = oracle.gray_and_grad(small_pair["left"])[1]
    g_j = J(lambda im: preprocess.x_gradient(preprocess.rgb_to_gray(im)))(jnp.asarray(small_pair["left"]))
    np.testing.assert_allclose(np.asarray(g_j), g_o, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("cfg", [CFG_AD, CFG_TAD], ids=["ad", "tad_grad"])
def test_cost_volume_matches_oracle(small_pair, cfg):
    v_o = oracle.cost_volume(small_pair["left"], small_pair["right"], cfg)
    v_j = J(cost.cost_volume, cfg=cfg)(
        jnp.asarray(small_pair["left"]), jnp.asarray(small_pair["right"])
    )
    np.testing.assert_allclose(np.asarray(v_j), v_o, rtol=1e-5, atol=1e-3)


def test_box_aggregation_matches_oracle(small_pair):
    v = oracle.cost_volume_ext(
        small_pair["left"], small_pair["right"], CFG_AD, CFG_AD.window_radius
    )
    a_o = oracle.aggregate_box(v, CFG_AD)
    a_j = J(aggregate.aggregate_box, cfg=CFG_AD)(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(a_j), a_o, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize(
    "cfg", [CFG_TAD, CFG_ASW_LEFT], ids=["symmetric", "left_only"]
)
def test_asw_aggregation_matches_oracle(small_pair, cfg):
    left, right = small_pair["left"], small_pair["right"]
    v = oracle.cost_volume_ext(left, right, cfg, cfg.window_radius)
    a_o = oracle.aggregate_asw(v, left, right, cfg)
    a_j = J(aggregate.aggregate_asw, cfg=cfg)(jnp.asarray(left), jnp.asarray(right))
    np.testing.assert_allclose(np.asarray(a_j), a_o, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize(
    "cfg",
    [CFG_TAD.replace(asw_separable=True),
     CFG_ASW_LEFT.replace(asw_separable=True)],
    ids=["symmetric", "left_only"],
)
def test_asw_separable_matches_oracle(small_pair, cfg):
    """The two-pass speed mode against ITS OWN literal-loop spec (it is an
    approximation of exact ASW, so exact-ASW parity would be wrong here)."""
    left, right = small_pair["left"], small_pair["right"]
    v = oracle.cost_volume_ext(left, right, cfg, cfg.window_radius)
    a_o = oracle.aggregate_asw_separable(v, left, right, cfg)
    a_j = J(aggregate.aggregate_asw, cfg=cfg)(jnp.asarray(left), jnp.asarray(right))
    np.testing.assert_allclose(np.asarray(a_j), a_o, rtol=2e-4, atol=2e-3)


def test_wta_subpixel_match_oracle(small_pair):
    v = oracle.cost_volume(small_pair["left"], small_pair["right"], CFG_TAD)
    d_o = oracle.wta(v)
    d_j = J(wta.wta)(jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(d_j), d_o)
    s_o = oracle.subpixel(v, d_o)
    s_j = J(wta.subpixel)(jnp.asarray(v), d_j)
    np.testing.assert_allclose(np.asarray(s_j), s_o, rtol=1e-5, atol=1e-4)


def test_right_volume_and_lr_match_oracle(small_pair):
    cfg = CFG_TAD
    v = oracle.cost_volume(small_pair["left"], small_pair["right"], cfg)
    vr_o = oracle.right_volume(v)
    vr_j = J(postprocess.right_volume)(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(vr_j), vr_o, rtol=1e-6, atol=1e-5)
    dl = oracle.wta(v).astype(np.float32)
    dr = oracle.wta(vr_o).astype(np.float32)
    m_o = oracle.lr_check(dl, dr, cfg)
    m_j = J(postprocess.lr_check, cfg=cfg)(jnp.asarray(dl), jnp.asarray(dr))
    np.testing.assert_array_equal(np.asarray(m_j), m_o)


def test_fill_and_median_match_oracle(small_pair):
    rng = np.random.default_rng(0)
    disp = rng.uniform(0, 12, size=(17, 23)).astype(np.float32)
    valid = rng.random((17, 23)) > 0.35
    valid[3] = False  # a fully-invalid row exercises the 0-fill path
    f_o = oracle.fill_holes(disp, valid)
    f_j = J(postprocess.fill_holes)(jnp.asarray(disp), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(f_j), f_o, rtol=1e-6, atol=1e-6)
    m_o = oracle.median3(f_o)
    m_j = J(postprocess.median3)(jnp.asarray(f_o))
    np.testing.assert_allclose(np.asarray(m_j), m_o, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "cfg",
    [
        CFG_AD,
        CFG_TAD,
        CFG_TAD.replace(lr_check=False, fill_holes=False),
        CFG_TAD.replace(subpixel=False, median_filter=False),
        CFG_TAD.replace(aggregation="none"),
        CFG_TAD.replace(asw_separable=True),
    ],
    ids=["ad_box", "asw_full", "asw_nopost", "asw_nosubpix", "none_agg",
         "asw_separable"],
)
def test_full_pipeline_matches_oracle(small_pair, cfg):
    left, right = small_pair["left"], small_pair["right"]
    d_o = oracle.match_pair(left, right, cfg)
    d_j = np.asarray(J(pipeline.match_pair, cfg=cfg)(jnp.asarray(left), jnp.asarray(right)))
    # Aggregated costs differ at f32 rounding level between the two
    # implementations, which can flip a WTA winner on near-ties; demand
    # near-universal agreement and tiny bad-delta instead of bit equality.
    agree = np.mean(np.abs(d_j - d_o) <= 0.51)
    assert agree > 0.995, f"pipeline disagreement: {1 - agree:.4%}"
    bad2 = np.mean(np.abs(d_j - d_o) > 2.0)
    assert bad2 < 0.002, f"bad-2.0 vs oracle: {bad2:.4%}"


def test_weighted_median_matches_oracle(small_pair):
    from aswstereomatch_tpu.ops import postprocess, preprocess

    cfg = CFG_TAD.replace(median_mode="weighted")
    rng = np.random.default_rng(4)
    disp = np.round(rng.uniform(0, 12, (19, 21)) * 2) / 2  # half-pixel grid
    disp = disp.astype(np.float32)
    left = small_pair["left"][:19, :21]
    w_o = oracle.weighted_median3(disp, left, cfg)
    guide = J(preprocess.rgb_to_lab)(jnp.asarray(left))
    w_j = np.asarray(
        J(postprocess.weighted_median3, cfg=cfg)(jnp.asarray(disp), guide)
    )
    assert (w_j == w_o).mean() > 0.995  # f32-vs-f64 cumsum can flip rare ties


def test_full_pipeline_weighted_median(small_pair):
    cfg = CFG_TAD.replace(median_mode="weighted")
    left, right = small_pair["left"], small_pair["right"]
    d_o = oracle.match_pair(left, right, cfg)
    d_j = np.asarray(J(pipeline.match_pair, cfg=cfg)(jnp.asarray(left), jnp.asarray(right)))
    agree = np.mean(np.abs(d_j - d_o) <= 0.51)
    assert agree > 0.99, f"disagreement {1 - agree:.4%}"


@pytest.mark.parametrize("seed", range(4))
def test_pipeline_fuzz_random_configs_vs_oracle(seed):
    """Random tiny configs: jnp pipeline tracks the loop oracle end to end."""
    rng = np.random.default_rng(200 + seed)
    cfg = StereoConfig(
        max_disparity=int(rng.choice([4, 8])),
        window_radius=int(rng.choice([1, 2, 3])),
        cost=str(rng.choice(["ad", "tad_grad"])),
        aggregation=str(rng.choice(["box", "asw", "none"])),
        asw_symmetric=bool(rng.choice([True, False])),
        gamma_color=float(rng.uniform(6, 25)),
        gamma_spatial=float(rng.uniform(6, 35)),
        alpha=float(rng.uniform(0.5, 1.0)),
        lr_tol=float(rng.choice([0.5, 1.0, 2.0])),
        lr_check=bool(rng.choice([True, False])),
        fill_holes=True,
        subpixel=bool(rng.choice([True, False])),
        median_filter=bool(rng.choice([True, False])),
        median_mode=str(rng.choice(["plain", "weighted"])),
    )
    from aswstereomatch_tpu.utils import synthetic as synth

    h = int(rng.integers(14, 28))
    w = int(rng.integers(24, 44))
    pair = synth.make_pair(height=h, width=w,
                           max_disparity=cfg.max_disparity, seed=seed)
    d_o = oracle.match_pair(pair["left"], pair["right"], cfg)
    d_j = np.asarray(
        J(pipeline.match_pair, cfg=cfg)(
            jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        )
    )
    agree = np.mean(np.abs(d_j - d_o) <= 0.51)
    assert agree > 0.98, f"seed {seed} cfg {cfg.config_hash()}: {1-agree:.3%}"
