"""Fused Pallas ASW kernel vs the jnp reference path (SURVEY.md section 4.2).

Runs in interpret mode on CPU (tests/conftest.py forces the cpu backend, so
``asw_kernel._interpret()`` is true).  Checks the kernel's online-WTA outputs
(left argmin + parabola triple, right-view argmin incl. the cross-tile
combine) against the materialized jnp aggregated volume, and the full
pipeline end-to-end for both weight modes and both costs.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.models import pipeline
from aswstereomatch_tpu.ops import postprocess
from aswstereomatch_tpu.ops.pallas import asw_kernel
from aswstereomatch_tpu.utils import synthetic


def J(fn, **static):
    return jax.jit(functools.partial(fn, **static))


CFG = StereoConfig(
    max_disparity=8, cost="tad_grad", aggregation="asw", window_radius=2,
    gamma_color=14.0, gamma_spatial=9.0,
)


@pytest.mark.parametrize(
    "cfg,shape",
    [
        (CFG, (24, 40)),
        (CFG.replace(asw_symmetric=False), (24, 40)),
        (CFG.replace(cost="ad"), (24, 40)),
        # width > TILE_X: exercises multiple x-tiles and the right-view
        # cross-tile combine (D=8 keeps interpret-mode time sane)
        (CFG, (16, 200)),
    ],
    ids=["symmetric", "left_only", "ad_cost", "multi_xtile"],
)
def test_kernel_outputs_match_jnp_volume(cfg, shape):
    h, w = shape
    pair = synthetic.make_pair(height=h, width=w, max_disparity=cfg.max_disparity, seed=3)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])

    outs = J(asw_kernel.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))

    bd_ref = np.argmin(vol, -1)
    np.testing.assert_array_equal(np.asarray(outs["bestd"]), bd_ref)
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-5, atol=1e-4
    )
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    np.testing.assert_array_equal(np.asarray(outs["rbestd"]), np.argmin(volr, -1))

    D = cfg.max_disparity
    cm_ref = np.take_along_axis(vol, (bd_ref - 1).clip(0)[..., None], -1)[..., 0]
    cp_ref = np.take_along_axis(vol, (bd_ref + 1).clip(0, D - 1)[..., None], -1)[..., 0]
    mask = (bd_ref > 0) & (bd_ref < D - 1)
    np.testing.assert_allclose(
        np.asarray(outs["cm"])[mask], cm_ref[mask], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["cp"])[mask], cp_ref[mask], rtol=1e-5, atol=1e-4
    )


def test_pipeline_pallas_matches_jnp_end_to_end():
    cfg = CFG.replace(
        backend="pallas", lr_check=True, fill_holes=True, subpixel=True,
        median_filter=True,
    )
    pair = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=5)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    d_pal = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    d_jnp = np.asarray(J(pipeline.match_pair, cfg=cfg.replace(backend="jnp"))(l, r))
    # Reduction orders differ (sequential window loop vs tree-sum), so f32
    # near-ties may flip; demand near-universal agreement.
    agree = np.mean(np.abs(d_pal - d_jnp) <= 0.51)
    assert agree > 0.99, f"disagreement {1 - agree:.4%}"
    assert np.mean(np.abs(d_pal - d_jnp) > 2.0) < 0.005


def test_kernel_rejects_unsupported():
    cfg = CFG.replace(aggregation="none")
    assert not asw_kernel.supports(cfg)
    with pytest.raises(ValueError):
        asw_kernel.wta_outputs(jnp.zeros((8, 8, 3)), jnp.zeros((8, 8, 3)), cfg)


def test_pallas_tiled_equals_pallas_untiled_exactly():
    """Sharded tiling routed through the fused kernel stays bit-exact."""
    from aswstereomatch_tpu.parallel import mesh as mesh_lib
    from aswstereomatch_tpu.parallel import tiling

    cfg = CFG.replace(
        backend="pallas", window_radius=2, lr_check=True, fill_holes=True,
        subpixel=True, median_filter=True,
    )
    pair = synthetic.make_pair(height=48, width=40, max_disparity=8, seed=8)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    ref = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    m = mesh_lib.build_mesh(data=1, tile=4)
    out = np.asarray(J(tiling.match_pair_tiled, cfg=cfg, device_mesh=m)(l, r))
    np.testing.assert_array_equal(out, ref)


def test_pallas_chunked_equals_unchunked_exactly():
    cfg = CFG.replace(
        backend="pallas", window_radius=2, lr_check=True, fill_holes=True,
        subpixel=True, median_filter=True,
    )
    pair = synthetic.make_pair(height=48, width=40, max_disparity=8, seed=9)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    ref = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    out = np.asarray(J(pipeline.match_pair, cfg=cfg.replace(y_chunks=3))(l, r))
    np.testing.assert_array_equal(out, ref)


def test_pallas_batch_matches_single():
    cfg = CFG.replace(backend="pallas", lr_check=True, fill_holes=True,
                      subpixel=True, median_filter=True)
    p1 = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=1)
    p2 = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=2)
    lb = jnp.stack([jnp.asarray(p1["left"]), jnp.asarray(p2["left"])])
    rb = jnp.stack([jnp.asarray(p1["right"]), jnp.asarray(p2["right"])])
    outs = np.asarray(J(pipeline.match_batch, cfg=cfg)(lb, rb))
    for i, p in enumerate((p1, p2)):
        ref = np.asarray(
            J(pipeline.match_pair, cfg=cfg)(
                jnp.asarray(p["left"]), jnp.asarray(p["right"])
            )
        )
        np.testing.assert_allclose(outs[i], ref, atol=1e-4)


@pytest.mark.parametrize(
    "r,D,shape",
    [
        (0, 2, (13, 24)),   # degenerate window, odd height
        (1, 4, (11, 40)),   # minimal real window
        (2, 8, (8, 128)),   # exactly one tile
    ],
    ids=["r0_d2", "r1_d4", "one_tile"],
)
def test_kernel_edge_geometries(r, D, shape):
    cfg = CFG.replace(max_disparity=D, window_radius=r)
    h, w = shape
    pair = synthetic.make_pair(height=h, width=w, max_disparity=D, seed=6,
                               num_layers=1)
    l, rr = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    outs = J(asw_kernel.wta_outputs, cfg=cfg)(l, rr)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, rr))
    np.testing.assert_array_equal(np.asarray(outs["bestd"]), np.argmin(vol, -1))
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    np.testing.assert_array_equal(np.asarray(outs["rbestd"]), np.argmin(volr, -1))


@pytest.mark.parametrize("cost_kind", ["ad", "tad_grad"])
def test_box_kernel_matches_jnp_volume(cost_kind):
    cfg = CFG.replace(aggregation="box", cost=cost_kind, window_radius=3)
    pair = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=12)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    outs = J(asw_kernel.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    bd_ref = np.argmin(vol, -1)
    assert (np.asarray(outs["bestd"]) == bd_ref).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-4, atol=1e-3
    )
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    assert (np.asarray(outs["rbestd"]) == np.argmin(volr, -1)).mean() > 0.999


def test_box_pipeline_pallas_matches_jnp():
    cfg = CFG.replace(
        aggregation="box", window_radius=3, backend="pallas",
        lr_check=True, fill_holes=True, subpixel=True, median_filter=True,
    )
    pair = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=13)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    d_pal = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    d_jnp = np.asarray(J(pipeline.match_pair, cfg=cfg.replace(backend="jnp"))(l, r))
    assert np.mean(np.abs(d_pal - d_jnp) <= 0.51) > 0.99


@pytest.mark.parametrize("seed", range(8))
def test_kernel_fuzz_random_configs(seed):
    """Random small configs: kernel argmin must track the jnp volume."""
    rng = np.random.default_rng(100 + seed)
    cfg = CFG.replace(
        max_disparity=int(rng.choice([4, 8, 12])),
        window_radius=int(rng.choice([1, 2, 3])),
        cost=str(rng.choice(["ad", "tad_grad"])),
        asw_symmetric=bool(rng.choice([True, False])),
        aggregation=str(rng.choice(["asw", "box"])),
        gamma_color=float(rng.uniform(5, 30)),
        gamma_spatial=float(rng.uniform(5, 40)),
        alpha=float(rng.uniform(0.5, 1.0)),
    )
    h = int(rng.integers(10, 30))
    w = int(rng.integers(20, 60))
    pair = synthetic.make_pair(height=h, width=w,
                               max_disparity=cfg.max_disparity, seed=seed)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    outs = J(asw_kernel.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    assert (np.asarray(outs["bestd"]) == np.argmin(vol, -1)).mean() > 0.999
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    assert (np.asarray(outs["rbestd"]) == np.argmin(volr, -1)).mean() > 0.999


def test_pallas_xtiled_equals_pallas_untiled_exactly():
    """x-tiling routed through the fused kernel (stacks entry + strip
    export) stays bit-exact vs the untiled pallas pipeline."""
    from aswstereomatch_tpu.parallel import mesh as mesh_lib
    from aswstereomatch_tpu.parallel import tiling

    cfg = CFG.replace(
        backend="pallas", lr_check=True, fill_holes=True,
        subpixel=True, median_filter=True,
    )
    # includes a non-divisible width (alignment-pad masking via the SMEM
    # n_valid scalar)
    for wdt in (64, 61):
        pair = synthetic.make_pair(height=24, width=wdt, max_disparity=8, seed=8)
        l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        ref = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
        m = mesh_lib.build_mesh(data=1, tile=2)
        out = np.asarray(
            J(tiling.match_pair_tiled_x, cfg=cfg, device_mesh=m)(l, r)
        )
        np.testing.assert_array_equal(out, ref)


def test_pallas_dsharded_equals_pallas_unsharded_exactly():
    """Disparity sharding through the fused kernel (d-window + slab-shifted
    right stacks) is bit-exact vs the unsharded pallas pipeline."""
    from aswstereomatch_tpu.parallel import dshard
    from aswstereomatch_tpu.parallel import mesh as mesh_lib

    cfg = CFG.replace(
        backend="pallas", max_disparity=16, lr_check=True, fill_holes=True,
        subpixel=True, median_filter=True,
    )
    pair = synthetic.make_pair(height=24, width=40, max_disparity=16, seed=4)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    ref = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    m = mesh_lib.build_mesh(data=1, tile=4)
    out = np.asarray(
        J(dshard.match_pair_dsharded, cfg=cfg, device_mesh=m)(l, r)
    )
    np.testing.assert_array_equal(out, ref)


def test_pallas_dsharded_box_exact_and_jnp_box_guarded():
    from aswstereomatch_tpu.parallel import dshard
    from aswstereomatch_tpu.parallel import mesh as mesh_lib

    m = mesh_lib.build_mesh(data=1, tile=4)
    pair = synthetic.make_pair(height=24, width=40, max_disparity=16, seed=4)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    cfg = CFG.replace(
        max_disparity=16, aggregation="box", backend="pallas",
        lr_check=True, fill_holes=True, subpixel=True, median_filter=True,
    )
    # At D=16 auto already resolves box to x-lanes (the d-lanes crossover
    # is D > 64), so dsharded == unsharded-auto holds directly here; the
    # xlanes pin documents the layout-resolution contract and is exercised
    # for real by the D=128 case below.
    ref = np.asarray(
        J(pipeline.match_pair, cfg=cfg.replace(kernel_layout="xlanes"))(l, r)
    )
    out = np.asarray(
        J(dshard.match_pair_dsharded, cfg=cfg, device_mesh=m)(l, r)
    )
    np.testing.assert_array_equal(out, ref)
    # D=128: unsharded auto routes box to the d-lanes big-dot kernel while
    # the d-sharded path drives the x-lanes kernel per slab — the pinned
    # bit-exact reference is therefore kernel_layout="xlanes" (the
    # layout-resolution contract, PARITY.md).
    pair128 = synthetic.make_pair(height=16, width=160, max_disparity=128,
                                  seed=6)
    l1, r1 = jnp.asarray(pair128["left"]), jnp.asarray(pair128["right"])
    cfg128 = cfg.replace(max_disparity=128, window_radius=2)
    from aswstereomatch_tpu.ops.pallas import asw_dlanes

    assert asw_dlanes.routed(cfg128)  # auto really is d-lanes unsharded
    ref128 = np.asarray(
        J(pipeline.match_pair, cfg=cfg128.replace(kernel_layout="xlanes"))(
            l1, r1
        )
    )
    out128 = np.asarray(
        J(dshard.match_pair_dsharded, cfg=cfg128, device_mesh=m)(l1, r1)
    )
    np.testing.assert_array_equal(out128, ref128)
    # the jnp path only implements ASW slabs — box must be rejected loudly
    with pytest.raises(ValueError, match="disparity sharding"):
        dshard.match_pair_dsharded(l, r, cfg.replace(backend="jnp"), m)


def test_tile_x_model_choices():
    """The adaptive tile-width model (docs/PERF_NOTES.md ablation study)
    must pick the measured-fastest TX for the dataset geometries: wide
    images amortize the ru128(TX+D-1)/TX shuffle amplification (KITTI
    measured -15.3% at TX=256), narrow ones avoid padding waste."""
    assert asw_kernel._tile_x(1242, 128) == 256  # KITTI
    assert asw_kernel._tile_x(450, 64) == 256    # Venus/Teddy/Cones
    assert asw_kernel._tile_x(384, 16) == 128    # Tsukuba: 256 would pad 33%
    # TY complements TX so each vector op still covers 4 full vregs
    assert asw_kernel._tile_y(375, 256) == 16
    assert asw_kernel._tile_y(375, 128) == 32
    assert asw_kernel._tile_y(12, 256) == 8      # short images: f32 min tile
