"""Disparity-in-lanes fused kernel (left-only fast path) vs the jnp oracle.

Interpret mode on CPU (tests/conftest.py), mirroring test_pallas_kernel.py:
WTA outputs against the materialized aggregated volume, end-to-end pipeline
agreement, routing rules, and the tiled==untiled invariant.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.models import pipeline
from aswstereomatch_tpu.ops import postprocess
from aswstereomatch_tpu.ops.pallas import asw_dlanes, asw_sym_dlanes
from aswstereomatch_tpu.utils import synthetic


def J(fn, **static):
    return jax.jit(functools.partial(fn, **static))


CFG = StereoConfig(
    max_disparity=8, cost="tad_grad", aggregation="asw", window_radius=2,
    asw_symmetric=False, gamma_color=14.0, gamma_spatial=9.0,
)


@pytest.mark.parametrize(
    "cfg,shape",
    [
        (CFG, (24, 40)),
        (CFG.replace(cost="ad"), (24, 40)),
        # multiple tiles in both axes + non-divisible H and W
        (CFG, (21, 150)),
        (CFG.replace(max_disparity=16, window_radius=3), (20, 100)),
        # D - 1 > TXS=64 exercises the multi-neighbor (m=2, negative-lo)
        # right-partial combine — the production KITTI D=128 regime,
        # otherwise only reached on hardware.
        (CFG.replace(max_disparity=128), (16, 192)),
    ],
    ids=["base", "ad_cost", "multitile_odd", "d16_r3", "d128_multinb"],
)
def test_dlanes_outputs_match_jnp_volume(cfg, shape):
    h, w = shape
    pair = synthetic.make_pair(
        height=h, width=w, max_disparity=cfg.max_disparity, seed=3
    )
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])

    outs = J(asw_dlanes.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))

    bd_ref = np.argmin(vol, -1)
    np.testing.assert_array_equal(np.asarray(outs["bestd"]), bd_ref)
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-4, atol=1e-3
    )
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    np.testing.assert_array_equal(
        np.asarray(outs["rbestd"]), np.argmin(volr, -1)
    )
    D = cfg.max_disparity
    cm_ref = np.take_along_axis(vol, (bd_ref - 1).clip(0)[..., None], -1)[..., 0]
    cp_ref = np.take_along_axis(
        vol, (bd_ref + 1).clip(0, D - 1)[..., None], -1
    )[..., 0]
    mask = (bd_ref > 0) & (bd_ref < D - 1)
    np.testing.assert_allclose(
        np.asarray(outs["cm"])[mask], cm_ref[mask], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(outs["cp"])[mask], cp_ref[mask], rtol=1e-4, atol=1e-3
    )


def test_dlanes_pipeline_end_to_end_matches_jnp():
    cfg = CFG.replace(
        backend="pallas", lr_check=True, fill_holes=True, subpixel=True,
        median_filter=True,
    )
    assert asw_dlanes.routed(cfg)
    pair = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=5)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    d_pal = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    d_jnp = np.asarray(J(pipeline.match_pair, cfg=cfg.replace(backend="jnp"))(l, r))
    agree = np.mean(np.abs(d_pal - d_jnp) <= 0.51)
    assert agree > 0.99, f"disagreement {1 - agree:.4%}"
    assert np.mean(np.abs(d_pal - d_jnp) > 2.0) < 0.005


@pytest.mark.parametrize("shape", [(24, 40), (21, 150)], ids=["one", "multi"])
def test_dlanes_box_mode_matches_jnp_volume(shape):
    """Box aggregation through the dlanes MXU kernel (uniform band, no Lab
    reads) against the jnp box volume; opt-in via kernel_layout."""
    h, w = shape
    cfg = StereoConfig(
        max_disparity=16, cost="tad_grad", aggregation="box",
        window_radius=3, kernel_layout="dlanes",
    )
    pair = synthetic.make_pair(height=h, width=w, max_disparity=16, seed=3)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    outs = J(asw_dlanes.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    np.testing.assert_array_equal(np.asarray(outs["bestd"]), np.argmin(vol, -1))
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-4, atol=1e-3
    )
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    np.testing.assert_array_equal(
        np.asarray(outs["rbestd"]), np.argmin(volr, -1)
    )


def test_dlanes_routing_rules():
    assert asw_dlanes.routed(CFG.replace(backend="pallas"))
    # symmetric weights stay on the x-lanes kernel
    assert not asw_dlanes.routed(CFG.replace(asw_symmetric=True))
    # forcing xlanes wins
    assert not asw_dlanes.routed(CFG.replace(kernel_layout="xlanes"))
    # box auto-routes here only when the d-lane vreg is well utilized
    # (measured crossover D > 64: KITTI 128 wins 1.7x, venus 64 loses
    # 0.67x); explicit dlanes always forces it, xlanes forces it away
    assert asw_dlanes.routed(
        CFG.replace(aggregation="box", max_disparity=128)
    )
    assert not asw_dlanes.routed(
        CFG.replace(aggregation="box", max_disparity=64)
    )
    assert not asw_dlanes.routed(CFG.replace(aggregation="box"))  # D=8
    assert asw_dlanes.routed(
        CFG.replace(aggregation="box", kernel_layout="dlanes")
    )
    assert not asw_dlanes.routed(
        CFG.replace(aggregation="box", max_disparity=128,
                    kernel_layout="xlanes")
    )
    # symmetric + forced dlanes belongs to the symmetric module
    assert not asw_dlanes.routed(
        CFG.replace(asw_symmetric=True, kernel_layout="dlanes")
    )
    assert asw_sym_dlanes.routed(
        CFG.replace(asw_symmetric=True, kernel_layout="dlanes")
    )
    # forcing dlanes on an unsupported config is a loud error
    with pytest.raises(ValueError):
        asw_dlanes.routed(
            CFG.replace(max_disparity=256, kernel_layout="dlanes")
        )
    with pytest.raises(ValueError):
        asw_sym_dlanes.routed(
            CFG.replace(
                asw_symmetric=True, max_disparity=256, kernel_layout="dlanes"
            )
        )


def test_dlanes_tiled_equals_untiled_exactly():
    """Per-pixel accumulation order is position-independent, so the y-tiled
    path through the dlanes kernel is bit-exact vs untiled — the same
    invariant the x-lanes kernel pins."""
    from aswstereomatch_tpu.parallel import mesh as mesh_lib
    from aswstereomatch_tpu.parallel import tiling

    cfg = CFG.replace(
        backend="pallas", lr_check=True, fill_holes=True, subpixel=True,
        median_filter=True, window_radius=3, max_disparity=8,
    )
    pair = synthetic.make_pair(height=96, width=128, max_disparity=8, seed=7)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    ref = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    m = mesh_lib.build_mesh(data=1, tile=4)
    out = np.asarray(
        J(tiling.match_pair_tiled, cfg=cfg, device_mesh=m)(l, r)
    )
    np.testing.assert_array_equal(out, ref)


SCFG = CFG.replace(asw_symmetric=True)


@pytest.mark.parametrize(
    "cfg,shape",
    [
        (SCFG, (24, 40)),
        # multiple tiles in both axes + non-divisible H and W
        (SCFG, (21, 150)),
        (SCFG.replace(max_disparity=16, window_radius=3), (20, 100)),
        # D - 1 > TXS=64: multi-neighbor right-partial combine (KITTI regime)
        (SCFG.replace(max_disparity=128), (16, 192)),
    ],
    ids=["base", "multitile_odd", "d16_r3", "d128_multinb"],
)
def test_sym_dlanes_outputs_match_jnp_volume(cfg, shape):
    """Symmetric d-lanes kernel vs the jnp symmetric aggregated volume:
    exact argmin agreement (fp order differs, so values are allclose)."""
    h, w = shape
    pair = synthetic.make_pair(
        height=h, width=w, max_disparity=cfg.max_disparity, seed=3
    )
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])

    outs = J(asw_sym_dlanes.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))

    bd_ref = np.argmin(vol, -1)
    bd = np.asarray(outs["bestd"])
    agree = np.mean(bd == bd_ref)
    assert agree > 0.995, f"argmin disagreement {1 - agree:.4%}"
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-4, atol=1e-3
    )
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    ragree = np.mean(np.asarray(outs["rbestd"]) == np.argmin(volr, -1))
    assert ragree > 0.995, f"right argmin disagreement {1 - ragree:.4%}"


def test_sym_dlanes_pipeline_end_to_end_matches_jnp():
    cfg = SCFG.replace(
        backend="pallas", kernel_layout="dlanes", lr_check=True,
        fill_holes=True, subpixel=True, median_filter=True,
    )
    pair = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=5)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    d_pal = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    d_jnp = np.asarray(
        J(pipeline.match_pair, cfg=cfg.replace(backend="jnp"))(l, r)
    )
    agree = np.mean(np.abs(d_pal - d_jnp) <= 0.51)
    assert agree > 0.99, f"disagreement {1 - agree:.4%}"
    assert np.mean(np.abs(d_pal - d_jnp) > 2.0) < 0.005


def test_dlanes_batch_matches_single():
    """match_batch routes lax.map (not vmap) for d-lanes configs: Mosaic
    cannot batch-block the kernel's ANY-memspace HBM cost volume (a
    hardware-only lowering error this test cannot see in interpret mode —
    tools/tpu_smoke.py covers the real chip); the sequential form must
    still reproduce single-pair results exactly."""
    pair = synthetic.make_pair(height=24, width=48, max_disparity=8, seed=5)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    for cfg in (
        CFG.replace(backend="pallas", lr_check=True, fill_holes=True,
                    subpixel=True, median_filter=True),
        CFG.replace(backend="pallas", aggregation="box",
                    kernel_layout="dlanes"),
        CFG.replace(backend="pallas", asw_symmetric=True,
                    kernel_layout="dlanes"),
    ):
        single = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
        batch = np.asarray(
            J(pipeline.match_batch, cfg=cfg)(
                jnp.stack([l, l]), jnp.stack([r, r])
            )
        )
        np.testing.assert_array_equal(batch[0], single)
        np.testing.assert_array_equal(batch[1], single)


# ---------------------------------------------------------------------------
# Separable two-pass kernel (asw_sep_dlanes)
# ---------------------------------------------------------------------------

SEP = CFG.replace(asw_separable=True)


@pytest.mark.parametrize(
    "cfg,shape",
    [
        (SEP.replace(asw_symmetric=True), (24, 40)),
        (SEP, (24, 40)),  # left-only
        (SEP.replace(asw_symmetric=True, cost="ad"), (24, 40)),
        # multiple tiles in both axes + non-divisible H and W
        (SEP.replace(asw_symmetric=True), (21, 150)),
        (SEP.replace(asw_symmetric=True, max_disparity=16, window_radius=3),
         (20, 100)),
        # D - 1 > TXS exercises the multi-neighbor right-partial combine
        (SEP.replace(asw_symmetric=True, max_disparity=128), (16, 192)),
        # the flagship K=33 window (TXU=96) and the K=65 support boundary
        # (TXU=128 — the strided-roll sublane limit)
        (SEP.replace(asw_symmetric=True, max_disparity=16, window_radius=16),
         (12, 80)),
        (SEP.replace(asw_symmetric=True, max_disparity=16, window_radius=32),
         (10, 70)),
    ],
    ids=["sym", "leftonly", "ad_cost", "multitile_odd", "d16_r3",
         "d128_multinb", "k33_flagship", "k65_boundary"],
)
def test_sep_dlanes_outputs_match_jnp_volume(cfg, shape):
    from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes

    h, w = shape
    pair = synthetic.make_pair(
        height=h, width=w, max_disparity=cfg.max_disparity, seed=3
    )
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])

    outs = J(asw_sep_dlanes.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))

    bd_ref = np.argmin(vol, -1)
    np.testing.assert_array_equal(np.asarray(outs["bestd"]), bd_ref)
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-4, atol=1e-3
    )
    volr = np.asarray(J(postprocess.right_volume)(jnp.asarray(vol)))
    np.testing.assert_array_equal(
        np.asarray(outs["rbestd"]), np.argmin(volr, -1)
    )


@pytest.mark.parametrize(
    "cfg,shape",
    [
        (SEP, (24, 40)),
        # flagship-class K=33 window so the swb_h wrap bound (TXS+K<=129)
        # is exercised at its tight point
        (SEP.replace(max_disparity=16, window_radius=16), (12, 80)),
    ],
    ids=["leftonly_small", "leftonly_k33"],
)
def test_sep_dlanes_mxu_hpass_matches_jnp_volume(cfg, shape):
    """Left-only banded-dot (MXU) horizontal pass — made THE left-only
    path in round 4 after the on-chip A/B (tools/ab_lo_hpass.py: 1.35x at
    KITTI, argmin agreement 100% at 4 geometries).  The K=33 case pins
    the swb_h wrap bound at its tight point; same gate as the
    default-path test: exact argmin, allclose costs."""
    from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes

    h, w = shape
    pair = synthetic.make_pair(
        height=h, width=w, max_disparity=cfg.max_disparity, seed=3
    )
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    outs = J(asw_sep_dlanes.wta_outputs, cfg=cfg)(l, r)
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    np.testing.assert_array_equal(np.asarray(outs["bestd"]), np.argmin(vol, -1))
    np.testing.assert_allclose(
        np.asarray(outs["bestc"]), vol.min(-1), rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("sym", [True, False], ids=["sym", "leftonly"])
def test_sep_dlanes_bf16_volume_tracks_f32(sym):
    """volume_dtype="bfloat16" (storage-precision mode): costs quantized to
    8-bit mantissa before aggregation, accumulation f32.  Gate: near-total
    argmin agreement with the f32 kernel and small winner-cost drift."""
    from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes

    cfg32 = SEP.replace(asw_symmetric=sym, max_disparity=32, window_radius=8)
    cfg16 = cfg32.replace(volume_dtype="bfloat16")
    pair = synthetic.make_pair(height=40, width=120, max_disparity=32, seed=7)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    o32 = J(asw_sep_dlanes.wta_outputs, cfg=cfg32)(l, r)
    o16 = J(asw_sep_dlanes.wta_outputs, cfg=cfg16)(l, r)
    d32, d16 = np.asarray(o32["bestd"]), np.asarray(o16["bestd"])
    assert np.mean(d32 == d16) > 0.995
    assert np.mean(np.abs(d32 - d16) > 2) < 0.002
    np.testing.assert_allclose(
        np.asarray(o16["bestc"]), np.asarray(o32["bestc"]),
        rtol=1e-2, atol=1e-2,
    )


def test_sep_dlanes_pipeline_end_to_end_matches_jnp():
    """Full pipeline (LR + fill + subpixel + median) through the kernel vs
    the jnp separable path: subpixel-tolerance agreement."""
    from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes

    cfg = SEP.replace(asw_symmetric=True, max_disparity=16, window_radius=3)
    pair = synthetic.make_pair(height=37, width=101, max_disparity=16, seed=11)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    ref = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
    outs = J(asw_sep_dlanes.wta_outputs, cfg=cfg)(l, r)
    disp = np.asarray(pipeline._postprocess_from_wta(outs, cfg, l))
    assert (np.abs(disp - ref) <= 0.51).mean() == 1.0


def test_sep_dlanes_routing_rules():
    from aswstereomatch_tpu.ops.pallas import asw_sep_dlanes

    # hardware-validated 2026-08-19: auto routes supported geometries
    assert asw_sep_dlanes.routed(SEP)
    assert asw_sep_dlanes.routed(SEP.replace(asw_symmetric=True))
    assert asw_sep_dlanes.routed(SEP.replace(kernel_layout="dlanes"))
    assert asw_sep_dlanes.routed(
        SEP.replace(asw_symmetric=True, kernel_layout="dlanes")
    )
    # auto + unsupported geometry falls back to jnp instead of raising
    assert not asw_sep_dlanes.routed(SEP.replace(max_disparity=256))
    # the exact kernels must refuse separable configs
    assert not asw_dlanes.supports(SEP)
    assert not asw_sym_dlanes.supports(SEP.replace(asw_symmetric=True))
    # xlanes pin -> jnp handles separable
    assert not asw_sep_dlanes.routed(SEP.replace(kernel_layout="xlanes"))
    # unsupported geometry under an explicit dlanes pin raises
    with pytest.raises(ValueError, match="separable|dlanes"):
        asw_sep_dlanes.routed(
            SEP.replace(kernel_layout="dlanes", max_disparity=256)
        )
    # non-separable configs never land here
    assert not asw_sep_dlanes.routed(CFG)


def test_separable_backend_resolution_on_tpu(monkeypatch):
    """With a TPU default backend, auto-resolved separable configs route
    onto the d-lanes kernel (hardware-validated; separable_ab.json), fall
    back to jnp outside its geometry envelope, and honor explicit pins."""
    with monkeypatch.context() as m:
        # scoped: the same jax module backs _interpret(), which must see
        # the real CPU backend when the kernels below execute
        m.setattr(pipeline.jax, "default_backend", lambda: "tpu")
        assert pipeline._resolve_backend(SEP) == "pallas"
        assert (
            pipeline._resolve_backend(SEP.replace(asw_symmetric=True))
            == "pallas"
        )
        # outside the kernel envelope: jnp serves the config
        assert (
            pipeline._resolve_backend(SEP.replace(max_disparity=256))
            == "jnp"
        )
        # explicit pins still work
        assert (
            pipeline._resolve_backend(SEP.replace(kernel_layout="dlanes"))
            == "pallas"
        )
        assert (
            pipeline._resolve_backend(SEP.replace(kernel_layout="xlanes"))
            == "jnp"
        )
        assert (
            pipeline._resolve_backend(SEP.replace(backend="pallas"))
            == "pallas"
        )
        # non-separable auto-routing is unchanged
        assert pipeline._resolve_backend(CFG) == "pallas"
    # forced pallas at a supported geometry runs the separable kernel
    pair = synthetic.make_pair(height=16, width=32, max_disparity=8, seed=0)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    outs = pipeline._kernel_wta(l, r, SEP)
    ref = pipeline._kernel_wta(l, r, SEP.replace(kernel_layout="dlanes"))
    np.testing.assert_array_equal(
        np.asarray(outs["bestd"]), np.asarray(ref["bestd"])
    )
    # ... and an unsupported geometry raises instead of computing the
    # exact window
    with pytest.raises(ValueError, match="separable"):
        pipeline._kernel_wta(l, r, SEP.replace(max_disparity=256))
    # an explicit xlanes pin names a kernel that doesn't exist for this
    # mode — raise, never silently serve the dlanes kernel
    with pytest.raises(ValueError, match="xlanes"):
        pipeline._kernel_wta(l, r, SEP.replace(kernel_layout="xlanes"))


def test_exact_xlanes_kernel_refuses_separable_stacks():
    """The sharded paths feed asw_kernel.wta_outputs_from_stacks directly;
    a separable config there must raise, never silently compute the exact
    O(K^2) window."""
    from aswstereomatch_tpu.ops import preprocess
    from aswstereomatch_tpu.ops.pallas import asw_kernel

    pair = synthetic.make_pair(height=16, width=32, max_disparity=8, seed=1)
    ls = preprocess.channel_stack(jnp.asarray(pair["left"]))
    rs = preprocess.channel_stack(jnp.asarray(pair["right"]))
    with pytest.raises(ValueError, match="separable"):
        asw_kernel.wta_outputs_from_stacks(ls, rs, SEP, 32)
