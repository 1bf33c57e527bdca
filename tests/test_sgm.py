"""Semi-global aggregation (aggregation="sgm") — round-5 extension.

Beyond-reference capability (the reference implements the LOCAL ASW
method; GAPS.md flagged semi-global propagation as the measured accuracy
frontier on ambiguous content).  Pinned here:

  - the packed-scan jnp form matches the literal 4-path loop oracle;
  - P1=P2=0 degenerates exactly to the raw-cost volume (scaled by 4) —
    an analytic identity of the pinned recurrence;
  - the gates (LR, uniqueness) compose on the SGM volume;
  - spatial tiling / chunking / d-sharding reject the mode (scanline
    propagation is global — no finite halo reproduces it);
  - accuracy: dense SGM beats dense local ASW on the hard regime.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aswstereomatch_tpu.config import StereoConfig
from aswstereomatch_tpu.models import oracle_numpy, pipeline
from aswstereomatch_tpu.ops import aggregate, cost as cost_ops
from aswstereomatch_tpu.parallel import dshard, mesh as mesh_lib, tiling
from aswstereomatch_tpu.utils import evaluate, synthetic


def J(fn, **static):
    return jax.jit(functools.partial(fn, **static))


def _cfg(**kw):
    base = dict(
        max_disparity=12, cost="tad_grad", aggregation="sgm",
        lr_check=True, fill_holes=True, subpixel=True, median_filter=True,
    )
    base.update(kw)
    return StereoConfig(**base)


@pytest.fixture(scope="module")
def pair():
    return synthetic.make_pair(height=32, width=56, max_disparity=12, seed=5)


def test_sgm_volume_matches_oracle(pair):
    cfg = _cfg()
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    vol_j = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    vol_o = oracle_numpy.aggregate_sgm(
        oracle_numpy.cost_volume(pair["left"], pair["right"], cfg), cfg
    )
    np.testing.assert_allclose(vol_j, vol_o, atol=1e-3)
    assert float(np.mean(vol_j.argmin(-1) == vol_o.argmin(-1))) > 0.999


def test_sgm_pipeline_matches_oracle(pair):
    for kw in (dict(), dict(median_mode="weighted"),
               dict(uniqueness_ratio=10.0, fill_holes=False)):
        cfg = _cfg(**kw)
        l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
        jn = np.asarray(J(pipeline.match_pair, cfg=cfg)(l, r))
        orc = oracle_numpy.match_pair(pair["left"], pair["right"], cfg)
        np.testing.assert_array_equal(jn >= 0, orc >= 0)
        np.testing.assert_allclose(jn, orc, atol=1e-4)


def test_sgm_zero_penalties_is_raw_cost(pair):
    """P1=P2=0: best = pmin, so L = C per path and S = 4C analytically.
    In f32 each step computes (C + pmin) - pmin, so rounding accumulates
    ~1 ulp per scan step — assert to that tolerance, and exact argmin."""
    cfg = _cfg(sgm_p1=0.0, sgm_p2=0.0)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    vol = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    raw = np.asarray(J(cost_ops.cost_volume, cfg=cfg)(l, r))
    np.testing.assert_allclose(vol, 4.0 * raw, rtol=1e-5, atol=1e-3)


def test_sgm_rejects_sharded_and_chunked(pair):
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    m = mesh_lib.build_mesh(data=1, tile=2)
    with pytest.raises(ValueError, match="sgm"):
        tiling.match_pair_tiled(l, r, _cfg(), m)
    with pytest.raises(ValueError, match="sgm"):
        tiling.match_pair_tiled_x(l, r, _cfg(), m)
    with pytest.raises(ValueError, match="sgm"):
        pipeline.match_pair(l, r, _cfg(y_chunks=2))
    with pytest.raises(ValueError):
        dshard.match_pair_dsharded(l, r, _cfg(), m)
    with pytest.raises(ValueError, match="sgm"):
        m22 = mesh_lib.build_mesh(data=2, tile=2)
        tiling.match_batch_sharded(
            jnp.stack([l, l]), jnp.stack([r, r]), _cfg(), m22
        )


def test_sgm_config_validation():
    with pytest.raises(ValueError, match="sgm_p1"):
        StereoConfig(aggregation="sgm", sgm_p1=8.0, sgm_p2=2.0)
    with pytest.raises(ValueError, match="sgm_p1"):
        StereoConfig(aggregation="sgm", sgm_p1=-1.0)


def test_sgm_beats_local_asw_dense_on_hard_regime():
    """The motivating measurement (GAPS.md 'measured next accuracy
    frontier'): dense semi-global beats dense local ASW on ambiguous
    content.  Small hard scene to keep CPU runtime sane."""
    pair = synthetic.make_hard_pair(96, 160, 32, seed=7)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    nonocc = ~pair["occluded"]
    sgm = np.asarray(J(pipeline.match_pair, cfg=_cfg(max_disparity=32))(l, r))
    asw = np.asarray(J(
        pipeline.match_pair,
        cfg=StereoConfig(max_disparity=32, cost="tad_grad",
                         aggregation="asw", window_radius=8,
                         lr_check=True, fill_holes=True, subpixel=True,
                         median_filter=True),
    )(l, r))
    b_sgm = evaluate.bad_report(sgm, pair["gt"], valid=nonocc)["bad_2"]
    b_asw = evaluate.bad_report(asw, pair["gt"], valid=nonocc)["bad_2"]
    assert b_sgm < b_asw, (b_sgm, b_asw)


def test_sgm_preset():
    from aswstereomatch_tpu.config import get_preset

    cfg = get_preset("kitti_sgm")
    assert cfg.aggregation == "sgm" and cfg.max_disparity == 128


def test_sgm_batch_and_matcher_api(pair):
    """SGM through the public batch/matcher surfaces (vmap over scans)."""
    import aswstereomatch_tpu as asm

    m = asm.StereoMatcher(_cfg())
    single = np.asarray(m(pair["left"], pair["right"]))
    lefts = np.stack([pair["left"]] * 2)
    rights = np.stack([pair["right"]] * 2)
    batched = np.asarray(m.batch(lefts, rights))
    assert batched.shape == (2,) + single.shape
    np.testing.assert_allclose(batched[0], single, atol=1e-4)


def test_sgm_eight_paths_matches_oracle(pair):
    """sgm_paths=8 adds the four diagonal paths (packed two per scan);
    parity vs the literal 8-direction loop oracle, and the mode is
    measurably different from 4-path (the diagonals contribute)."""
    cfg = _cfg(sgm_paths=8)
    l, r = jnp.asarray(pair["left"]), jnp.asarray(pair["right"])
    vol_j = np.asarray(J(pipeline.aggregated_volume, cfg=cfg)(l, r))
    vol_o = oracle_numpy.aggregate_sgm(
        oracle_numpy.cost_volume(pair["left"], pair["right"], cfg), cfg
    )
    np.testing.assert_allclose(vol_j, vol_o, atol=1e-3)
    assert float(np.mean(vol_j.argmin(-1) == vol_o.argmin(-1))) > 0.999
    vol4 = np.asarray(J(pipeline.aggregated_volume, cfg=_cfg())(l, r))
    assert not np.allclose(vol_j, vol4)
    with pytest.raises(ValueError, match="sgm_paths"):
        StereoConfig(aggregation="sgm", sgm_paths=6)


def test_sgm_batch_data_sharded(pair):
    """SGM batches shard over the DATA axis (independent pairs, scanlines
    intact): results match the unsharded pipeline; any spatial tile split
    still rejects."""
    from aswstereomatch_tpu.parallel import tiling

    cfg = _cfg()
    pair2 = synthetic.make_pair(height=32, width=56, max_disparity=12, seed=9)
    lefts = jnp.asarray(np.stack([pair["left"], pair2["left"]] * 2))
    rights = jnp.asarray(np.stack([pair["right"], pair2["right"]] * 2))
    m = mesh_lib.build_mesh(data=4, tile=1)
    out = np.asarray(
        J(tiling.match_batch_sharded, cfg=cfg, device_mesh=m)(lefts, rights)
    )
    for i in range(4):
        ref = np.asarray(
            J(pipeline.match_pair, cfg=cfg)(lefts[i], rights[i])
        )
        np.testing.assert_allclose(out[i], ref, atol=1e-4)
    with pytest.raises(ValueError, match="sgm"):
        tiling.match_batch_sharded(
            lefts, rights, cfg, mesh_lib.build_mesh(data=2, tile=2)
        )
