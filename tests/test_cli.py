"""CLI driver smoke tests (in-process, tiny geometry, CPU)."""

import json

import numpy as np

import cli as cli_mod
from aswstereomatch_tpu.utils import io, synthetic


def run_cli(args):
    return cli_mod.main(args)


def test_cli_synthetic_run(tmp_path, capsys):
    out_json = tmp_path / "run.json"
    rc = run_cli([
        "--synthetic", "tsukuba", "--max-disparity", "8",
        "--aggregation", "box", "--window-radius", "2", "--no-postprocess",
        "--json", str(out_json), "--out", str(tmp_path / "disp.pgm"),
        "--err-out", str(tmp_path / "err.pgm"),
    ])
    assert rc == 0
    rec = json.loads(out_json.read_text())
    assert rec["metrics"]["bad_2"] < 0.2
    assert rec["pairs_per_s"] > 0
    assert rec["config_hash"]
    disp = io.read_pnm(str(tmp_path / "disp.pgm"))
    assert disp.shape == tuple(rec["shape"])


def test_cli_separable_run(tmp_path):
    out_json = tmp_path / "sep.json"
    rc = run_cli([
        "--synthetic", "tsukuba", "--max-disparity", "8",
        "--aggregation", "asw", "--window-radius", "2", "--separable",
        "--json", str(out_json),
    ])
    assert rc == 0
    rec = json.loads(out_json.read_text())
    assert rec["metrics"]["bad_2"] < 0.2
    assert rec["config"]["asw_separable"] is True


def test_cli_file_inputs(tmp_path):
    pair = synthetic.make_pair(height=24, width=40, max_disparity=8, seed=1)
    lp, rp = str(tmp_path / "l.ppm"), str(tmp_path / "r.ppm")
    for path, img in [(lp, pair["left"]), (rp, pair["right"])]:
        arr = img.astype(np.uint8)
        with open(path, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
            f.write(arr.tobytes())
    gt = str(tmp_path / "gt.pfm")
    io.write_pfm(gt, pair["gt"] * 256.0)  # kitti convention scale
    rc = run_cli([
        "--left", lp, "--right", rp, "--gt", gt, "--dataset", "kitti",
        "--max-disparity", "8", "--aggregation", "box", "--window-radius", "2",
        "--no-postprocess", "--json", str(tmp_path / "r.json"),
    ])
    assert rc == 0


def test_cli_mesh_run(tmp_path):
    rc = run_cli([
        "--synthetic", "tsukuba", "--max-disparity", "8",
        "--aggregation", "box", "--window-radius", "2", "--no-postprocess",
        "--mesh", "1x4", "--json", str(tmp_path / "m.json"),
    ])
    assert rc == 0


def test_cli_missing_inputs():
    assert run_cli([]) == 2


def test_cli_shard_axes(tmp_path):
    for axis in ("y", "x", "d"):
        rc = run_cli([
            "--synthetic", "tsukuba", "--max-disparity", "8",
            "--aggregation", "asw", "--window-radius", "2", "--no-postprocess",
            "--mesh", "1x4", "--shard-axis", axis,
            "--json", str(tmp_path / f"{axis}.json"),
        ])
        assert rc == 0, axis
