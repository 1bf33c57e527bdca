"""Serving daemon end-to-end over a real socket (CPU backend)."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import serve as serve_mod  # noqa: E402

from aswstereomatch_tpu.utils import evaluate, synthetic  # noqa: E402


@pytest.mark.slow
def test_serve_end_to_end(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    log = open(tmp_path / "server.log", "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--port", str(port), "--platform", "cpu"],
        stdout=log, stderr=subprocess.STDOUT, env=env,
    )
    try:
        pair = synthetic.make_pair(height=32, width=48, max_disparity=8, seed=0)
        cfgd = dict(max_disparity=8, aggregation="asw", window_radius=2)
        deadline = time.time() + 60
        sock = None
        while time.time() < deadline:
            try:
                sock = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                time.sleep(0.2)
        assert sock is not None, (tmp_path / "server.log").read_text()[-2000:]
        sock.settimeout(180)
        with sock:
            d1, h1 = serve_mod.send_request(sock, pair["left"], pair["right"], cfgd)
            d2, h2 = serve_mod.send_request(sock, pair["left"], pair["right"], cfgd)
            assert np.array_equal(d1, d2)
            assert h2["elapsed_ms"] <= h1["elapsed_ms"]
            bad2 = evaluate.bad_delta(d1, pair["gt"], 2.0, ~pair["occluded"])
            assert bad2 < 0.05
            with pytest.raises(RuntimeError, match="bogus"):
                serve_mod.send_request(sock, pair["left"], pair["right"],
                                       {"aggregation": "bogus"})
            d3, _ = serve_mod.send_request(sock, pair["left"], pair["right"], cfgd)
            assert np.array_equal(d3, d1)
            # uint8 wire format: synthetic pairs are integral [0, 255], so
            # the u8 request is lossless and must match the f32-wire result
            # exactly (the widen to f32 happens on device).
            du, _ = serve_mod.send_request(
                sock, pair["left"].astype(np.uint8),
                pair["right"].astype(np.uint8), cfgd, dtype="uint8")
            assert np.array_equal(du, d1)
            # preset + override config path
            dp, _ = serve_mod.send_request(
                sock, pair["left"], pair["right"],
                {"preset": "tsukuba_ad_box", "max_disparity": 8,
                 "window_radius": 2})
            assert dp.shape == d1.shape
            # uint16_x256 response format: KITTI fixed-point encoding —
            # must match f32 within the 1/512 px rounding bound
            du16, hu = serve_mod.send_request(
                sock, pair["left"], pair["right"], cfgd,
                response_dtype="uint16_x256")
            assert hu["dtype"] == "uint16_x256"
            valid = d1 >= 0
            assert np.max(np.abs(du16 - d1)[valid]) <= 1 / 512 + 1e-6
            assert np.all(du16[~valid] == 0)
    finally:
        proc.terminate()
        proc.wait(timeout=10)
        log.close()
