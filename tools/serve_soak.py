"""Multi-thousand-request serving soak with a live supervisor cycle.

Round-5 verdict task 4 (serve half): drive >= 2000 requests through
``tools/serve.py`` across mixed presets and wire dtypes, with the server
run under the documented supervisor loop (restart on the RSS self-recycle
exit 42).  The soak FORCES at least one recycle by setting a modest
--max-rss-mb, and verifies the full containment story at 10x the round-4
scale:

  - clients survive the restart (reconnect loop) and the soak completes;
  - responses are bit-stable for identical inputs across the whole run,
    INCLUDING across the restart (the AOT executable cache makes the
    fresh process serve identical bytes after a ~1-2 s warm start);
  - the server's RSS curve is recorded per process generation — growth is
    the known upstream axon-tunnel per-H2D retention (PERF_NOTES round
    4), and the supervisor bound caps it.

Run: python tools/serve_soak.py [--requests 2000] [--clients 4]
     [--max-rss-mb 2048] [--out bench_results/serve_soak_2k.json]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import serve as serve_mod  # noqa: E402
from soak_runner import rss_mb  # noqa: E402 - one VmRSS parser for both soaks


class Supervisor(threading.Thread):
    """The documented production loop: restart the stateless daemon on the
    RSS self-recycle code; record each generation's pid + RSS curve."""

    def __init__(self, port: int, max_rss_mb: int, log_path: str):
        super().__init__(daemon=True)
        self.port = port
        self.max_rss_mb = max_rss_mb
        self.log_path = log_path
        self.generations = []  # [{pid, started, ended, rc, rss_curve}]
        self.restarts = 0
        self.stop_flag = False
        self.proc = None

    def run(self):
        log = open(self.log_path, "w")
        while not self.stop_flag:
            self.proc = subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tools", "serve.py"),
                 "--port", str(self.port),
                 "--max-rss-mb", str(self.max_rss_mb)],
                stdout=log, stderr=subprocess.STDOUT,
            )
            gen = {"pid": self.proc.pid, "started": round(time.time(), 1),
                   "rss_curve": []}
            self.generations.append(gen)
            while self.proc.poll() is None:
                m = rss_mb(self.proc.pid)
                if m is not None:
                    gen["rss_curve"].append(round(m, 1))
                time.sleep(2.0)
            gen["ended"] = round(time.time(), 1)
            gen["rc"] = self.proc.returncode
            if self.stop_flag:
                break
            if self.proc.returncode == serve_mod.Server.RSS_EXIT_CODE:
                self.restarts += 1
                continue  # supervisor contract: restart on 42
            break  # any other exit ends the soak server
        log.close()

    def shutdown(self):
        self.stop_flag = True
        if self.proc and self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                self.proc.kill()


def connect_with_retry(port, deadline_s=420):
    t_end = time.time() + deadline_s
    while time.time() < t_end:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            s.settimeout(600)
            return s
        except OSError:
            time.sleep(0.5)
    raise TimeoutError("server never came (back) up")


def client_worker(cid, port, n_req, spec, results, reconnects, refs, lock):
    """One connection per generation; on connection failure (server
    recycling) reconnect and continue — requests are stateless."""
    name, left, right, config, wires = spec
    rng = np.random.default_rng(1000 + cid)
    sock = connect_with_retry(port)
    done = 0
    while done < n_req:
        dtype, rdtype = wires[int(rng.integers(len(wires)))]
        l = left.astype(np.uint8) if dtype == "uint8" else left
        r = right.astype(np.uint8) if dtype == "uint8" else right
        t0 = time.perf_counter()
        try:
            disp, hdr = serve_mod.send_request(
                sock, l, r, config, dtype=dtype, response_dtype=rdtype)
        except (OSError, ConnectionError, RuntimeError) as e:
            if isinstance(e, RuntimeError):
                results.append((cid, name, dtype, rdtype, None,
                                f"server-error: {e}"))
                done += 1
                continue
            try:
                sock.close()
            except OSError:
                pass
            reconnects.append((cid, time.time()))
            sock = connect_with_retry(port)
            continue  # retry the same request on the fresh generation
        dt = time.perf_counter() - t0
        # bit-stability: first response per (preset, wire) is the pinned
        # reference; every later identical request must match exactly
        key = (name, dtype, rdtype)
        with lock:
            if key not in refs:
                refs[key] = disp
                stable = True
            else:
                stable = bool(np.array_equal(disp, refs[key]))
        results.append((cid, name, dtype, rdtype, dt,
                        "ok" if stable else "UNSTABLE"))
        done += 1
    sock.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=2000)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--max-rss-mb", type=int, default=2048)
    ap.add_argument("--out", default="bench_results/serve_soak_2k.json")
    ap.add_argument("--server-log", default="/tmp/serve_soak_server.log")
    args = ap.parse_args()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    from aswstereomatch_tpu.utils import synthetic

    kitti = synthetic.make_pair(height=375, width=1242, max_disparity=128,
                                seed=0)
    midd = synthetic.make_pair(height=375, width=450, max_disparity=64,
                               seed=1)
    wires = (("uint8", "uint16_x256"), ("uint8", "float32"),
             ("float32", "float32"))
    specs = [
        ("kitti_sep", kitti["left"], kitti["right"],
         {"preset": "kitti_sep"}, wires),
        ("middlebury_asw_full", midd["left"], midd["right"],
         {"preset": "middlebury_asw_full"}, wires),
    ]

    sup = Supervisor(port, args.max_rss_mb, args.server_log)
    sup.start()

    results, reconnects = [], []
    refs, lock = {}, threading.Lock()
    per = args.requests // args.clients
    t0 = time.time()
    threads = [
        threading.Thread(
            target=client_worker,
            args=(i, port, per, specs[i % len(specs)], results, reconnects,
                  refs, lock),
        )
        for i in range(args.clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    sup.shutdown()
    sup.join(timeout=30)

    ok = [r for r in results if r[5] == "ok"]
    unstable = [r for r in results if r[5] == "UNSTABLE"]
    errors = [r for r in results if r[5].startswith("server-error")]
    by_class = {}
    for cid, name, dtype, rdtype, dt, status in ok:
        if dt is None:
            continue
        by_class.setdefault(f"{name}:{dtype}->{rdtype}", []).append(dt * 1e3)
    lat_summary = {
        k: {"n": len(v),
            "p50_ms": round(float(np.percentile(v, 50)), 1),
            "p99_ms": round(float(np.percentile(v, 99)), 1)}
        for k, v in sorted(by_class.items())
    }
    rec = {
        "requests_completed": len(ok) + len(errors),
        "requests_bit_stable": len(ok),
        "unstable": len(unstable),
        "server_errors": len(errors),
        "client_reconnects": len(reconnects),
        "supervisor_restarts_on_42": sup.restarts,
        "generations": [
            {"pid": g["pid"], "rc": g.get("rc"),
             "alive_s": round(g.get("ended", time.time()) - g["started"], 1),
             "rss_mb_first": g["rss_curve"][0] if g["rss_curve"] else None,
             "rss_mb_last": g["rss_curve"][-1] if g["rss_curve"] else None,
             "rss_curve_mb": g["rss_curve"]}
            for g in sup.generations
        ],
        "max_rss_mb_limit": args.max_rss_mb,
        "wall_s": round(wall, 1),
        "aggregate_pairs_per_s": round((len(ok) + len(errors)) / wall, 2),
        "latency_by_class": lat_summary,
        "note": "mixed-preset mixed-wire soak under the documented "
                "supervisor loop; bit-stability pinned per (preset, wire) "
                "across the whole run incl. any RSS-recycle restarts",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in (
        "requests_completed", "unstable", "server_errors",
        "client_reconnects", "supervisor_restarts_on_42", "wall_s",
        "aggregate_pairs_per_s")}))
    return 0 if not unstable and not errors else 1


if __name__ == "__main__":
    sys.exit(main())
