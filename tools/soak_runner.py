"""RSS-sampling wrapper for long soaks (round-5 verdict task 4).

Launches a child command, samples its resident set (VmRSS) every few
seconds for the child's whole lifetime, and writes the curve + summary to
a JSON record.  Used for the 1000-pair sweep and the multi-thousand-
request serve soak, where the claim under test is that the round-4
containment of the upstream per-H2D host-memory retention (eager input
deletes + RSS self-recycle) actually holds at 10x the round-4 scale.

Run: python tools/soak_runner.py --out bench_results/x.json -- cmd args...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def rss_mb(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--interval", type=float, default=3.0)
    ap.add_argument("--log", default=None,
                    help="child stdout/stderr file (default: inherit)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- child command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        print("no child command given", file=sys.stderr)
        return 2

    logf = open(args.log, "w") if args.log else None
    t0 = time.time()
    child = subprocess.Popen(cmd, stdout=logf or None,
                             stderr=subprocess.STDOUT if logf else None)
    samples = []
    while child.poll() is None:
        m = rss_mb(child.pid)
        if m is not None:
            samples.append([round(time.time() - t0, 1), round(m, 1)])
        time.sleep(args.interval)
    rc = child.returncode
    if logf:
        logf.close()
    rss_vals = [m for _, m in samples]
    rec = {
        "cmd": cmd,
        "returncode": rc,
        "wall_s": round(time.time() - t0, 1),
        "rss_mb_first": rss_vals[0] if rss_vals else None,
        "rss_mb_peak": max(rss_vals) if rss_vals else None,
        "rss_mb_last": rss_vals[-1] if rss_vals else None,
        "samples": len(samples),
        "interval_s": args.interval,
        "rss_curve": samples,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("returncode", "wall_s", "rss_mb_first",
                       "rss_mb_peak", "rss_mb_last")}))
    return rc


if __name__ == "__main__":
    sys.exit(main())
