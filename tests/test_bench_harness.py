"""bench.py harness behavior that must hold for the driver: one parseable
JSON line on stdout no matter what the device is doing.

These tests never touch a backend: the device lock is held by the test
process, so the bench's worker fails fast with a TimeoutError naming the
holder and the harness emits the cached record marked STALE.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_stale_line_when_device_locked(tmp_path):
    sys.path.insert(0, REPO)
    from aswstereomatch_tpu.utils import devlock

    lock = str(tmp_path / "dev.lock")
    env = dict(os.environ)
    env["ASW_DEVICE_LOCK"] = lock
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    os.environ["ASW_DEVICE_LOCK"] = lock
    try:
        with devlock.device_lock("test-holder"):
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--deadline-s", "3"],
                capture_output=True, text=True, timeout=120, env=env,
            )
    finally:
        del os.environ["ASW_DEVICE_LOCK"]

    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, (out.stdout, out.stderr)
    rec = json.loads(lines[0])
    # The repo ships a committed bench record, so the fallback must carry
    # its real value and name the lock holder in the live-error annotation.
    assert rec["value"] > 0 and rec["unit"] == "pairs/s/chip"
    assert "STALE" in rec["metric"]
    assert "test-holder" in rec["metric"]
