"""Post-commit cache warmer — fires when a commit touches compute sources.

Round-2 and round-3 both ended with a STALE driver bench for the same root
cause: the final session edited a compute-allowlisted file (which rotates
``utils/aotcache._compute_source_hash``) after the last cache warm, so the
driver's ``python bench.py`` met a cold cache (multi-minute Mosaic compile)
and fell back to the cached record.  This script closes that loop
mechanically: installed as ``.git/hooks/post-commit`` (see ``install()``),
it checks whether HEAD touched any compute-allowlisted path and, if so,
spawns a detached ``bench.py --warm-only`` child — which both repopulates
the AOT cache AND executes once to pay the device-side program load
(bench.py:warm_cache).  Non-blocking: the commit returns immediately; the
warm child serializes behind any live device user via utils/devlock.

Firing is logged to ``bench_results/warm_cache.log`` (the child's stdout)
and ``bench_results/warm_hook.log`` (this script's decision), so "the hook
fired on a compute edit" is auditable after the fact.

Usage:
    python tools/warm_on_compute_change.py            # hook body
    python tools/warm_on_compute_change.py --install  # write .git/hooks/post-commit
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Mirrors utils/aotcache._COMPUTE_DIRS/_COMPUTE_FILES (repo-relative).
PKG = "aswstereomatch_tpu"
COMPUTE_PREFIXES = tuple(
    f"{PKG}/{d}/" for d in ("ops", "models", "parallel")
)
COMPUTE_FILES = (f"{PKG}/config.py", f"{PKG}/utils/colorspace.py")

HOOK_BODY = """#!/bin/sh
# auto-installed by tools/warm_on_compute_change.py --install
exec python "$(git rev-parse --show-toplevel)/tools/warm_on_compute_change.py"
"""


def changed_compute_paths() -> list:
    out = subprocess.run(
        ["git", "diff-tree", "--no-commit-id", "--name-only", "-r", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.splitlines()
    return [
        p for p in out
        if p in COMPUTE_FILES or any(p.startswith(x) for x in COMPUTE_PREFIXES)
    ]


def _log(msg: str) -> None:
    os.makedirs(os.path.join(REPO, "bench_results"), exist_ok=True)
    with open(os.path.join(REPO, "bench_results", "warm_hook.log"), "a") as f:
        f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}\n")


def main() -> int:
    if "--install" in sys.argv:
        hooks = os.path.join(REPO, ".git", "hooks")
        os.makedirs(hooks, exist_ok=True)
        path = os.path.join(hooks, "post-commit")
        with open(path, "w") as f:
            f.write(HOOK_BODY)
        os.chmod(path, 0o755)
        print(f"installed {path}")
        return 0

    paths = changed_compute_paths()
    if not paths:
        _log("HEAD touched no compute sources; no warm needed")
        return 0
    # bench.py's guard: at most one warm child at a time.
    import bench

    if bench._warm_child_alive():
        _log(f"compute edit ({paths[0]}...) but a warm child is already live")
        return 0
    os.makedirs(bench.BENCH_DIR, exist_ok=True)
    with open(os.path.join(bench.BENCH_DIR, "warm_cache.log"), "ab") as log:
        child = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench.py"), "--warm-only"],
            stdout=log, stderr=log, start_new_session=True, cwd=REPO,
        )
    with open(bench._WARM_PID, "w") as f:
        f.write(str(child.pid))
    _log(f"compute edit in {len(paths)} file(s) ({paths[0]}...): "
         f"spawned warm child pid {child.pid}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
