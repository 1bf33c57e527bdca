"""Tracing / profiling helpers (SURVEY.md section 5).

The reference has no observability beyond printf timing; the TPU-native
equivalents are jax.profiler traces (XProf/Perfetto-compatible) plus named
scopes per pipeline stage, and a small timing helper that works around
``jax.block_until_ready`` not blocking under the axon TPU tunnel.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def force_sync(out) -> None:
    """Synchronize with device completion.

    jax.block_until_ready returns early under the axon remote-TPU tunnel, so
    fetch one scalar per leaf to force real completion.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        arr = np.asarray(leaf).ravel()
        if arr.size:
            float(arr[0])


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def stage(name: str):
    """Named scope for a pipeline stage (shows up in profiler traces)."""
    return jax.named_scope(name)


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 2):
    """(best_s, mean_s, times) for fn(*args) with real device sync."""
    for _ in range(warmup):
        force_sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), float(np.mean(times)), times
