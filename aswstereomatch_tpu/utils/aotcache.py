"""Ahead-of-time compiled-executable cache.

The fused ASW Pallas kernel at production geometry (K=33, D=128) costs
minutes of Mosaic compile time *per process* on this environment, and JAX's
persistent compilation cache (``jax_compilation_cache_dir``) deadlocks the
compile under the axon remote-compile helper (verified twice: all threads
futex-wait, partial cache entries on disk; see docs/PERF_NOTES.md).

This module sidesteps both with ``jax.experimental.serialize_executable``:
compile once, pickle the PJRT executable to disk, and in later *processes*
``deserialize_and_load`` it in milliseconds.  Measured round trip for the
full KITTI pipeline executable: serialize ~0.1 s, load ~0.2 s, vs 266 s of
fresh compile.  (SURVEY.md section 5 "config/flag system" reproducibility:
cache keys embed the config hash, input shapes/dtypes, JAX version, and
device kind, so a stale artifact can never be silently reused.)

The reference (single C++ binary, SURVEY.md section 1 L7) has no analogous
subsystem — compile cost is a TPU-stack-specific concern; this is the
TPU-native equivalent of shipping a prebuilt binary.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
import warnings

import jax
import jax.numpy as jnp

# Repo-level default cache dir.  LOCAL-ONLY: artifacts are machine/device
# bound and .gitignore'd (a KITTI executable is ~77 MB) — the cache is
# populated by the first compile on a machine (or a `bench.py --warm-only`
# pass) and serves every later process there.  Override with
# ASW_AOT_CACHE_DIR.
_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".aotcache",
)


def cache_dir() -> str:
    return os.environ.get("ASW_AOT_CACHE_DIR", _DEFAULT_DIR)


_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Compute-relevant sources, ALLOWLISTED into the source hash: exactly the
# modules whose code can appear inside a traced/jitted computation.  Every
# other package file (utils/io.py, devlock.py, synthetic.py, evaluate.py,
# this file, ...) is host-side; hashing those would strand every cached
# binary — a multi-minute Mosaic recompile — on e.g. a lock-file tweak,
# which is exactly what kept the round-2 driver bench on the cold-compile
# path.  INVARIANT when adding a traced module outside these roots: add it
# here, or a stale executable silently benches old code.
_COMPUTE_DIRS = ("ops", "models", "parallel")
_COMPUTE_FILES = ("config.py", os.path.join("utils", "colorspace.py"))


def _hashed_paths() -> list:
    paths = [os.path.join(_PKG_DIR, f) for f in _COMPUTE_FILES]
    for d in _COMPUTE_DIRS:
        for root, _, files in sorted(os.walk(os.path.join(_PKG_DIR, d))):
            paths.extend(
                os.path.join(root, f) for f in sorted(files)
                if f.endswith(".py")
            )
    return paths


def _compute_source_hash() -> str:
    """Hash of every compute-relevant package source file: a kernel or
    pipeline edit must invalidate cached executables, or a stale binary
    would silently bench old code."""
    h = hashlib.sha256()
    for p in _hashed_paths():
        # Key on the package-relative path: cache artifacts must survive
        # checkout relocation (content-only invalidation).
        h.update(os.path.relpath(p, _PKG_DIR).encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


# Pinned at import: the hash must describe the code this process actually
# runs, not whatever is on disk when save() fires after a long compile.
_SOURCE_HASH = _compute_source_hash()


def _source_hash() -> str:
    return _SOURCE_HASH


def _env_fingerprint() -> dict:
    dev = jax.devices()[0]
    return {
        "jax": jax.__version__,
        "device_kind": dev.device_kind,
        # Serialized executables bind the device topology: one saved under
        # N devices demands N-sharded args when reloaded (seen as
        # "expected 8 shards, got [1, 1]" on the virtual-mesh test env).
        "device_count": jax.device_count(),
        "platform": dev.platform,
        "source": _source_hash(),
    }


def cache_key(*parts) -> str:
    """Stable key from config hash + shape/dtype parts + environment."""
    fp = _env_fingerprint()
    blob = repr((sorted(fp.items()), parts)).encode()
    return hashlib.sha256(blob).hexdigest()[:20]


def _path(key: str) -> str:
    return os.path.join(cache_dir(), f"{key}.jaxexec")


def load(key: str):
    """Return a callable for a cached executable, or None.

    Any failure (missing file, env mismatch, deserialization error) returns
    None — callers fall back to a fresh jit compile.
    """
    path = _path(key)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        if blob.get("env") != _env_fingerprint():
            return None
        from jax.experimental.serialize_executable import deserialize_and_load

        loaded = deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"]
        )
        try:
            os.utime(path)  # true LRU: a hit must protect against prune()
        except OSError:
            pass
        return loaded
    except Exception as e:  # noqa: BLE001 — cache must never break the caller
        warnings.warn(f"aotcache: failed to load {path}: {e}")
        return None


def save(key: str, compiled) -> bool:
    """Serialize a jax.stages.Compiled; returns False if unsupported."""
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
    except Exception as e:  # noqa: BLE001 — e.g. CPU backend, const_args
        warnings.warn(f"aotcache: serialization unsupported: {e}")
        return False
    os.makedirs(cache_dir(), exist_ok=True)
    blob = {
        "env": _env_fingerprint(),
        "payload": payload,
        "in_tree": in_tree,
        "out_tree": out_tree,
    }
    tmp = _path(key) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, _path(key))  # atomic: a crashed writer leaves no torn file
    prune(keep=_path(key))
    return True


def prune(keep: str | None = None, max_bytes: int | None = None) -> int:
    """Evict oldest cache entries until the directory fits ``max_bytes``.

    Entries are invalidated by source-hash keys, so every package edit
    strands the previous executables on disk forever (~77 MB each at KITTI
    geometry — an unbounded leak across an active round).  LRU by mtime;
    the just-written ``keep`` path is never evicted.  Returns bytes freed.
    """
    if max_bytes is None:
        try:
            max_bytes = int(os.environ.get("ASW_AOT_CACHE_MAX_BYTES", 2 << 30))
        except ValueError:  # "2G" etc. — never break the caller's save()
            warnings.warn("aotcache: ASW_AOT_CACHE_MAX_BYTES is not an int")
            max_bytes = 2 << 30
    try:
        names = os.listdir(cache_dir())
    except OSError:
        return 0
    entries = []
    for n in names:
        p = os.path.join(cache_dir(), n)
        try:
            if n.endswith(".jaxexec.tmp"):
                # Orphan from a writer killed mid-pickle (bench's os._exit
                # deadline path can land there) — same leak, tmp suffix.
                # An hour of grace covers any live writer's dump().
                if time.time() - os.path.getmtime(p) > 3600:
                    os.remove(p)
                continue
            if n.endswith(".jaxexec"):
                entries.append((os.path.getmtime(p), os.path.getsize(p), p))
        except OSError:
            continue
    total = sum(s for _, s, _ in entries)
    freed = 0
    for _, size, path in sorted(entries):  # oldest first
        if total - freed <= max_bytes:
            break
        if keep and os.path.abspath(path) == os.path.abspath(keep):
            continue
        try:
            os.remove(path)
            freed += size
        except OSError:
            pass
    return freed


def cached_match_pair(cfg, left, right):
    """The standard pipeline entry, AOT-cached: returns (callable, source).

    One canonical key scheme for every tool (bench, serve, sweeps) — a
    drifted key_parts in one call site would silently fork the on-disk
    cache namespace.

    Inputs may be uint8 (the serving wire format): the widen to float32
    happens on device inside the compiled program.  For float32 inputs the
    astype is an identity the compiler erases, so the f32 cache key and
    executable are unchanged."""
    from ..models import pipeline

    def entry(l, r):
        return pipeline.match_pair(
            l.astype(jnp.float32), r.astype(jnp.float32), cfg
        )

    return compile_cached(
        entry, (left, right), key_parts=("match_pair", cfg.config_hash())
    )


def cached_match_pair_with_confidence(cfg, left, right):
    """AOT-cached ``pipeline.match_pair_with_confidence`` entry:
    (callable returning (disp, uniq_pct, lr_valid), source).  Same key
    scheme as the other entries; shared by the serving daemon's
    confidence response mode and tools/refuse_curve.py."""
    from ..models import pipeline

    def entry(l, r):
        return pipeline.match_pair_with_confidence(
            l.astype(jnp.float32), r.astype(jnp.float32), cfg
        )

    return compile_cached(
        entry, (left, right),
        key_parts=("match_pair_conf", cfg.config_hash()),
    )


def cached_match_batch(cfg, lefts, rights):
    """Batched-pipeline analog of ``cached_match_pair``: (callable, source).

    Same canonical key scheme (kind tag + config hash + shapes/dtypes);
    uint8 wire inputs widen to float32 on device."""
    from ..models import pipeline

    def entry(l, r):
        return pipeline.match_batch(
            l.astype(jnp.float32), r.astype(jnp.float32), cfg
        )

    return compile_cached(
        entry, (lefts, rights), key_parts=("match_batch", cfg.config_hash())
    )


def compile_cached(fn, args, key_parts, *, static_key: str | None = None):
    """AOT-compile ``fn(*args)`` with disk caching.

    Returns ``(callable, source)`` where source is
    "aot-cache" | "compile" | "jit".  The callable has the same signature
    as ``fn``.  On cache miss, compiles via
    ``jax.jit(fn).lower(*args).compile()``, saves, and returns the compiled
    executable directly (no double compile).

    Off-TPU the disk cache is bypassed entirely (plain ``jax.jit``): the
    cache exists for the multi-minute Mosaic compile; CPU compiles are
    fast, CPU runs are the multi-device virtual-mesh test environment
    (where a deserialized executable binds the wrong topology), and plain
    jit additionally tolerates shape retraces.
    """
    if jax.default_backend() != "tpu":
        return jax.jit(fn), "jit"
    key = static_key or cache_key(
        *key_parts, *[(tuple(a.shape), str(a.dtype)) for a in args]
    )
    loaded = load(key)
    if loaded is not None:
        return loaded, "aot-cache"
    compiled = jax.jit(fn).lower(*args).compile()
    save(key, compiled)
    return compiled, "compile"
