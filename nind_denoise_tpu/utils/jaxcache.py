"""Persistent XLA compilation cache for CLI cold starts.

UtNet(funit=64) tile programs take 30-120 s to compile through the remote
tunnel; with the on-disk cache a repeat invocation loads in ~2 s (measured:
single_tile bench 119 s -> 33 s end-to-end). The reference pays its warmup
on every denoise.py run (torch has no cross-process kernel cache for this
path); here it is a one-time cost per (program shape, jaxlib) pair.

Must run BEFORE the first jax import in the process to take effect via the
environment; after-import it falls back to jax.config.update. Disable with
``NIND_JAX_CACHE=0`` (e.g. if a wedged tunnel ever corrupts an entry —
delete the dir to recover; entries are content-addressed so this is safe).
"""

from __future__ import annotations

import hashlib
import os
import platform

_BASE_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                         "nind_denoise_tpu", "jax")


def _host_tag() -> str:
    """Fingerprint of the host CPU's feature set. XLA's cache key does NOT
    cover the CPU features its :CPU AOT executables were tuned for, so a
    cache directory that outlives a container migration to a different
    machine serves stale executables that crash with SIGILL (observed
    2026-08-18: entries carrying +prefer-no-scatter/+prefer-no-gather from
    a previous host killed a worker on this one). Keying the default dir
    by the cpuinfo flags line makes each machine population disjoint; TPU
    entries re-compile once per host, which the remote-compile economics
    absorb."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    digest = hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"{platform.machine()}-{digest}"
    except OSError:
        pass
    return platform.machine() or "unknown"


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory (idempotent).
    Returns the directory in effect, or None when disabled. The default
    location is keyed per host CPU (see _host_tag); an explicit
    ``cache_dir`` or a pre-set JAX_COMPILATION_CACHE_DIR is respected
    verbatim (callers/env managing their own placement own its hygiene)."""
    if os.environ.get("NIND_JAX_CACHE", "1") in ("0", "false", "no"):
        return None
    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.join(_BASE_DIR, _host_tag()))
    os.makedirs(d, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", d)
    import sys

    if "jax" in sys.modules:  # too late for the env var: use the config API
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", d)
        except Exception:
            return None
    return d
