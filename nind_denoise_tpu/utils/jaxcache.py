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

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "nind_denoise_tpu", "jax")


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory (idempotent).
    Returns the directory in effect, or None when disabled."""
    if os.environ.get("NIND_JAX_CACHE", "1") in ("0", "false", "no"):
        return None
    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or _DEFAULT_DIR)
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
