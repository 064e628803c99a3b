"""Threaded chunked host<->device transfers.

The deployment link moves ~35-50 MB/s single-stream but ~55-60 MB/s with
concurrent chunk streams (measured; the tunnel multiplexes). These helpers
split large arrays along axis 0 and move the chunks from a small thread pool
— transfers release the GIL, so this also overlaps with host-side work.
"""

from __future__ import annotations

import concurrent.futures as _fut
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

_POOL: Optional[_fut.ThreadPoolExecutor] = None
N_STREAMS = 8
MIN_CHUNK_BYTES = 4 << 20


def _pool() -> _fut.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = _fut.ThreadPoolExecutor(max_workers=N_STREAMS)
    return _POOL


def _nchunks(nbytes: int, n0: int) -> int:
    return max(1, min(n0, nbytes // MIN_CHUNK_BYTES))


def fast_put(arr: np.ndarray, device=None) -> jax.Array:
    """Threaded chunked host->device put; returns a device array
    (concatenated on device)."""
    n = _nchunks(arr.nbytes, N_STREAMS)
    if n == 1:
        return jax.device_put(arr, device)
    rows = arr.shape[0]
    step = math.ceil(rows / n)
    chunks = [arr[i * step:(i + 1) * step] for i in range(n) if i * step < rows]
    futs = [_pool().submit(jax.device_put, c, device) for c in chunks]
    parts = [f.result() for f in futs]
    return jnp.concatenate(parts, axis=0)


def fast_get(arr: jax.Array) -> np.ndarray:
    """Threaded chunked device->host fetch."""
    n = _nchunks(arr.nbytes, N_STREAMS)
    if n == 1:
        return np.asarray(arr)
    rows = arr.shape[0]
    step = math.ceil(rows / n)
    slices = [arr[i * step:(i + 1) * step] for i in range(n) if i * step < rows]
    futs = [_pool().submit(np.asarray, s) for s in slices]
    return np.concatenate([f.result() for f in futs], axis=0)


class AsyncFetcher:
    """Queue device arrays for background fetch; collect in order.

    Chunk futures are submitted FLAT into the pool (never nest a fetch that
    itself submits to the same pool — with all workers busy in outer tasks
    the inner chunk futures can never run: deadlock)."""

    def __init__(self):
        self._bands: List[List[_fut.Future]] = []

    def submit(self, arr: jax.Array) -> None:
        n = _nchunks(arr.nbytes, N_STREAMS)
        rows = arr.shape[0]
        step = math.ceil(rows / n)
        futs = [_pool().submit(np.asarray, arr[i * step:(i + 1) * step])
                for i in range(n) if i * step < rows]
        self._bands.append(futs)

    def collect(self) -> List[np.ndarray]:
        out = []
        for futs in self._bands:
            parts = [f.result() for f in futs]
            out.append(np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0])
        self._bands = []
        return out
