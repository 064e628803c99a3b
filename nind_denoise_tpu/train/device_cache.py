"""Device-resident training data path: HBM crop cache + on-device augs.

The reference feeds training from a torch DataLoader that decodes crops on
host CPU workers every epoch (/root/reference/src/nind_denoise/
dataset_torch_3.py:195-274 + nn_train.py:239-240). On this deployment the
host-side feed cannot keep up with the chip: the round-4 on-chip training
record measured ~7-14 s/epoch wall for ~0.3 s of device step time — the
tunnel-fed ``train/dataset.Loader`` is 20-40x off the step rate (PERF.md).

This module removes the host from the steady-state loop entirely:

* a configurable shard of the crop set lives in HBM as two stacked
  ``(N, cs, cs, 3)`` arrays (clean, noisy) — utnet-simple production crops
  are 168 x 168 x 3 x 2 B ~ 170 KB each in float16, so tens of thousands
  fit alongside the model;
* the reference's per-item augmentation — rot90 x k, two flips, exposure
  multiplier ``exp_mult ~ U[min, min(max, 1/x.max())]`` applied unclipped
  to x and clipped to y (dataset_torch_3.py:249-274) — runs INSIDE one
  jitted sampler: gather a batch by index, augment, hand the arrays
  straight to the train step. Zero host bytes per step;
* the cache refreshes ASYNCHRONOUSLY: a background thread re-rolls
  ISO-pair choices and crop positions on host (``DenoisingDataset``
  randomness, decode amortized by its image cache) while the device
  trains, and the refreshed block is uploaded once per swap interval at
  an epoch boundary — a bounded, tunable wire cost instead of
  bytes-per-step.

JPEG-compression and Gaussian-noise augmentation (host-side codecs) are
not representable on device; datasets using them must keep the host
loader (``supports`` returns False).

Augmentation-statistics parity with the host pipeline is pinned in
tests/test_device_cache.py (orientation uniformity, flip rates, exp_mult
bounds/clipping semantics against ``DenoisingDataset``'s own outputs).
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import numpy as np

# crops per device_put chunk during cache (re)fills: keeps individual
# transfers >= ~24 MB (per-RPC latency dominates below; CLAUDE.md) without
# materializing the whole shard twice on host
_PUT_CHUNK_BYTES = 64 << 20


def supports(dataset) -> bool:
    """Whether ``dataset``'s augmentation set is representable on device
    (rot90/flips/exp_mult yes; JPEG-compression / Gaussian-noise augs need
    host codecs)."""
    return (getattr(dataset, "compressionmin", 100) >= 100
            and getattr(dataset, "sigmamax", 0) == 0
            and hasattr(dataset, "load_pair"))


_JITTED: dict = {}


def _sample_batch_fn():
    """Jitted epoch sampler (built lazily so importing this module never
    touches the backend).

    Gathers batch ``step`` of the epoch permutation and augments on
    device. Augmentation semantics mirror DenoisingDataset.__getitem__
    (train/dataset.py, reference dataset_torch_3.py:249-274):
      * rot90 by k ~ U{0..3} (same k for clean and noisy),
      * vertical flip w.p. 1/2, horizontal flip w.p. 1/2 (independent),
      * exp_mult ~ U[min, min(max, 1/x.max())]; x scales UNclipped, y
        scales then clips to [0, 1].
    Returns float32 NHWC (clean, noisy) ready for the train step.
    """
    if "sample" in _JITTED:
        return _JITTED["sample"]
    import jax
    import jax.numpy as jnp

    def sample(cache_x, cache_y, perm, step, key, exp_mult_min,
               exp_mult_max, bs: int):
        idxs = jax.lax.dynamic_slice(perm, (step * bs,), (bs,))
        x = cache_x[idxs].astype(jnp.float32)   # (bs, cs, cs, 3)
        y = cache_y[idxs].astype(jnp.float32)
        kr, kv, kh, ke = jax.random.split(key, 4)
        nrot = jax.random.randint(kr, (bs,), 0, 4)
        fv = jax.random.bernoulli(kv, 0.5, (bs,))
        fh = jax.random.bernoulli(kh, 0.5, (bs,))
        u = jax.random.uniform(ke, (bs,))

        def aug_one(xi, yi, k, v, h_, ui):
            def rot(a):
                return jax.lax.switch(k, [
                    lambda t: t,
                    lambda t: jnp.rot90(t, 1, (0, 1)),
                    lambda t: jnp.rot90(t, 2, (0, 1)),
                    lambda t: jnp.rot90(t, 3, (0, 1)),
                ], a)

            xi, yi = rot(xi), rot(yi)
            xi = jnp.where(v, xi[::-1], xi)
            yi = jnp.where(v, yi[::-1], yi)
            xi = jnp.where(h_, xi[:, ::-1], xi)
            yi = jnp.where(h_, yi[:, ::-1], yi)
            # exp_mult upper bound tracks the CLEAN crop's max exactly like
            # the host path (rot/flip preserve the max, so pre-aug max ==
            # post-aug max)
            hi = jnp.minimum(exp_mult_max, 1.0 / jnp.maximum(xi.max(), 1e-8))
            em = exp_mult_min + ui * (hi - exp_mult_min)
            xi = xi * em
            yi = jnp.clip(yi * em, 0.0, 1.0)
            return xi, yi

        x, y = jax.vmap(aug_one)(x, y, nrot, fv, fh, u)
        return x, y

    _JITTED["sample"] = jax.jit(sample, static_argnames=("bs",))
    return _JITTED["sample"]


def _scatter_block(cache, block, offset):
    """In-place (donated) replacement of ``block.shape[0]`` consecutive
    cache rows starting at ``offset`` — the incremental refresh update."""
    if "scatter" not in _JITTED:
        import jax
        import jax.lax as lax

        _JITTED["scatter"] = jax.jit(
            lambda c, b, o: lax.dynamic_update_slice(
                c, b, (o,) + (0,) * (c.ndim - 1)),
            donate_argnums=(0,))
    return _JITTED["scatter"](cache, block, offset)


class DeviceEpochCache:
    """HBM-resident shard of (clean, noisy) crop pairs with on-device augs.

    ``capacity``: crops held on device (<= len(dataset) uses the whole
    set). ``refresh_frac``: fraction of the cache re-rolled (new ISO pair
    choice + crop position, host-decoded) and re-uploaded per epoch
    boundary — 0 disables refresh (augs alone re-randomize every epoch;
    pair/crop choices freeze after the initial fill). ``cache_dtype``:
    HBM storage dtype — float16 halves footprint and refresh wire bytes
    (~1e-4 quantization on [0,1] content, below bf16 compute noise);
    float32 for strict parity runs.
    """

    def __init__(self, dataset, capacity: int, *, seed: int = 0,
                 cache_dtype: str = "float16", refresh_frac: float = 0.25,
                 threads: int = 2):
        import jax

        if not supports(dataset):
            raise ValueError(
                "DeviceEpochCache: dataset uses host-only augmentation "
                "(JPEG compression / Gaussian noise) or lacks load_pair")
        self.dataset = dataset
        self.n = min(capacity, len(dataset))
        self.cs = dataset.cs
        self.exp_mult_min = float(getattr(dataset, "exp_mult_min", 1.0))
        self.exp_mult_max = float(getattr(dataset, "exp_mult_max", 1.0))
        self._dtype = np.dtype(cache_dtype)
        self._rng = np.random.default_rng(seed)
        self._threads = max(1, threads)
        self._refresh_rows = (max(1, int(round(self.n * refresh_frac)))
                              if refresh_frac > 0 else 0)
        self._pending: Optional[Tuple[np.ndarray, np.ndarray, int]] = None
        self._pending_lock = threading.Lock()
        self._refresher: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._next_offset = 0
        # initial fill: every cache row is a fresh dataset draw (the
        # dataset's own rng picks the ISO pair; crop position re-rolls per
        # call). Uploads go in >= _PUT_CHUNK_BYTES chunks on THIS thread
        # (device puts stay on one thread — CLAUDE.md transfer rule).
        xs, ys = self._load_rows(self.n)
        self.cache_x = self._put_chunked(xs)
        self.cache_y = self._put_chunked(ys)
        del xs, ys
        self.uploaded_rows = self.n  # telemetry: total rows ever uploaded
        self.swaps = 0

    # -- host side -------------------------------------------------------

    def _load_rows(self, count: int) -> Tuple[np.ndarray, np.ndarray]:
        """Decode ``count`` fresh (clean, noisy) pairs (threaded; the
        dataset's image cache makes repeat decodes cheap) -> NHWC arrays
        in the cache dtype."""
        idxs = [int(i % len(self.dataset)) for i in
                self._rng.permutation(max(count, len(self.dataset)))[:count]]
        xs = np.empty((count, self.cs, self.cs, 3), self._dtype)
        ys = np.empty_like(xs)

        def load_span(lo, hi):
            for j in range(lo, hi):
                c, n = self.dataset.load_pair(idxs[j])
                xs[j] = c.transpose(1, 2, 0)
                ys[j] = n.transpose(1, 2, 0)

        if self._threads == 1 or count < 8:
            load_span(0, count)
        else:
            span = -(-count // self._threads)
            ts = [threading.Thread(target=load_span,
                                   args=(t * span, min(count, (t + 1) * span)))
                  for t in range(self._threads)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        return xs, ys

    def _put_chunked(self, arr: np.ndarray):
        import jax
        import jax.numpy as jnp

        rows_per = max(1, _PUT_CHUNK_BYTES
                       // max(1, arr[0].nbytes))
        if rows_per >= arr.shape[0]:
            return jax.device_put(arr)
        parts = [jax.device_put(arr[i:i + rows_per])
                 for i in range(0, arr.shape[0], rows_per)]
        return jnp.concatenate(parts, axis=0)

    # -- async refresh ---------------------------------------------------

    def start_refresh(self):
        """Kick the background re-roll of the next block (host decode only;
        no device work happens off this object's owner thread)."""
        if self._refresh_rows <= 0 or self._refresher is not None:
            return

        def work():
            rows = min(self._refresh_rows, self.n)
            xs, ys = self._load_rows(rows)
            with self._pending_lock:
                self._pending = (xs, ys, self._next_offset)
            self._next_offset = (self._next_offset + rows) % self.n

        self._refresher = threading.Thread(target=work, daemon=True)
        self._refresher.start()

    def maybe_swap(self) -> bool:
        """Epoch-boundary: if a refreshed block is ready, upload it (this
        thread) and scatter it into the donated cache. Returns True when a
        swap happened. Never blocks on the refresher — a slow host
        degrades to aug-only re-randomization, not a stalled chip."""
        if self._refresher is not None and not self._refresher.is_alive():
            self._refresher = None
        with self._pending_lock:
            pending, self._pending = self._pending, None
        if pending is None:
            return False
        xs, ys, offset = pending
        rows = xs.shape[0]
        if offset + rows <= self.n:
            self.cache_x = _scatter_block(self.cache_x,
                                          self._put_chunked(xs),
                                          np.int32(offset))
            self.cache_y = _scatter_block(self.cache_y,
                                          self._put_chunked(ys),
                                          np.int32(offset))
        else:  # wrap: two scatters
            head = self.n - offset
            for off, sl in ((offset, slice(0, head)), (0, slice(head, rows))):
                self.cache_x = _scatter_block(self.cache_x,
                                              self._put_chunked(xs[sl]),
                                              np.int32(off))
                self.cache_y = _scatter_block(self.cache_y,
                                              self._put_chunked(ys[sl]),
                                              np.int32(off))
        self.uploaded_rows += rows
        self.swaps += 1
        return True

    # -- epoch iteration -------------------------------------------------

    def epoch_batches(self, batch_size: int, key):
        """Yield ``(clean, noisy)`` device batches for one epoch: one tiny
        perm upload, then one sampler dispatch per step (drop_last
        semantics like train/dataset.Loader)."""
        import jax

        nb = self.n // batch_size
        perm = jax.device_put(
            self._rng.permutation(self.n).astype(np.int32))
        sample = _sample_batch_fn()
        for step in range(nb):
            key, sub = jax.random.split(key)
            yield sample(self.cache_x, self.cache_y, perm, step, sub,
                         np.float32(self.exp_mult_min),
                         np.float32(self.exp_mult_max), bs=batch_size)

    def __len__(self):
        return self.n
