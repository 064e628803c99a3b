"""Direct unit tests for engine/transfer.py (threaded chunked transfers).

The module is exercised end-to-end by every engine test; these pin its own
contracts — chunk-count math, multi-chunk fetch equality, in-order collect,
preallocated-out row placement — so a refactor cannot silently change the
transfer geometry the engines rely on.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nind_denoise_tpu.engine import transfer


def test_nchunks_boundaries():
    mb = transfer.MIN_CHUNK_BYTES
    assert transfer._nchunks(0, transfer.N_STREAMS) == 1
    assert transfer._nchunks(mb - 1, transfer.N_STREAMS) == 1
    assert transfer._nchunks(2 * mb, transfer.N_STREAMS) == 2
    # capped at the stream count no matter how large
    assert transfer._nchunks(1000 * mb, transfer.N_STREAMS) == transfer.N_STREAMS


def test_fast_get_multichunk_equals_asarray():
    """> 2x MIN_CHUNK_BYTES so the threaded multi-chunk path engages; the
    reassembled fetch must equal the plain copy bit-for-bit."""
    n_rows = (2 * transfer.MIN_CHUNK_BYTES) // (1024 * 4) + 7  # odd tail row
    arr = jnp.asarray(
        np.random.default_rng(0).random((n_rows, 1024), dtype=np.float32))
    got = transfer.fast_get(arr)
    np.testing.assert_array_equal(got, np.asarray(arr))


def test_async_fetcher_in_order_without_out():
    f = transfer.AsyncFetcher()
    bands = [jnp.full((3, 4), i, jnp.float32) for i in range(5)]
    for b in bands:
        f.submit(b)
    out = f.collect()
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b, np.full((3, 4), i, np.float32))
    assert f.collect() == []  # drained


def test_async_fetcher_writes_rows_into_out():
    rng = np.random.default_rng(1)
    src = rng.random((32, 7, 3)).astype(np.float32)
    result = np.zeros_like(src)
    f = transfer.AsyncFetcher(out=result)
    # uneven band split incl. a 1-row band
    row0 = 0
    for h in (5, 1, 11, 15):
        f.submit(jnp.asarray(src[row0:row0 + h]), row0=row0)
        row0 += h
    f.collect()
    np.testing.assert_array_equal(result, src)


def test_put_future_returns_device_array_of_builder_value():
    src = np.arange(24, dtype=np.float32).reshape(4, 6)
    fut = transfer.submit_put(lambda: src.copy())
    dev = fut.result()
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(np.asarray(dev), src)
