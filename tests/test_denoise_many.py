"""Cross-image coalescing (TileEngine.denoise_many): a same-shape group
denoised as one tile stream must match the per-image path bit-for-bit —
the stacked band/canvas trick is pure coordinate offsets over the very same
step program, so any divergence is a geometry bug, not float noise."""

import numpy as np
import jax
import pytest

from nind_denoise_tpu.engine.tile_engine import AdaptiveEngine, TileEngine
from nind_denoise_tpu.models.utnet import UtNet


@pytest.fixture(scope="module")
def utnet_params():
    return UtNet.init(jax.random.PRNGKey(0), funit=4)


def _identity_engine(**kw):
    kw.setdefault("batch_size", 3)
    return TileEngine(lambda p, x: x, params={}, cs=64, ucs=48, ol=4,
                      compute_dtype="float32", **kw)


def _imgs(n, h, w, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    if dtype == np.float32:
        return [rng.random((h, w, 3), dtype=np.float32) for _ in range(n)]
    info = np.iinfo(dtype)
    return [rng.integers(0, info.max, (h, w, 3), dtype=dtype)
            for _ in range(n)]


def test_identity_group_reconstructs():
    eng = _identity_engine()
    imgs = _imgs(3, 100, 130)
    out = eng.denoise_many(imgs, 1.0, out_dtype="float32")
    assert out.shape == (3, 100, 130, 3)
    for i, im in enumerate(imgs):
        np.testing.assert_allclose(out[i], im, atol=1e-6)


def test_group_matches_per_image_bitexact(utnet_params):
    """The headline exactness claim: coalesced == serial, bit-for-bit
    (same band values, same tile batch shapes, same scatter order)."""
    eng = TileEngine(lambda p, x: UtNet.apply(p, x), utnet_params,
                     cs=104, ucs=88, ol=6, batch_size=4,
                     compute_dtype="float32")
    imgs = _imgs(3, 150, 170, seed=1)
    got = eng.denoise_many(imgs, 1.0, out_dtype="float32")
    for i, im in enumerate(imgs):
        ref = eng.denoise_raw(im, 1.0, out_dtype="float32")
        np.testing.assert_array_equal(got[i], ref)


def test_group_batches_cross_image_boundaries(utnet_params):
    """2 images x 2 tiles with batch 4 must run ONE step dispatch where the
    serial path needs two underfilled ones — the point of coalescing."""
    eng = TileEngine(lambda p, x: UtNet.apply(p, x), utnet_params,
                     cs=104, ucs=88, ol=6, batch_size=4,
                     compute_dtype="float32")
    imgs = _imgs(2, 88, 150, seed=2)  # 1x2 grid each (H == ucs: one row)
    calls = {"n": 0}
    real = eng._step

    def counting_step(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    eng._step = counting_step
    got = eng.denoise_many(imgs, 1.0, out_dtype="float32")
    assert calls["n"] == 1
    eng._step = real
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(
            got[i], eng.denoise_raw(im, 1.0, out_dtype="float32"))


def test_group_size_buckets_bound_programs():
    """Group sizes bucket to powers of two, so N=3 must reuse the N=4
    program (dummy slots dispatch no tiles)."""
    eng = _identity_engine()
    eng.denoise_many(_imgs(4, 100, 130), 1.0)
    n0 = eng._step._cache_size()
    out = eng.denoise_many(_imgs(3, 100, 130, seed=5), 1.0)
    assert eng._step._cache_size() == n0
    assert out.shape[0] == 3


def test_storage_dtypes_and_quantize(utnet_params):
    """uint16 in / uint8 out through the coalesced path equals the
    per-image path exactly (shared quantize program)."""
    eng = TileEngine(lambda p, x: UtNet.apply(p, x), utnet_params,
                     cs=104, ucs=88, ol=6, batch_size=4,
                     compute_dtype="float32")
    imgs = _imgs(2, 120, 140, seed=3, dtype=np.uint16)
    got = eng.denoise_many(imgs, 65535.0, out_dtype="uint8")
    assert got.dtype == np.uint8
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(
            got[i], eng.denoise_raw(im, 65535.0, out_dtype="uint8"))


def test_device_out_dtype_returns_views(utnet_params):
    eng = TileEngine(lambda p, x: UtNet.apply(p, x), utnet_params,
                     cs=104, ucs=88, ol=6, batch_size=4,
                     compute_dtype="float32")
    imgs = _imgs(2, 100, 150, seed=4)
    outs = eng.denoise_many(imgs, 1.0, out_dtype="device")
    assert isinstance(outs, list) and len(outs) == 2
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(
            np.asarray(outs[i]),
            eng.denoise_raw(im, 1.0, out_dtype="float32"))


def test_mixed_shapes_raise():
    eng = _identity_engine()
    with pytest.raises(ValueError, match="share shape"):
        eng.denoise_many([np.zeros((100, 130, 3), np.float32),
                          np.zeros((100, 131, 3), np.float32)], 1.0)


def test_group_budget_raises():
    eng = _identity_engine()
    eng.MAX_GROUP_SUBPIXELS = 1  # force the guard
    with pytest.raises(ValueError, match="MAX_GROUP_SUBPIXELS"):
        eng.denoise_many(_imgs(2, 100, 130), 1.0)


# -- AdaptiveEngine wrapper ---------------------------------------------------


def test_adaptive_group_coalesces(utnet_params, monkeypatch):
    """Underfilled same-shape groups must take the COALESCED path (proved
    by counting TileEngine.denoise_many calls, so a silent serial fallback
    cannot masquerade as coalescing — review r3) and match the per-image
    results exactly."""
    ada = AdaptiveEngine("UtNet", utnet_params, cs=104, ucs=88,
                         compute_dtype="float32", batch_size=8)
    imgs = _imgs(3, 150, 170, seed=6)  # 2x2 grid = 4 tiles < batch 8
    calls = {"n": 0}
    real = TileEngine.denoise_many

    def counting(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(TileEngine, "denoise_many", counting)
    got = ada.denoise_many(imgs, 1.0, out_dtype="float32")
    assert calls["n"] == 1
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(
            got[i], ada.denoise_raw(im, 1.0, out_dtype="float32"))


def test_adaptive_full_batches_stay_serial(utnet_params, monkeypatch):
    """Images whose tile count already fills the batch gain nothing from
    coalescing and LOSE the streamed path's upload/compute overlap, so the
    policy must keep them per-image (review r3)."""
    ada = AdaptiveEngine("UtNet", utnet_params, cs=104, ucs=88,
                         compute_dtype="float32", batch_size=4)

    def boom(self, *a, **kw):
        raise AssertionError("coalesced path must not engage")

    monkeypatch.setattr(TileEngine, "denoise_many", boom)
    imgs = _imgs(2, 150, 170, seed=10)  # 2x2 grid = 4 tiles == batch 4
    got = ada.denoise_many(imgs, 1.0, out_dtype="float32")
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(
            got[i], ada.denoise_raw(im, 1.0, out_dtype="float32"))


def test_adaptive_group_mixed_shapes_fall_back(utnet_params):
    """Mixed shapes must still produce correct per-image results (serial
    fallback) for BOTH 'device' (list) and host dtypes (list — the shapes
    cannot stack; review r3 found np.stack crashing here)."""
    ada = AdaptiveEngine("UtNet", utnet_params, cs=104, ucs=88,
                         compute_dtype="float32", batch_size=4)
    imgs = [_imgs(1, 150, 170, seed=7)[0], _imgs(1, 120, 140, seed=8)[0]]
    got = ada.denoise_many(imgs, 1.0, out_dtype="device")
    for o, im in zip(got, imgs):
        np.testing.assert_array_equal(
            np.asarray(o), ada.denoise_raw(im, 1.0, out_dtype="float32"))
    host = ada.denoise_many(imgs, 1.0, out_dtype="float32")
    assert isinstance(host, list) and len(host) == 2
    for o, im in zip(host, imgs):
        np.testing.assert_array_equal(
            o, ada.denoise_raw(im, 1.0, out_dtype="float32"))


def test_adaptive_group_tiny_falls_back(utnet_params):
    """Below the minimum tiling the group takes the per-image tiny path."""
    ada = AdaptiveEngine("UtNet", utnet_params, cs=104, ucs=88,
                         compute_dtype="float32", batch_size=4)
    imgs = _imgs(2, 33, 47, seed=9)
    got = ada.denoise_many(imgs, 1.0, out_dtype="float32")
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(
            got[i], ada.denoise_raw(im, 1.0, out_dtype="float32"))
