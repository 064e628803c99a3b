"""Property-based identity invariants for the DEVICE-side stitch engines.

tests/test_tiles_property.py pins the HOST geometry; these pin the on-device
formulation (engine/device_stitch.py: iota-built feather masks, fori_loop
scatter-add) and each engine's banding/bucketing around it. With an IDENTITY
forward, every engine must reproduce its input exactly for arbitrary image
sizes — which exercises the clamped last band, dummy-tile descriptor rows,
bucketed program padding, and per-device chunk splits of the sharded engine
on the virtual 8-device mesh, none of which depend on a real model.

(The adversarial fixed-shape sweeps vs the torch oracle live in
tests/test_golden_e2e.py; these search the shape space instead.)
"""

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

jax = pytest.importorskip("jax")

from nind_denoise_tpu.core.tiles import TilePlan
from nind_denoise_tpu.engine.tile_engine import TileEngine

IDENT = lambda p, x: x


@st.composite
def geometry(draw):
    cs = draw(st.sampled_from([16, 24, 32, 48]))
    pad2 = draw(st.sampled_from([0, 4, 8]))
    ucs = cs - pad2
    ol = draw(st.integers(0, min(ucs // 2, 6)))
    h = draw(st.integers(8, 100))
    w = draw(st.integers(8, 100))
    try:
        TilePlan(h, w, cs, ucs, ol)
    except ValueError:
        assume(False)
    seed = draw(st.integers(0, 2**31 - 1))
    img = np.random.default_rng(seed).random((h, w, 3), dtype=np.float32)
    return cs, ucs, ol, img


@settings(max_examples=12, deadline=None)
@given(geometry())
def test_tile_engine_identity(case):
    cs, ucs, ol, img = case
    eng = TileEngine(IDENT, params={}, cs=cs, ucs=ucs, ol=ol, batch_size=3,
                     compute_dtype="float32")
    out = eng.denoise_raw(img, 1.0, out_dtype="float32")
    np.testing.assert_allclose(out, img, atol=2e-6)


@settings(max_examples=10, deadline=None)
@given(geometry())
def test_sharded_engine_identity(case):
    from nind_denoise_tpu.parallel.sharded_engine import ShardedTileDenoiser

    cs, ucs, ol, img = case
    assume(jax.device_count() >= 8)  # conftest's virtual CPU mesh
    sh = ShardedTileDenoiser(IDENT, params={}, cs=cs, ucs=ucs, ol=ol,
                             tiles_per_device=2, compute_dtype="float32")
    out = np.asarray(sh.denoise_hwc(img))
    np.testing.assert_allclose(out, img, atol=2e-6)


@settings(max_examples=8, deadline=None)
@given(geometry(), st.integers(1, 8))
def test_batch_engine_identity(case, nimg):
    from nind_denoise_tpu.parallel.batch_engine import DeviceBatchDenoiser

    cs, ucs, ol, img = case
    assume(jax.device_count() >= 8)
    imgs = np.stack([np.roll(img, i, axis=0) for i in range(nimg)])
    be = DeviceBatchDenoiser(IDENT, params={}, cs=cs, ucs=ucs, ol=ol,
                             tiles_per_dispatch=2, compute_dtype="float32")
    out = np.asarray(be.denoise_batch(imgs, 1.0))
    np.testing.assert_allclose(out, imgs, atol=2e-6)
