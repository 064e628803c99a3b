"""Tile-parallel sharded inference over the 8-device CPU mesh must match the
single-device engine exactly."""

import numpy as np
import jax

from nind_denoise_tpu.engine.tile_engine import TileEngine
from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.parallel.sharded_engine import ShardedTileDenoiser


def test_sharded_matches_single_device():
    params = UtNet.init(jax.random.PRNGKey(0), funit=2)
    apply_fn = lambda p, x: UtNet.apply(p, x)
    rng = np.random.default_rng(0)
    img = rng.random((150, 170, 3), dtype=np.float32)

    single = TileEngine(apply_fn, params, cs=104, ucs=88, ol=6, batch_size=4,
                        compute_dtype="float32")
    ref = single.denoise_hwc(img)

    sharded = ShardedTileDenoiser(apply_fn, params, cs=104, ucs=88, ol=6,
                                  tiles_per_device=1)
    got = sharded.denoise_hwc(img)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_sharded_identity_reconstructs():
    sharded = ShardedTileDenoiser(lambda p, x: x, {}, cs=64, ucs=48, ol=4,
                                  tiles_per_device=2)
    rng = np.random.default_rng(1)
    img = rng.random((100, 130, 3), dtype=np.float32)
    out = sharded.denoise_hwc(img)
    np.testing.assert_allclose(out, img, atol=1e-6)
