"""Tile-parallel sharded inference over the 8-device CPU mesh must match the
single-device engine exactly, and its communication volume must be
proportional to the canvas (row-band ownership), not canvas x rounds."""

import numpy as np
import jax

from nind_denoise_tpu.core.tiles import TilePlan
from nind_denoise_tpu.engine.tile_engine import TileEngine
from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.parallel import sharded_engine as se
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


def test_sharded_uneven_grid_bitmatch():
    """Uneven grid (partial edge tiles, ntiles not divisible by ndev, chunk
    boundaries splitting mid-row) must still bit-match the single engine."""
    params = UtNet.init(jax.random.PRNGKey(1), funit=2)
    apply_fn = lambda p, x: UtNet.apply(p, x)
    rng = np.random.default_rng(2)
    img = rng.random((211, 301, 3), dtype=np.float32)  # 4x7 grid = 28 tiles

    single = TileEngine(apply_fn, params, cs=104, ucs=88, ol=6, batch_size=4,
                        compute_dtype="float32")
    ref = single.denoise_hwc(img)

    sharded = ShardedTileDenoiser(apply_fn, params, cs=104, ucs=88, ol=6,
                                  tiles_per_device=2)
    got = sharded.denoise_hwc(img)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_sharded_communication_bound():
    """Bytes moved are proportional to the canvas plus O(ndev) overlap rows,
    and do NOT grow with the number of per-device rounds."""
    cs, ucs, ol = 64, 48, 4
    rng = np.random.default_rng(3)
    img = rng.random((300, 340, 3), dtype=np.float32)  # 7x8 grid = 56 tiles
    plan = TilePlan(img.shape[0], img.shape[1], cs, ucs, ol)
    w_in = plan.grid_w + 2 * plan.pad
    h_in = plan.grid_h + 2 * plan.pad

    # 56 tiles / 8 devices = 7 per device; tpd 1 vs 7 keeps the chunk layout
    # identical while changing the per-device round count 7x
    by_tpd = {}
    for tpd in (1, 7):
        eng = ShardedTileDenoiser(lambda p, x: x, {}, cs=cs, ucs=ucs, ol=ol,
                                  tiles_per_device=tpd)
        out = eng.denoise_hwc(img)
        np.testing.assert_allclose(out, img, atol=1e-6)
        by_tpd[tpd] = (eng.last_bytes_uploaded, eng.last_bytes_downloaded)
        ndev = eng.ndev
        # upload: padded image + per-device band overlap (each band re-reads
        # at most 2*stride + cs extra rows) + program-bucketing slack
        # (H_BUCKET rows / W_BUCKET cols, sharded_engine.py) + descriptors
        up_bound = (h_in + ndev * (2 * plan.stride + cs + se.H_BUCKET)) \
            * se._bucket(w_in, se.W_BUCKET) * 3 * 4 \
            + (plan.ntiles + ndev * tpd * 4) * 8 * 2 * 4
        # download: canvas + per-device band overlap rows + bucket slack
        down_bound = (plan.grid_h + ndev * (2 * plan.stride + ucs
                                            + se.H_BUCKET)) \
            * se._bucket(plan.grid_w, se.W_BUCKET) * 3 * 4
        assert eng.last_bytes_uploaded <= up_bound, \
            (eng.last_bytes_uploaded, up_bound)
        assert eng.last_bytes_downloaded <= down_bound, \
            (eng.last_bytes_downloaded, down_bound)

    # round count changed 7x between tpd=1 and tpd=7; traffic must not
    # (descriptor padding to whole rounds may differ by a few KB)
    assert by_tpd[1][1] == by_tpd[7][1], by_tpd
    assert abs(by_tpd[1][0] - by_tpd[7][0]) < 8192, by_tpd


def test_sharded_program_reuse_across_sizes():
    """Compiled programs are keyed on BUCKETED shapes with a dynamic round
    count (CLAUDE.md invariant): a mixed-resolution workload must share
    programs instead of recompiling per unique (H, W) — the difference
    between a warm serving daemon and a 30s-15min remote compile per new
    size (review r3)."""
    eng = ShardedTileDenoiser(lambda p, x: x, {}, cs=64, ucs=48, ol=4,
                              tiles_per_device=2)
    rng = np.random.default_rng(5)
    # same bucketed key: same 3x3 tile grid (H in one stride step, W in one
    # stride step), so band-height / width / descriptor buckets all match
    a = rng.random((100, 130, 3), dtype=np.float32)
    b = rng.random((110, 133, 3), dtype=np.float32)
    np.testing.assert_allclose(eng.denoise_hwc(a), a, atol=1e-6)
    n_after_first = len(eng._step_cache)
    np.testing.assert_allclose(eng.denoise_hwc(b), b, atol=1e-6)
    assert len(eng._step_cache) == n_after_first == 1
    # a much wider image crosses a W_BUCKET boundary: one more program
    c = rng.random((100, 400, 3), dtype=np.float32)
    np.testing.assert_allclose(eng.denoise_hwc(c), c, atol=1e-6)
    assert len(eng._step_cache) == 2
