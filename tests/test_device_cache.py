"""Device-resident training data path (train/device_cache.py): on-device
augmentation statistics parity with DenoisingDataset's host pipeline
(reference augs: /root/reference/src/nind_denoise/dataset_torch_3.py:249-274),
cache fill / incremental refresh mechanics, and the train-loop integration."""

import os

import jax
import numpy as np
import pytest

from nind_denoise_tpu.train import dataset as ds_mod
from nind_denoise_tpu.train import device_cache as dc_mod


@pytest.fixture(scope="module")
def fixed_pair_ds(tmp_path_factory):
    """One scene, ONE base + ONE noisy ISO, crops exactly cs-sized: pair
    choice and crop position are deterministic, so host-vs-device output
    differences can only come from the augmentations themselves."""
    import cv2

    root = tmp_path_factory.mktemp("dc") / "TEST_32_32"
    rng = np.random.default_rng(7)
    base = rng.random((32, 32, 3)).astype(np.float32) * 0.8  # max < 1
    for iso, sigma in (("ISO100", 0.0), ("ISO3200", 0.08)):
        d = root / "scene" / iso
        d.mkdir(parents=True, exist_ok=True)
        noisy = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
        cv2.imwrite(str(d / f"TEST_scene_{iso}_0_0_32.png"),
                    (noisy[..., ::-1] * 65535).astype(np.uint16))
    return str(root)


def _dihedral_id(img_hwc: np.ndarray, raw_hwc: np.ndarray) -> int:
    """Which of the 8 dihedral orientations of ``raw`` equals ``img``
    (-1 if none) — orientation fingerprint for distribution tests."""
    k = 0
    for rot in range(4):
        for flip in (False, True):
            cand = np.rot90(raw_hwc, rot, (0, 1))
            if flip:
                cand = cand[:, ::-1]
            if np.allclose(img_hwc, cand, atol=1e-5):
                return k
            k += 1
    return -1


def test_supports_gate(fixed_pair_ds):
    ds = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=0)
    assert dc_mod.supports(ds)
    ds_jpeg = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=0,
                                      compressionmin=60)
    assert not dc_mod.supports(ds_jpeg)
    ds_noise = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=0)
    ds_noise.sigmamax = 3.0
    assert not dc_mod.supports(ds_noise)


def test_load_pair_is_unaugmented_and_feeds_getitem(fixed_pair_ds):
    ds = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=0,
                                 cache_images=True)
    x, y = ds.load_pair(0)
    assert x.shape == (3, 32, 32) and y.shape == (3, 32, 32)
    # un-augmented: repeated calls are identical (fixed pair, fixed crop)
    x2, y2 = ds.load_pair(0)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    # __getitem__ output is always SOME dihedral orientation of load_pair
    for _ in range(6):
        gx, gy = ds[0]
        kx = _dihedral_id(gx.transpose(1, 2, 0), x.transpose(1, 2, 0))
        ky = _dihedral_id(gy.transpose(1, 2, 0), y.transpose(1, 2, 0))
        assert kx >= 0 and kx == ky  # same orientation for clean and noisy


def test_device_aug_statistics_match_host(fixed_pair_ds):
    """Orientation distribution parity: both pipelines must produce all 8
    dihedral orientations with comparable frequencies, and each device
    sample must be bitwise one of the host pipeline's possible outputs
    (same crop content, same orientation set)."""
    ds = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=3,
                                 cache_images=True)
    raw_x, raw_y = ds.load_pair(0)
    raw_x_hwc = raw_x.transpose(1, 2, 0)
    raw_y_hwc = raw_y.transpose(1, 2, 0)

    cache = dc_mod.DeviceEpochCache(ds, capacity=1, seed=0,
                                    cache_dtype="float32", refresh_frac=0)
    n, counts_dev = 0, np.zeros(8, int)
    key = jax.random.PRNGKey(0)
    for _ in range(96):  # p(an orientation missing) ~ 8*(7/8)^96 ~ 2e-5
        for cx, cy in cache.epoch_batches(1, key):
            key, _ = jax.random.split(key)
            gx = np.asarray(cx)[0]
            gy = np.asarray(cy)[0]
            kx = _dihedral_id(gx, raw_x_hwc)
            ky = _dihedral_id(gy, raw_y_hwc)
            assert kx >= 0, "device aug produced a non-dihedral output"
            assert kx == ky
            counts_dev[kx] += 1
            n += 1
    counts_host = np.zeros(8, int)
    for _ in range(n):
        hx, _ = ds[0]
        counts_host[_dihedral_id(hx.transpose(1, 2, 0), raw_x_hwc)] += 1
    # all 8 orientations occur on both paths over 96 draws (p_miss ~ 2e-5
    # across the 8 orientations at uniform 1/8)
    assert (counts_dev > 0).all(), counts_dev
    assert (counts_host > 0).all(), counts_host


def test_device_exp_mult_semantics(fixed_pair_ds):
    """exp_mult on device: x scales UNclipped within
    [min, min(max, 1/x.max())], y scales then clips — dataset semantics
    (train/dataset.py __getitem__, reference :271-274)."""
    ds = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=5,
                                 exp_mult_min=1.1, exp_mult_max=1.4,
                                 cache_images=True)
    raw_x, raw_y = ds.load_pair(0)
    hi = min(1.4, 1.0 / raw_x.max())
    cache = dc_mod.DeviceEpochCache(ds, capacity=1, seed=0,
                                    cache_dtype="float32", refresh_frac=0)
    key = jax.random.PRNGKey(1)
    seen = []
    for rep in range(16):
        for cx, cy in cache.epoch_batches(1, key):
            key, _ = jax.random.split(key)
            gx, gy = np.asarray(cx)[0], np.asarray(cy)[0]
            em = gx.max() / raw_x.max()  # rot/flip preserve the max
            assert 1.1 - 1e-4 <= em <= hi + 1e-4, em
            assert gy.max() <= 1.0 + 1e-6
            seen.append(em)
    assert np.std(seen) > 1e-3  # actually random, not a constant


def test_cache_refresh_scatter(fixed_pair_ds):
    ds = ds_mod.DenoisingDataset([fixed_pair_ds], cs=32, seed=0,
                                 cache_images=True)
    cache = dc_mod.DeviceEpochCache(ds, capacity=4, seed=0,
                                    cache_dtype="float16",
                                    refresh_frac=0.5)
    assert len(cache) == 1  # capacity clamps to len(dataset)
    before = np.asarray(cache.cache_x)
    cache.start_refresh()
    if cache._refresher is not None:
        cache._refresher.join(10)
    assert cache.maybe_swap()
    assert cache.swaps == 1
    after = np.asarray(cache.cache_x)
    assert after.shape == before.shape and after.dtype == before.dtype
    # idempotent when nothing pending
    assert not cache.maybe_swap()


def test_cache_wrap_scatter():
    """_next_offset wrap: a refresh block crossing the end of the cache
    lands split across [offset, n) and [0, rest)."""
    import jax.numpy as jnp

    from nind_denoise_tpu.train.device_cache import _scatter_block

    cache = jnp.zeros((6, 2, 2, 3))
    block = jnp.ones((2, 2, 2, 3))
    out = _scatter_block(cache, block, np.int32(4))
    out = np.asarray(out)
    assert (out[4:] == 1).all() and (out[:4] == 0).all()


@pytest.mark.slow  # full CLI epochs on the 1-core host
def test_train_loop_with_device_cache(tmp_path, tmp_path_factory):
    """--device_cache trains end-to-end: loss recorded, checkpoint written,
    and the run's logged steps match the cache-derived batch count."""
    import cv2
    import yaml

    from nind_denoise_tpu.train import loop

    root = tmp_path_factory.mktemp("dc104") / "TEST_104_96"
    rng = np.random.default_rng(3)
    for aset in ("sceneA", "sceneB"):
        base = rng.random((112, 112, 3)).astype(np.float32)
        for iso, sigma in (("ISO200", 0.0), ("ISO6400", 0.1)):
            d = root / aset / iso
            d.mkdir(parents=True, exist_ok=True)
            for x in (0, 96):
                noisy = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
                cv2.imwrite(str(d / f"TEST_{aset}_{iso}_{x}_0_96.png"),
                            (noisy * 65535).astype(np.uint16))
    setdir = os.path.join(str(root), "sceneA")
    pairs = [[os.path.join(setdir, "ISO200", "TEST_sceneA_ISO200_0_0_96.png"),
              os.path.join(setdir, "ISO6400", "TEST_sceneA_ISO6400_0_0_96.png")]]
    val = tmp_path / "val.yaml"
    val.write_text(yaml.safe_dump(pairs))

    models_dir = str(tmp_path / "models")
    loop.main([
        "--train_data", str(root),
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "3", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", str(val),
        "--threads", "1", "--device_cache", "8",
        "--device_cache_refresh", "0.5",
    ])
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    log = open(os.path.join(exp, "train.log")).read()
    assert "Device cache: 4 crop pairs" in log  # capacity clamps to len(ds)
    import json

    res = json.load(open(os.path.join(exp, "trainres.json")))
    assert "best_epoch" in res and "validation_loss" in res["best_epoch"]
