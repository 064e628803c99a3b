"""Dataset augmentation / variant coverage: JPEG-compression aug, gaussian
noise aug, LazyNoise, CleanClean, Picky CSV dataset, EXIF backend chain."""

import csv
import os

import numpy as np
import pytest

from nind_denoise_tpu.train import dataset as ds_mod
from tests.test_train import cropped_ds  # noqa: F401


def test_gaussian_noise_aug(cropped_ds):  # noqa: F811
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, sigmamin=20, sigmamax=20,
                                 seed=0)
    ds_ref = ds_mod.DenoisingDataset([cropped_ds], cs=64, seed=0)
    x1, y1 = ds[0]
    x2, y2 = ds_ref[0]
    # same crop/augs (same seed) but y gets extra noise
    np.testing.assert_array_equal(x1, x2)
    assert np.abs(y1 - y2).mean() > 0.01
    assert (y1 >= 0).all()  # abs() semantics


def test_jpeg_compression_aug(cropped_ds):  # noqa: F811
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, compressionmin=30,
                                 compressionmax=30, seed=0)
    x, y = ds[0]
    assert y.shape == (3, 64, 64)
    assert y.dtype == np.float32 and 0 <= y.min() and y.max() <= 1


def test_lazy_noise_dataset(cropped_ds):  # noqa: F811
    ds = ds_mod.LazyNoiseDataset(datadirs=[cropped_ds], cs=64, seed=0)
    a, b = ds[0]
    np.testing.assert_array_equal(a, b)


def test_clean_clean_dataset(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"img{i}.png"),
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8))
    ds = ds_mod.CleanCleanDataset(str(tmp_path), cs=64, seed=0)
    assert len(ds) == 3
    x, y = ds[0]
    np.testing.assert_array_equal(x, y)
    assert x.shape == (3, 64, 64)


def test_picky_dataset_threshold(cropped_ds, tmp_path):  # noqa: F811
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, seed=0)
    rows = []
    for i, (xp, yp) in enumerate(ds.all_crop_pairs()):
        rows.append({"xpath": xp, "ypath": yp,
                     "score": 0.9 if i % 2 == 0 else 0.1})
    fpath = tmp_path / "quality.csv"
    with open(fpath, "w", newline="") as fp:
        w = csv.DictWriter(fp, fieldnames=["xpath", "ypath", "score"])
        w.writeheader()
        w.writerows(rows)
    picky = ds_mod.PickyDenoisingDatasetFromList(str(fpath), min_quality=0.5,
                                                 cs=64, seed=0)
    assert len(picky) == (len(rows) + 1) // 2
    x, y = picky[0]
    assert x.shape == (3, 64, 64)


def test_exif_clone_jpeg(tmp_path):
    """PIL fallback: EXIF travels from one JPEG to another."""
    from PIL import Image

    from nind_denoise_tpu.pipeline import exif as exif_mod

    src = tmp_path / "src.jpg"
    dst = tmp_path / "dst.jpg"
    im = Image.new("RGB", (16, 16), (100, 50, 25))
    ex = Image.Exif()
    ex[0x0110] = "TestCam 3000"  # Model tag
    im.save(src, exif=ex)
    im.save(dst)

    ok = exif_mod.clone_exif(src, dst, verbose=True)
    assert ok
    with Image.open(dst) as d:
        assert d.getexif()[0x0110] == "TestCam 3000"
