"""Image IO round-trip and pad/crop tests (reference parity:
TestImgOps in np_imgops.py:53-83 and tensor_to_imgfile extension dispatch)."""

import numpy as np
import pytest

from nind_denoise_tpu.core import imgio


def test_load_8_and_16_bit(fixture_images):
    img8 = imgio.load_img(fixture_images["img8"])
    img16 = imgio.load_img(fixture_images["img16"])
    for img in (img8, img16):
        assert img.shape == (3, 104, 104)
        assert img.dtype == np.float32
        assert img.min() >= 0.0 and img.max() <= 1.0


def test_load_img_raw_matches_load_img(fixture_images):
    """raw storage dtype + scale must reproduce load_img exactly (the
    streaming-engine fast path divides on device instead)."""
    for key, dtype, scale in (("img8", np.uint8, 255.0),
                              ("img16", np.uint16, 65535.0)):
        raw, s = imgio.load_img_raw(fixture_images[key])
        assert raw.dtype == dtype and s == scale
        ref = imgio.load_img(fixture_images[key])
        np.testing.assert_array_equal(
            raw.astype(np.float32).transpose(2, 0, 1) / s, ref)


@pytest.mark.parametrize("ext,maxerr", [
    (".jpg", 0.20),    # lossy
    (".png", 1 / 65535 + 1e-7),
    (".tif", 1 / 65535 + 1e-7),
    (".tiff", 0.0),    # fp32 exact, no clipping
])
def test_save_roundtrip(tmp_path, ext, maxerr):
    # smooth gradient (JPEG-friendly) rather than noise
    g = np.linspace(0, 1, 32, dtype=np.float32)
    img = np.stack([np.outer(g, g), np.outer(g, 1 - g), np.outer(1 - g, g)])
    p = str(tmp_path / f"x{ext}")
    imgio.save_img(img, p)
    back = imgio.load_img(p)
    assert np.abs(back - img).max() <= maxerr


def test_tiff_preserves_highlights(tmp_path):
    """fp32 .tiff must keep values > 1.0 (highlight reconstruction,
    src/denoise.py:417-418)."""
    img = np.full((3, 8, 8), 1.7, dtype=np.float32)
    p = str(tmp_path / "h.tiff")
    imgio.save_img(img, p)
    np.testing.assert_array_equal(imgio.load_img(p), img)


def test_pad_crop_pair():
    rng = np.random.default_rng(1)
    a = rng.random((3, 8, 8), dtype=np.float32)
    b = rng.random((3, 8, 8), dtype=np.float32)
    ap, bp = imgio.pad_img_pair(a, b, 16)
    assert ap.shape == (3, 16, 16) and bp.shape == (3, 16, 16)
    assert ap[0, 4, 4] == a[0, 0, 0]

    ac, bc = imgio.crop_img_pair(a, b, 4, imgio.CropMethod.CENTER)
    assert ac.shape == (3, 4, 4)
    assert ac[0, 0, 0] == a[0, 2, 2]

    same, _ = imgio.crop_img_pair(a, b, 8, imgio.CropMethod.CENTER)
    np.testing.assert_array_equal(same, a)


def test_crop_to_multiple():
    x = np.zeros((3, 130, 67))
    y = imgio.crop_to_multiple(x, 64)
    assert y.shape == (3, 128, 64)


def test_save_img_raises_on_unwritable_path(tmp_path):
    """cv2.imwrite returns False instead of raising; save_img must turn
    that into an error — a missing output directory previously produced an
    exit-0 run with no file (silent data loss after minutes of denoise)."""
    from nind_denoise_tpu.core import imgio

    img = np.zeros((3, 8, 8), np.float32)
    with pytest.raises(IOError, match="could not write"):
        imgio.save_img(img, str(tmp_path / "no_such_dir" / "out.png"))
