"""Property-based save/load round-trip invariants for core/imgio.

tests/test_imgio.py pins the reference's extension conventions on fixed
fixtures (np_imgops.py:12-29, pt_helpers.py:22-40); here hypothesis
randomizes shapes and contents and asserts the dtype-exact round trips:
.png/.tif quantize to uint16 (so any image round-trips within 1/65535),
.tiff stores float32 verbatim INCLUDING >1.0 highlight values and negative
residuals (the pipeline's unclipped contract, denoise.py:417-418), and
load_img_raw returns the exact stored integers with the right scale.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nind_denoise_tpu.core import imgio


@st.composite
def images(draw):
    h = draw(st.integers(2, 40))
    w = draw(st.integers(2, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.random((3, h, w), dtype=np.float32)


@settings(max_examples=25, deadline=None)
@given(images())
def test_png_tif_uint16_roundtrip(tmp_path_factory, img):
    tmp = tmp_path_factory.mktemp("io")
    for ext in ("png", "tif"):
        p = str(tmp / f"x.{ext}")
        imgio.save_img(img, p)
        back = imgio.load_img(p)
        assert back.shape == img.shape and back.dtype == np.float32
        # 16-bit quantization: half a step of 1/65535 plus fp rounding
        np.testing.assert_allclose(back, np.clip(img, 0, 1),
                                   atol=0.5 / 65535 + 1e-7)
        raw, scale = imgio.load_img_raw(p)
        assert raw.dtype == np.uint16 and scale == 65535.0
        np.testing.assert_array_equal(
            raw.transpose(2, 0, 1),
            np.round(np.clip(img, 0, 1) * 65535).astype(np.uint16))


@settings(max_examples=25, deadline=None)
@given(images(), st.floats(1.1, 4.0), st.floats(-0.5, -0.01))
def test_tiff_fp32_unclipped_roundtrip(tmp_path_factory, img, hi, lo):
    """The .tiff float path must be bit-exact and must NOT clip: highlight
    values >1 and negative residuals survive (the reference's deliberate
    32-bit intermediate contract)."""
    tmp = tmp_path_factory.mktemp("io")
    img = img.copy()
    img[0, 0, 0] = np.float32(hi)
    img[1, -1, -1] = np.float32(lo)
    p = str(tmp / "x.tiff")
    imgio.save_img(img, p)
    back = imgio.load_img(p)
    np.testing.assert_array_equal(back, img)
    raw, scale = imgio.load_img_raw(p)
    assert scale == 1.0
    np.testing.assert_array_equal(raw.transpose(2, 0, 1), img)
