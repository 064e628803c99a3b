"""Richardson-Lucy deblur tests: deconvolution must sharpen a Gaussian-blurred
image back toward the original, preserve flux, and the uint8 post-ops must
follow the gmic command-line semantics."""

import numpy as np
import jax.numpy as jnp

from nind_denoise_tpu.ops import rl_deblur


def _blurred_scene(sigma=1.0):
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), dtype=np.float32)
    img[16:48:6, 16:48:6] = 1.0          # point grid
    img += 0.1
    blurred = np.asarray(rl_deblur._blur(jnp.asarray(img)[None],
                                         rl_deblur.gaussian_psf_1d(sigma)))[0]
    return img, blurred


def test_deconvolution_reduces_error():
    """10 RL iterations on a smooth sigma-1-blurred scene must recover most
    of the lost detail (>10x MSE reduction observed; assert 5x margin)."""
    rng = np.random.default_rng(0)
    base = rng.random((64, 64, 3)).astype(np.float32)
    img = np.asarray(rl_deblur._blur(jnp.asarray(base)[None],
                                     rl_deblur.gaussian_psf_1d(2.0)))[0]
    img = np.clip(img * 2 - 0.4, 0.05, 1)
    blurred = np.asarray(rl_deblur._blur(jnp.asarray(img)[None],
                                         rl_deblur.gaussian_psf_1d(1.0)))[0]
    restored = np.asarray(rl_deblur.rl_deblur(jnp.asarray(blurred), sigma=1.0,
                                              iterations=10))
    mse_before = ((blurred - img) ** 2).mean()
    mse_after = ((restored - img) ** 2).mean()
    assert mse_after < 0.2 * mse_before, (mse_before, mse_after)


def test_flux_preserved_interior():
    """RL with a normalized PSF conserves total intensity (away from edges)."""
    img, blurred = _blurred_scene(1.0)
    restored = np.asarray(rl_deblur.rl_deblur(jnp.asarray(blurred), sigma=1.0,
                                              iterations=10))
    s0 = blurred[8:-8, 8:-8].sum()
    s1 = restored[8:-8, 8:-8].sum()
    assert abs(s1 - s0) / s0 < 0.02


def test_nonnegative_and_finite():
    img, blurred = _blurred_scene(2.0)
    restored = np.asarray(rl_deblur.rl_deblur(jnp.asarray(blurred), sigma=2.0,
                                              iterations=20))
    assert np.isfinite(restored).all()
    assert (restored >= 0).all()


def test_uint8_postops_match_gmic_arithmetic():
    """round(clip(u * 65535/256, 0, 255)): spot-check the scaling constants."""
    flat = np.full((16, 16, 3), 0.5, dtype=np.float32)
    out = rl_deblur.rl_deblur_to_uint8(flat, sigma=1.0, iterations=1)
    # RL on a constant image is a fixed point -> u == 0.5 everywhere
    expected = np.round(np.clip(0.5 * 65535.0 / 256.0, 0, 255))
    np.testing.assert_array_equal(out, np.uint8(expected))


def test_batch_and_single_shapes_agree():
    img, blurred = _blurred_scene(1.0)
    single = np.asarray(rl_deblur.rl_deblur(jnp.asarray(blurred), 1.0, 5))
    batched = np.asarray(rl_deblur.rl_deblur(jnp.asarray(blurred)[None], 1.0, 5))[0]
    np.testing.assert_allclose(single, batched, atol=1e-6)
