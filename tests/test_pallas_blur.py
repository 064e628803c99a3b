"""Pallas Gaussian-blur kernel vs the lax reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nind_denoise_tpu.ops import pallas_blur, rl_deblur


@pytest.mark.parametrize("hw,sigma", [((64, 96), 1.0), ((50, 70), 2.0)])
def test_pallas_blur_matches_lax(hw, sigma):
    rng = np.random.default_rng(0)
    img = rng.random((*hw, 3), dtype=np.float32)
    ref = np.asarray(rl_deblur._blur(jnp.asarray(img)[None],
                                     rl_deblur.gaussian_psf_1d(sigma)))[0]
    got = np.asarray(pallas_blur.gauss_blur_pallas(jnp.asarray(img),
                                                   sigma=sigma, band_h=16,
                                                   interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_pallas_rl_matches_lax():
    rng = np.random.default_rng(1)
    img = rng.random((48, 64, 3), dtype=np.float32) + 0.05
    ref = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), 1.0, 4))
    got = np.asarray(pallas_blur.rl_deblur_pallas(jnp.asarray(img), 1.0, 4,
                                                  band_h=16, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
