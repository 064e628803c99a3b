"""Richardson-Lucy deblur tests: deconvolution must sharpen a Gaussian-blurred
image back toward the original, preserve flux, match an INDEPENDENT dense
numpy oracle of the RL definition, and the uint8 post-ops must follow the
gmic command-line semantics. A real-gmic parity test activates when a gmic
binary is available."""

import shutil
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from nind_denoise_tpu.ops import rl_deblur


def _oracle_rl(d: np.ndarray, sigma: float, iterations: int) -> np.ndarray:
    """Independent Richardson-Lucy oracle, written from the definition:
    2D gaussian PSF exp(-(x^2+y^2)/2s^2) truncated at radius ceil(3s) and
    normalized, DENSE (non-separable) convolution with edge-replicate
    boundary, u <- u * conv(d / max(conv(u), eps)). Shares no code with
    ops/rl_deblur — it would diverge if the kernel's PSF radius,
    normalization, boundary mode, iteration structure or eps differed."""
    r = int(np.ceil(3.0 * sigma))
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    psf = np.exp(-(xx ** 2 + yy ** 2) / (2.0 * sigma ** 2))
    psf /= psf.sum()

    def conv(img):
        h, w = img.shape[:2]
        padded = np.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")
        out = np.zeros_like(img, dtype=np.float64)
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                out += psf[dy, dx] * padded[dy:dy + h, dx:dx + w]
        return out

    u = d.astype(np.float64)
    d64 = d.astype(np.float64)
    for _ in range(iterations):
        est = conv(u)
        u = u * conv(d64 / np.maximum(est, 1e-8))
    return u


def test_matches_independent_oracle():
    """10 iterations, sigma 1 and 1.6 (non-integer radius), vs the dense
    float64 oracle: agreement to fp32 accumulation noise."""
    rng = np.random.default_rng(7)
    img = np.clip(rng.random((40, 52, 3)).astype(np.float32) * 0.8 + 0.1, 0, 1)
    for sigma in (1.0, 1.6):
        got = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), sigma=sigma,
                                             iterations=10))
        want = _oracle_rl(img, sigma, 10)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


@pytest.mark.skipif(shutil.which("gmic") is None,
                    reason="gmic binary not available in this image")
def test_matches_real_gmic(tmp_path):
    """Ground-truth parity vs gmic itself (runs wherever gmic exists): the
    full reference command line on a 16-bit PNG, against BOTH PSF variants.
    The reference passes use_fast_approximation=1, so the Deriche-IIR
    ``psf='gmic_fast'`` variant is expected to be the bit-faithful one —
    this test identifies the tighter variant and pins it."""
    import cv2

    rng = np.random.default_rng(3)
    img16 = (np.clip(rng.random((96, 96, 3)) * 0.8 + 0.1, 0, 1)
             * 65535).astype(np.uint16)
    src = tmp_path / "in.png"
    out = tmp_path / "out.png"
    cv2.imwrite(str(src), img16[..., ::-1])
    subprocess.run(
        ["gmic", str(src), "-deblur_richardsonlucy", "1,10,1", "-/", "256",
         "cut", "0,255", "round", "-o", str(out)],
        check=True, capture_output=True)
    theirs = cv2.imread(str(out), cv2.IMREAD_UNCHANGED)[..., ::-1].astype(np.float64)
    img01 = img16.astype(np.float32) / 65535.0
    stats = {}
    for psf in ("gaussian", "gmic_fast"):
        ours = rl_deblur.rl_deblur_to_uint8(img01, sigma=1.0, iterations=10,
                                            psf=psf).astype(np.float64)
        mad = np.abs(ours - theirs).mean()
        psnr = 10 * np.log10(255.0 ** 2 /
                             max(((ours - theirs) ** 2).mean(), 1e-12))
        stats[psf] = (mad, psnr)
    print(f"gmic parity: {stats}")
    # BOTH variants must clear the loose bound (the product default stays
    # pinned); the fast variant is expected to be at least as tight
    for psf, (mad, psnr) in stats.items():
        assert mad < 2.0 and psnr > 35.0, (psf, stats)
    assert stats["gmic_fast"][0] <= stats["gaussian"][0] + 0.5, stats


def _oracle_deriche_1d(x: np.ndarray, sigma: float) -> np.ndarray:
    """Scalar transcription of CImg.h ``_cimg_deriche_apply`` (order 0,
    neumann), written directly from the C source as an independent check of
    ops/rl_deblur._deriche_axis (no shared code/coefficient plumbing)."""
    nsigma = max(sigma, 0.1)
    alpha = 1.695 / nsigma
    ema, ema2 = np.exp(-alpha), np.exp(-2 * alpha)
    b1, b2 = -2 * ema, ema2
    k = (1 - ema) * (1 - ema) / (1 + 2 * alpha * ema - ema2)
    a0, a1, a2, a3 = k, k * (alpha - 1) * ema, k * (alpha + 1) * ema, -k * ema2
    coefp = (a0 + a1) / (1 + b1 + b2)
    coefn = (a2 + a3) / (1 + b1 + b2)
    n = len(x)
    y = np.empty(n)
    xp = x[0]
    yb = yp = coefp * xp
    for m in range(n):
        xc = x[m]
        yc = a0 * xc + a1 * xp - b1 * yp - b2 * yb
        y[m] = yc
        xp, yb, yp = xc, yp, yc
    xn = xa = x[-1]
    yn = ya = coefn * xn
    out = np.empty(n)
    for m in range(n - 1, -1, -1):
        xc = x[m]
        yc = a2 * xn + a3 * xa - b1 * yn - b2 * ya
        xa, xn = xn, xc
        ya, yn = yn, yc
        out[m] = y[m] + yc
    return out


@pytest.mark.parametrize("sigma", [0.8, 1.0, 2.5])
def test_deriche_matches_cimg_transcription(sigma):
    """_deriche_axis (the lax.scan pair) vs the scalar CImg loop oracle."""
    rng = np.random.default_rng(11)
    x = rng.random(37).astype(np.float64)
    want = _oracle_deriche_1d(x, sigma)
    img = jnp.asarray(np.tile(x[None, :, None, None], (1, 1, 4, 3)),
                      jnp.float32)
    got = np.asarray(rl_deblur._deriche_axis(img, sigma, 1))[0, :, 0, 0]
    np.testing.assert_allclose(got, want, atol=5e-6, rtol=1e-5)
    # and along the W axis
    imgw = jnp.asarray(np.tile(x[None, None, :, None], (1, 4, 1, 3)),
                       jnp.float32)
    gotw = np.asarray(rl_deblur._deriche_axis(imgw, sigma, 2))[0, 0, :, 0]
    np.testing.assert_allclose(gotw, want, atol=5e-6, rtol=1e-5)


def test_deriche_blur_approximates_gaussian():
    """The IIR approximation must track the exact FIR gaussian closely on a
    smooth image (that is its whole point) — and the RL iteration built on
    it must stay finite/nonneg and deconvolve."""
    rng = np.random.default_rng(12)
    base = rng.random((48, 56, 3)).astype(np.float32)
    smooth = np.asarray(rl_deblur._blur(jnp.asarray(base)[None],
                                        rl_deblur.gaussian_psf_1d(2.0)))[0]
    fir = np.asarray(rl_deblur._blur(jnp.asarray(smooth)[None],
                                     rl_deblur.gaussian_psf_1d(1.0)))[0]
    iir = np.asarray(rl_deblur._deriche_blur(jnp.asarray(smooth)[None], 1.0))[0]
    assert np.abs(fir - iir).max() < 0.02, np.abs(fir - iir).max()
    restored = np.asarray(rl_deblur.rl_deblur(
        jnp.asarray(np.clip(fir, 0.05, 1)), 1.0, 10, psf="gmic_fast"))
    assert np.isfinite(restored).all() and (restored >= 0).all()


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


def test_rl_deblur_rejects_unknown_impl():
    """A typo'd impl must raise, not silently run the 2.3x-slower lax path."""
    img = jnp.zeros((16, 16, 3), jnp.float32)
    with pytest.raises(ValueError, match="unknown impl"):
        rl_deblur.rl_deblur(img, impl="pallsa")
