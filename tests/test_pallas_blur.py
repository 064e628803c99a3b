"""Pallas kernels vs the lax reference (interpret mode on CPU).

The fused RL kernel is the product path on TPU (rl_deblur impl='auto'),
so its parity suite covers the band/boundary geometry: multi-band images,
single-band, odd sizes, and non-unit sigma (wider taps).
"""

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


@pytest.mark.parametrize("hw,sigma,iters", [
    ((200, 150), 1.0, 3),    # 2 bands: interior + both boundary fixes
    ((97, 131), 1.0, 4),     # single band, odd sizes
    ((130, 260), 2.0, 2),    # wider taps (r=6), lane-unaligned width
    ((363, 140), 1.0, 2),    # 4 bands incl. a nearly-empty tail band
])
def test_pallas_rl_fused_matches_lax(hw, sigma, iters):
    rng = np.random.default_rng(1)
    img = rng.random((*hw, 3), dtype=np.float32) + 0.05
    ref = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), sigma, iters,
                                         impl="xla"))
    got = np.asarray(pallas_blur.rl_deblur_pallas_fused(
        jnp.asarray(img), sigma, iters, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_rl_auto_dispatch():
    """impl='auto' must fall back to the lax path off-TPU (no interpret-mode
    surprise in production CPU runs) and accept batched input."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((40, 56, 3), dtype=np.float32))
    a = np.asarray(rl_deblur.rl_deblur(img, 1.0, 2, impl="auto"))
    b = np.asarray(rl_deblur.rl_deblur(img, 1.0, 2, impl="xla"))
    np.testing.assert_array_equal(a, b)
    batched = np.asarray(rl_deblur.rl_deblur(img[None], 1.0, 2, impl="auto"))
    np.testing.assert_array_equal(batched[0], b)


def test_fused_band_h_budget():
    """VMEM sizing (ADVICE r2-high): band_h must shrink as width grows so the
    double-buffered scratch + live temps stay inside the budget, and
    fused_fits must go False (-> auto falls back to XLA) for extreme widths
    instead of the kernel failing to compile on-chip."""
    r = pallas_blur._radius(1.0)
    bh_3k = pallas_blur._fused_band_h(3000, r)
    bh_6k = pallas_blur._fused_band_h(6000, r)
    bh_12k = pallas_blur._fused_band_h(12000, r)
    assert bh_3k >= bh_6k >= bh_12k > 0
    # the w=3000 bench shape must keep its round-2 band (no perf change)
    assert bh_3k == 120
    # on-chip calibration point: w=6000 / band_h=72 measured 16.04 MB total
    # scoped VMEM (> the 16 MB limit); the model must reject it
    assert pallas_blur._fused_vmem_estimate(72, r, 6000) > pallas_blur._VMEM_LIMIT
    assert bh_6k < 72
    for bh, w in ((bh_3k, 3000), (bh_6k, 6000), (bh_12k, 12000)):
        assert pallas_blur._fused_vmem_estimate(bh, r, w) <= pallas_blur._VMEM_LIMIT
    assert not pallas_blur.fused_fits(60000)
    # auto dispatch survives an over-budget width (would have been a Mosaic
    # compile error before the gate)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((8, 60000, 3), dtype=np.float32))
    out = rl_deblur.rl_deblur(img, 1.0, 1, impl="auto")
    assert out.shape == img.shape


@pytest.mark.slow
def test_pallas_rl_fused_wide_image():
    """6000 px wide (a typical full-res photo, the width class that blew the
    old fixed-band VMEM scratch): the adaptive band_h must stay in budget
    AND keep parity with the lax path."""
    rng = np.random.default_rng(6)
    img = rng.random((24, 6000, 3), dtype=np.float32) + 0.05
    ref = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), 1.0, 2, impl="xla"))
    got = np.asarray(pallas_blur.rl_deblur_pallas_fused(
        jnp.asarray(img), 1.0, 2, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("h", [361, 362])
def test_pallas_rl_fused_short_tail_band(h):
    """Tail band with fewer than r real rows (h mod band_h in [1, r-1]):
    the bottom edge-replicate fix also fires in the SECOND-TO-LAST band,
    whose replicate source sits band_h rows lower in the frame — a single
    last-band slice replicated from the wrong row there (review r3,
    confirmed: pre-fix max err 6.2e-2 at h=361 vs 1e-6 at h=363)."""
    rng = np.random.default_rng(13)
    img = rng.random((h, 140, 3), dtype=np.float32) + 0.05
    ref = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), 1.0, 2, impl="xla"))
    got = np.asarray(pallas_blur.rl_deblur_pallas_fused(
        jnp.asarray(img), 1.0, 2, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pallas_rl_fused_shape_property():
    """Hypothesis sweep of the band/boundary geometry: random (h, w, sigma)
    against the XLA oracle in interpret mode. The fixed cases above pin the
    known-tricky configurations (short tail band, single band, wide taps);
    this searches the space between them — every h mod band_h residue class,
    lane-unaligned widths, both tap radii — with iterations=2 so the
    padded-IO contract (iteration N+1 consumes iteration N's in-kernel
    edge-replicate padding) is always exercised."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(h=st.integers(8, 300), w=st.integers(16, 300),
           sigma=st.sampled_from([1.0, 2.0]), seed=st.integers(0, 2**31 - 1))
    def check(h, w, sigma, seed):
        rng = np.random.default_rng(seed)
        img = rng.random((h, w, 3), dtype=np.float32) + 0.05
        ref = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), sigma, 2,
                                             impl="xla"))
        got = np.asarray(pallas_blur.rl_deblur_pallas_fused(
            jnp.asarray(img), sigma, 2, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    check()


def test_pallas_rl_fused_wide_taps():
    """sigma=3 (r=9 > one sublane tile): halo2 rounds to 16, band_h shrinks
    to keep est_rows <= 128; numerics must hold."""
    rng = np.random.default_rng(9)
    img = rng.random((140, 90, 3), dtype=np.float32) + 0.05
    ref = np.asarray(rl_deblur.rl_deblur(jnp.asarray(img), 3.0, 2, impl="xla"))
    got = np.asarray(pallas_blur.rl_deblur_pallas_fused(
        jnp.asarray(img), 3.0, 2, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_large_sigma_gates_to_xla_not_crash():
    """fused_fits must account for the 128-lane horizontal slack (the two
    chained in-kernel blurs need w_in >= w_out + 4r): sigma ~ 11-14 used to
    pass the VMEM gate and then crash with a negative-pad ValueError inside
    jit. The auto path must fall back to XLA and produce pixels."""
    from nind_denoise_tpu.ops import pallas_blur, rl_deblur

    assert not pallas_blur.fused_fits(1024, 12.0)
    assert pallas_blur.fused_fits(1024, 10.0)  # 4r = 120 still fits
    img = jnp.asarray(np.random.default_rng(0).random((64, 96, 3),
                                                      dtype=np.float32))
    out = rl_deblur.rl_deblur(img, sigma=12.0, iterations=1, impl="auto")
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="VMEM|xla"):
        pallas_blur.rl_deblur_pallas_fused(img, sigma=12.0, iterations=1,
                                           interpret=True)


def test_gauss_blur_large_sigma_clean_error():
    """Radius > 64 (sigma > ~21.4) must fail with the module's clean
    message, not a negative-pad ValueError from jnp.pad."""
    from nind_denoise_tpu.ops import pallas_blur

    img = jnp.zeros((16, 256, 3), jnp.float32)
    with pytest.raises(ValueError, match="128-lane"):
        pallas_blur.gauss_blur_pallas(img, sigma=22.0)


def test_pallas_rl_fused_batch_bit_identical_to_single():
    """Batched (N, H, W, C) input: every member runs as its own grid cell
    with the identical per-image program, so results must be BIT-identical
    to the single-image call — the property serve's coalesced group post
    relies on (one dispatch per iteration for a whole group)."""
    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.random((3, 40, 52, 3), dtype=np.float32))
    batched = np.asarray(pallas_blur.rl_deblur_pallas_fused(
        imgs, 1.0, 4, interpret=True))
    for i in range(3):
        single = np.asarray(pallas_blur.rl_deblur_pallas_fused(
            imgs[i], 1.0, 4, interpret=True))
        np.testing.assert_array_equal(batched[i], single)
