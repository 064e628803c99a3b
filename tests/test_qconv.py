"""int8 quantized inference path (ops/qconv.py + UtNet.apply_int8).

Quality here is a *measured property pinned by floors*, not an exactness
claim: the int8 mode is opt-in (``compute_dtype='int8'``) and trades a
bounded PSNR cost for ~2x MXU rate + half the activation HBM bytes
(PERF.md "int8 engine mode"). The floors are set ~10 dB below measured
values so only a real regression trips them.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.ops import qconv as Q


def _psnr(a, b, peak=1.0):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return 10 * np.log10(peak ** 2 / max((d ** 2).mean(), 1e-20))


def test_quantize_before_pool_commutes_exactly():
    """apply_int8's static path pools int8 (quantize first — half the pool
    traffic): round/clip/divide is monotone, so max commutes with it
    BIT-EXACTLY, saturation included. Use a tiny scale so clipping
    actually occurs in the test."""
    from nind_denoise_tpu.ops.conv import maxpool2x

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 5)), jnp.float32)
    s = jnp.asarray(0.004, jnp.float32)  # |x| up to ~3 -> saturates often
    a = maxpool2x(Q.quant_act_static(x, s)[0])
    b = Q.quant_act_static(maxpool2x(x), s)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_kernel_roundtrip_bound():
    """Per-output-channel symmetric: |w - wq*s| <= s/2 elementwise, and each
    channel's scale is exactly max|w[..., o]| / 127."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32)
                    * rng.lognormal(0, 2, size=(1, 1, 1, 8)).astype(np.float32))
    wq, s = Q.quant_kernel(w)
    assert wq.dtype == jnp.int8 and s.shape == (8,)
    np.testing.assert_allclose(
        np.asarray(s), np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0,
        rtol=1e-6)
    err = np.abs(np.asarray(w) - np.asarray(wq, np.float32) * np.asarray(s))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_quant_act_per_sample_independence():
    """Scales are per-SAMPLE: the engine pads batches with zero-weight dummy
    tiles, so one sample's content must not couple another's scale. A zero
    sample must also be safe (eps floor, no NaN/inf)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
    x[2] = 0.0
    xq, s = Q.quant_act(jnp.asarray(x))
    assert s.shape == (3, 1, 1, 1)
    x2 = x.copy()
    x2[1] *= 100.0  # blowing up sample 1 must not move sample 0's codes
    xq2, s2 = Q.quant_act(jnp.asarray(x2))
    np.testing.assert_array_equal(np.asarray(xq[0]), np.asarray(xq2[0]))
    assert np.isfinite(np.asarray(xq, np.float32)).all()
    assert (np.asarray(xq[2]) == 0).all()


def test_qconv_matches_f32_conv_within_quant_noise():
    """qconv vs the dense f32 conv it approximates: relative error bounded
    by the two rounding steps (~1% for well-conditioned random tensors)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 24)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(24).astype(np.float32))
    wq, s = Q.quant_kernel(w)
    got = np.asarray(Q.qconv(x, wq, s, b, "VALID"))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=dn) + b)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_qconv_full_padding_and_dilation():
    """'FULL' padding and lhs_dilation (the composed decoder up-convs) must
    route through the integer conv identically to the f32 oracle."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 7, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 4, 8, 8)).astype(np.float32))
    wq, s = Q.quant_kernel(w)
    got = np.asarray(Q.qconv_raw(x, wq, s, "FULL", lhs_dilation=(2, 2)))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(lax.conv_general_dilated(
        x, w, (1, 1), ((3, 3), (3, 3)), lhs_dilation=(2, 2),
        dimension_numbers=dn))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_apply_int8_psnr_floor():
    """The full quantized forward vs the fp32 reference forward. Measured
    68.1 dB (fp32 I/O) / 61.6 dB (bf16 I/O, the engine's boundary) on this
    fixture; floors at 58/52 so only a real regression trips."""
    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    x = jnp.asarray(np.random.default_rng(0).random((1, 136, 136, 3),
                                                    dtype=np.float32))
    ref = np.asarray(UtNet.apply(params, x))
    q = np.asarray(UtNet.apply_int8(params, x))
    assert q.shape == ref.shape
    assert _psnr(q, ref) >= 58.0
    qb = np.asarray(UtNet.apply_int8(params, x.astype(jnp.bfloat16))
                    ).astype(np.float32)
    assert _psnr(qb, ref) >= 52.0


def test_apply_int8_precomputed_derived_and_jit():
    """Engine usage: derived tree precomputed once (precompute_int8), the
    forward jitted with it closed over as constants."""
    params = UtNet.init(jax.random.PRNGKey(1), funit=8)
    derived = jax.jit(UtNet.precompute_int8)(params)
    x = jnp.asarray(np.random.default_rng(1).random((1, 104, 104, 3),
                                                    dtype=np.float32))
    ref = np.asarray(UtNet.apply(params, x))
    fn = jax.jit(lambda p, t: UtNet.apply_int8(p, t, derived=derived))
    out = np.asarray(fn(params, x))
    assert _psnr(out, ref) >= 55.0


def test_apply_int8_static_scales():
    """Calibrated static scales (the fast variant, compute_dtype=
    'int8_static'): measured 64.3 dB fp32-I/O / 60.0 dB bf16-I/O on this
    fixture (~1.5-4 dB under dynamic); floors 10 dB below measured."""
    from nind_denoise_tpu.ops.qconv import calib_tiles

    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    x = jnp.asarray(np.random.default_rng(0).random((1, 136, 136, 3),
                                                    dtype=np.float32))
    ref = np.asarray(UtNet.apply(params, x))
    derived = jax.jit(UtNet.precompute_int8)(params)
    d_stat = UtNet.calibrate_int8(params, derived, calib_tiles())
    assert "acts" in d_stat and len(d_stat["acts"]) >= 14
    q = np.asarray(UtNet.apply_int8(params, x, derived=d_stat))
    assert _psnr(q, ref) >= 54.0, _psnr(q, ref)
    qb = np.asarray(UtNet.apply_int8(params, x.astype(jnp.bfloat16),
                                     derived=d_stat)).astype(np.float32)
    assert _psnr(qb, ref) >= 50.0, _psnr(qb, ref)


def test_calib_from_image_beats_synthetic_on_dim_content():
    """The image CLI calibrates int8_static on crops of the ACTUAL input
    (qconv.calib_from_image): on dim content (6% of range — an
    underexposed night shot) the synthetic extremal set wastes most int8
    codes while content-matched scales digitize the real dynamic range.
    Measured 74.8 dB (image-calib) vs 62.8 dB (synthetic) on this
    fixture; assert the win is >= 6 dB and the floor >= 68 dB."""
    from nind_denoise_tpu.ops.qconv import calib_from_image, calib_tiles

    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    x_np = np.random.default_rng(0).random((136, 136, 3),
                                           dtype=np.float32) * 0.06
    x = jnp.asarray(x_np[None])
    ref = np.asarray(UtNet.apply(params, x))
    derived = jax.jit(UtNet.precompute_int8)(params)
    d_syn = UtNet.calibrate_int8(params, derived, calib_tiles())
    d_img = UtNet.calibrate_int8(params, derived, calib_from_image(x_np))
    p_syn = _psnr(np.asarray(UtNet.apply_int8(params, x, derived=d_syn)), ref)
    p_img = _psnr(np.asarray(UtNet.apply_int8(params, x, derived=d_img)), ref)
    assert p_img >= p_syn + 6.0, (p_img, p_syn)
    assert p_img >= 68.0, p_img


def test_calib_from_image_geometry():
    """Corner/center/brightest-crop selection; reflect-pad below size."""
    from nind_denoise_tpu.ops.qconv import calib_from_image

    img = np.zeros((300, 400, 3), np.float32)
    img[200, 350] = 1.0  # brightest pixel, off-center
    c = np.asarray(calib_from_image(img, size=136))
    assert c.shape == (6, 136, 136, 3)
    assert c.max() == 1.0  # the argmax crop contains the hottest pixel
    small = np.asarray(calib_from_image(np.full((40, 50, 3), 0.5,
                                                np.float32), size=136))
    assert small.shape == (6, 136, 136, 3) and np.isfinite(small).all()


def test_calib_finds_isolated_highlight_in_large_image():
    """The brightest-pixel probe must be EXACT even on large images: a
    single-pixel specular highlight at a deliberately awkward offset
    (prime coordinates — off any coarse sampling grid) must land in a
    calibration crop, since clipped highlights are precisely what the
    brightest crop exists to put in the int8 activation range
    (review r3: a strided subsample missed narrow highlights)."""
    from nind_denoise_tpu.ops.qconv import calib_from_image

    img = np.full((2003, 3001, 3), 0.1, np.float32)
    img[1231, 2741] = 1.0  # isolated 1-px highlight, prime coords
    c = np.asarray(calib_from_image(img, size=136))
    assert c.max() == 1.0


def test_int8_static_hlo_stable_across_calibrations():
    """The calibrated scales must ride as TRACED leaves, not closure
    constants: per-image calibration (the CLI's calib_from_image) must
    not change the lowered HLO, or every image would force a 30s-15min
    tile-program recompile on the tunnel. Byte-compares the lowering for
    two very different calibrations."""
    from nind_denoise_tpu.engine.tile_engine import resolve_apply_fn
    from nind_denoise_tpu.ops.qconv import calib_from_image

    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    a = np.random.default_rng(0).random((200, 200, 3), dtype=np.float32)
    fa, pa = resolve_apply_fn("UtNet", params, compute_dtype="int8_static",
                              calib=calib_from_image(a))
    fb, pb = resolve_apply_fn("UtNet", params, compute_dtype="int8_static",
                              calib=calib_from_image(a * 0.05))
    x = jnp.zeros((1, 104, 104, 3), jnp.bfloat16)
    ha = jax.jit(fa).lower(pa, x).as_text()
    hb = jax.jit(fb).lower(pb, x).as_text()
    assert ha == hb


def test_apply_int8_static_miscalibration_saturates_gracefully():
    """Content hotter than the calibration set must SATURATE (bounded
    error), never wrap/NaN: calibrate on 4x-dimmed tiles, run full-range.
    Measured 33.1 dB on this fixture — degraded but graceful; the floor
    pins the no-NaN/no-wrap contract, not quality."""
    from nind_denoise_tpu.ops.qconv import calib_tiles

    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    x = jnp.asarray(np.random.default_rng(0).random((1, 136, 136, 3),
                                                    dtype=np.float32))
    ref = np.asarray(UtNet.apply(params, x))
    derived = jax.jit(UtNet.precompute_int8)(params)
    d_dim = UtNet.calibrate_int8(params, derived, calib_tiles() * 0.25)
    q = np.asarray(UtNet.apply_int8(params, x, derived=d_dim))
    assert np.isfinite(q).all()
    assert _psnr(q, ref) >= 20.0, _psnr(q, ref)


def test_engine_int8_static_mode():
    """make_engine(compute_dtype='int8_static') end-to-end (the product
    path resolve_apply_fn calibrates on the synthetic extremal set)."""
    from nind_denoise_tpu.engine.tile_engine import make_engine

    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, (200, 260, 3), dtype=np.uint16)
    params = UtNet.init(jax.random.PRNGKey(0), funit=8)
    ref = make_engine("UtNet", params, cs=104, ucs=88, batch_size=4,
                      compute_dtype="float32", precision="float32"
                      ).denoise_raw(img, 65535.0, out_dtype="float32")
    out = make_engine("UtNet", params, cs=104, ucs=88, batch_size=4,
                      compute_dtype="int8_static"
                      ).denoise_raw(img, 65535.0, out_dtype="float32")
    assert _psnr(out, ref) >= 42.0, _psnr(out, ref)


def test_apply_int8_odd_size_falls_back(monkeypatch):
    """Odd sizes dispatch to ``apply`` (same defensive contract as
    apply_fast — no engine-legal tile size is odd, see
    test_utnet_fast.test_every_valid_size_takes_the_fast_path)."""
    params = UtNet.init(jax.random.PRNGKey(2), funit=8)
    x = jnp.zeros((1, 137, 137, 3), jnp.float32)
    sentinel = object()
    monkeypatch.setattr(UtNet, "apply",
                        staticmethod(lambda p, t, a="PReLU": sentinel))
    assert UtNet.apply_int8(params, x) is sentinel


def test_engine_int8_mode():
    """make_engine(compute_dtype='int8') end-to-end vs the fp32 engine on a
    real tiled denoise (uint16 raw in, fp32 out). Measured ~52 dB on this
    fixture; floor 45 dB — well above perceptual relevance for an opt-in
    speed mode, well below measured."""
    from nind_denoise_tpu.engine.tile_engine import make_engine

    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, (200, 260, 3), dtype=np.uint16)
    params = UtNet.init(jax.random.PRNGKey(0), funit=8)
    ref_eng = make_engine("UtNet", params, cs=104, ucs=88, batch_size=4,
                          compute_dtype="float32", precision="float32")
    ref = ref_eng.denoise_raw(img, 65535.0, out_dtype="float32")
    q_eng = make_engine("UtNet", params, cs=104, ucs=88, batch_size=4,
                        compute_dtype="int8")
    out = q_eng.denoise_raw(img, 65535.0, out_dtype="float32")
    assert _psnr(out, ref) >= 45.0, _psnr(out, ref)


@pytest.mark.slow
def test_sharded_engine_int8_mode():
    """The multi-device product path (--devices N --compute_dtype int8):
    make_sharded_denoiser with int8 over the 8-device CPU mesh vs the fp32
    single-device engine — same floor as the single-device int8 test (the
    row-band split must not change the quantized forward's quality)."""
    from nind_denoise_tpu.engine.tile_engine import (make_engine,
                                                     make_sharded_denoiser)

    rng = np.random.default_rng(3)
    img = rng.random((200, 260, 3), dtype=np.float32)
    params = UtNet.init(jax.random.PRNGKey(0), funit=8)
    ref = make_engine("UtNet", params, cs=104, ucs=88, batch_size=4,
                      compute_dtype="float32", precision="float32"
                      ).denoise_hwc(img)
    sharded = make_sharded_denoiser("UtNet", params, ndev=8, cs=104, ucs=88,
                                    batch_size=8, compute_dtype="int8")
    out = sharded.denoise_hwc(img)
    assert _psnr(out, ref) >= 45.0, _psnr(out, ref)


def test_resolve_int8_rejects_non_utnet():
    from nind_denoise_tpu.engine.tile_engine import resolve_apply_fn
    from nind_denoise_tpu.models.unet import UNet

    params = UNet.init(jax.random.PRNGKey(0), funit=4)
    with pytest.raises(ValueError, match="int8"):
        resolve_apply_fn("UNet", params, compute_dtype="int8")


def test_calibrate_int8_rejects_odd_calibration_sizes():
    """apply_int8 falls back to the exact forward on odd sizes and cannot
    observe activation scales there — calibrate_int8 must fail loudly on
    an odd calibration batch instead of unpacking garbage."""
    params = UtNet.init(jax.random.PRNGKey(0), funit=8)
    derived = jax.jit(UtNet.precompute_int8)(params)
    calib = jnp.zeros((2, 135, 135, 3), jnp.float32)
    with pytest.raises(ValueError, match="even-sized"):
        UtNet.calibrate_int8(params, derived, calib)


def test_engine_recalibrate_int8_per_image():
    """TileEngine.recalibrate_int8 (round 3): a directory-memoized
    int8_static engine swaps content-matched activation scales per image —
    same weights, same compiled programs (the scales are traced leaves) —
    so the pipeline CLI's fast path gets the calib_from_image quality win.
    Must no-op (False) on non-int8 engines."""
    from nind_denoise_tpu.engine.tile_engine import make_engine

    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    eng = make_engine("UtNet", params, cs=136, ucs=112,
                      compute_dtype="int8_static")
    rng = np.random.default_rng(0)
    dim = (rng.random((150, 160, 3)).astype(np.float32) * 0.06)
    ref = eng.denoise_raw(dim, 1.0, out_dtype="float32")  # synthetic scales
    assert eng.recalibrate_int8(dim) is True
    out = eng.denoise_raw(dim, 1.0, out_dtype="float32")
    # independent oracle: the exact fp32 forward through the same engine
    eng32 = make_engine("UtNet", params, cs=136, ucs=112,
                        compute_dtype="float32", precision="float32")
    exact = eng32.denoise_raw(dim, 1.0, out_dtype="float32")
    p_syn, p_img = _psnr(ref, exact), _psnr(out, exact)
    # measured 65.4 vs 62.5 dB on this fixture (the engine's bf16 tile I/O
    # caps the gain below the forward-level +12 dB of the fp32 fixture)
    assert p_img >= p_syn + 2.0, (p_img, p_syn)

    bf = make_engine("UtNet", params, cs=136, ucs=112)
    assert bf.recalibrate_int8(dim) is False


def test_adaptive_engine_recalibrates_per_request():
    """AdaptiveEngine (serve single + pool replicas, the dir straggler
    pool) auto-recalibrates int8_static scales per request: its output must
    equal a TileEngine explicitly recalibrated on the same image."""
    from nind_denoise_tpu.engine.tile_engine import AdaptiveEngine, make_engine

    params = UtNet.init(jax.random.PRNGKey(3), funit=8)
    rng = np.random.default_rng(1)
    dim = (rng.random((150, 160, 3)).astype(np.float32) * 0.06)

    ae = AdaptiveEngine("UtNet", params, cs=136, ucs=112,
                        compute_dtype="int8_static")
    got = np.asarray(ae.denoise_raw(dim, 1.0, out_dtype="float32"))

    eng = make_engine("UtNet", params, cs=136, ucs=112,
                      compute_dtype="int8_static")
    eng.recalibrate_int8(dim)
    want = np.asarray(eng.denoise_raw(dim, 1.0, out_dtype="float32"))
    np.testing.assert_allclose(got, want, atol=1e-6)
