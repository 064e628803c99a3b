"""TileEngine tests: on-device stitch must equal the numpy reference stitch,
and an identity network must reconstruct the input."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nind_denoise_tpu.core import tiles
from nind_denoise_tpu.engine.tile_engine import TileEngine
from nind_denoise_tpu.models.utnet import UtNet


def test_identity_network_reconstructs():
    eng = TileEngine(lambda p, x: x, params={}, cs=64, ucs=48, ol=4,
                     batch_size=3, compute_dtype="float32")
    rng = np.random.default_rng(0)
    img = rng.random((3, 100, 130), dtype=np.float32)
    out = eng.denoise_chw(img)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_engine_program_reuse_across_sizes():
    """Same invariant as test_sharded_program_reuse_across_sizes, for the
    single-device engine: _step is keyed on (batch, cs, BUCKETed band/canvas
    widths), so a mixed-resolution workload must reuse compiled programs —
    each new program is a 30s-15min remote compile in the deployment. A
    width crossing the 512 bucket must add programs; a same-bucket size
    must add none."""
    eng = TileEngine(lambda p, x: x, params={}, cs=64, ucs=48, ol=4,
                     batch_size=3, compute_dtype="float32")
    rng = np.random.default_rng(4)
    a = rng.random((100, 130, 3), dtype=np.float32)
    np.testing.assert_allclose(eng.denoise_hwc(a), a, atol=1e-6)
    n0 = eng._step._cache_size()
    assert n0 >= 1
    b = rng.random((110, 133, 3), dtype=np.float32)  # same buckets
    np.testing.assert_allclose(eng.denoise_hwc(b), b, atol=1e-6)
    assert eng._step._cache_size() == n0
    c = rng.random((100, 700, 3), dtype=np.float32)  # crosses W bucket
    np.testing.assert_allclose(eng.denoise_hwc(c), c, atol=1e-6)
    assert eng._step._cache_size() > n0


@pytest.mark.slow  # >20 s on the 1-core host
def test_engine_matches_host_stitch():
    params = UtNet.init(jax.random.PRNGKey(0), funit=4)
    apply_fn = lambda p, x: UtNet.apply(p, x)
    eng = TileEngine(apply_fn, params, cs=104, ucs=88, ol=6, batch_size=2,
                     compute_dtype="float32")
    rng = np.random.default_rng(1)
    img = rng.random((150, 170, 3), dtype=np.float32)

    got = eng.denoise_hwc(img)

    plan = tiles.TilePlan(150, 170, 104, 88, 6)
    padded = plan.pad_image(img)
    canvas = plan.new_canvas()
    jfwd = jax.jit(apply_fn)
    for batch in plan.batches(2):
        out = np.asarray(jfwd(params, jnp.asarray(plan.gather(padded, batch))))
        plan.scatter_add(canvas, out, batch)
    ref = plan.finalize(canvas)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_partial_batch_padding():
    """ntiles not divisible by batch_size must not change the result."""
    eng5 = TileEngine(lambda p, x: x, params={}, cs=64, ucs=48, ol=4,
                      batch_size=5, compute_dtype="float32")
    rng = np.random.default_rng(2)
    img = rng.random((3, 100, 130), dtype=np.float32)
    np.testing.assert_allclose(eng5.denoise_chw(img), img, atol=1e-6)


def test_max_subpixels_guard():
    eng = TileEngine(lambda p, x: x, params={}, cs=64, ucs=48, ol=4,
                     batch_size=2, compute_dtype="float32", max_subpixels=10)
    img = np.zeros((3, 100, 100), dtype=np.float32)
    with pytest.raises(RuntimeError, match="max_subpixels"):
        eng.denoise_chw(img)


def test_whole_image_mode():
    eng = TileEngine(lambda p, x: x, params={}, cs=64, ucs=48,
                     compute_dtype="float32")
    rng = np.random.default_rng(3)
    img = rng.random((3, 40, 52), dtype=np.float32)
    out = eng.denoise_whole(img, pad=4)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_whole_image_invalid_arch_size_pads_to_valid():
    """denoise_whole on a size violating UtNet's validity formula (most
    real photo dims — the reference CRASHES there, networks/UtNet.py:6-7)
    must mirror-pad to the next valid extents, forward once, and crop:
    output == the manual pad_to_size -> apply -> crop oracle (r5)."""
    import jax

    from nind_denoise_tpu.core import tiles as tiles_mod
    from nind_denoise_tpu.engine.tile_engine import make_engine
    from nind_denoise_tpu.models.utnet import UtNet

    h, w = 180, 200  # H invalid ((180/2-4)/2 odd), W valid
    with pytest.raises(ValueError):
        UtNet.check_cs(h)
    UtNet.check_cs(w)
    rng = np.random.default_rng(5)
    img = rng.random((3, h, w), dtype=np.float32)
    params = UtNet.init(jax.random.PRNGKey(1), funit=4)
    eng = make_engine("UtNet", params, cs=104, ucs=88, batch_size=2,
                      compute_dtype="float32", precision="float32")
    out = eng.denoise_whole(img)
    assert out.shape == img.shape and np.isfinite(out).all()

    th = tiles_mod.next_valid_dim(h, UtNet.check_cs)
    hwc = tiles_mod.pad_to_size(img.transpose(1, 2, 0), th, w)
    import jax.numpy as jnp

    with jax.default_matmul_precision("highest"):
        want = np.asarray(UtNet.apply_fast(params, jnp.asarray(hwc)[None])
                          )[0, :h, :w].transpose(2, 0, 1)
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_bf16_default_path_quality_floor():
    """The PRODUCT DEFAULT inference dtype is bfloat16
    (denoise_image_cli --compute_dtype default) while every parity test
    runs fp32 — this pins the default path's output quality so a future
    change cannot silently degrade it (VERDICT r2 item 4). Threshold:
    measured 68.4 dB PSNR vs the fp32 engine on this fixture (random
    UtNet funit=8, 200x260 uint16 input); asserted at >= 55 dB, an order
    of magnitude above any perceptually relevant degradation and well
    below measured, so only a real regression trips it. Approximates the
    unclipped fp32 semantics of denoise_image.py:246,267-270."""
    import jax

    from nind_denoise_tpu.engine.tile_engine import make_engine
    from nind_denoise_tpu.models.utnet import UtNet

    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, (200, 260, 3), dtype=np.uint16)
    params = UtNet.init(jax.random.PRNGKey(0), funit=8)
    outs = {}
    for dt, prec in (("float32", "float32"), ("bfloat16", "default")):
        eng = make_engine("UtNet", params, cs=104, ucs=88, batch_size=4,
                          compute_dtype=dt, precision=prec)
        outs[dt] = eng.denoise_raw(img, 65535.0, out_dtype="float32")
    d = outs["bfloat16"].astype(np.float64) - outs["float32"].astype(np.float64)
    psnr = 10 * np.log10(1.0 / max((d ** 2).mean(), 1e-20))
    assert psnr >= 55.0, f"bf16 default path degraded: {psnr:.1f} dB vs fp32"


def test_whole_jit_precision_shared(monkeypatch):
    """denoise_whole and denoise_tiny share ONE jitted whole forward that
    honors precision='float32' (review r3: denoise_whole built _whole_jit
    without the default_matmul_precision wrapper, and whichever of the two
    ran first fixed the semantics for both)."""
    entered = []
    real = jax.default_matmul_precision

    def spy(level):
        entered.append(level)
        return real(level)

    monkeypatch.setattr(jax, "default_matmul_precision", spy)
    eng = TileEngine(lambda p, x: x, params={}, cs=64, ucs=48,
                     compute_dtype="float32", precision="float32")
    img = np.random.default_rng(5).random((3, 40, 52), dtype=np.float32)
    out = eng.denoise_whole(img, pad=4)  # whole path FIRST
    np.testing.assert_allclose(out, img, atol=1e-6)
    assert "highest" in entered, "denoise_whole skipped the f32 precision ctx"
    assert eng._get_whole_jit() is eng._whole_jit  # one shared program
