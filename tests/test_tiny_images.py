"""Tiny-image fallback (TileEngine.denoise_tiny + core.tiles helpers).

Inputs below the minimum tiling abort the reference outright — its
per-tile mirror pad needs pad <= image size (denoise_image.py:151-170),
so UtNet's 504/480 defaults reject anything under ~246 px and even the
smallest adapted tiling rejects ~40 px and below. Here every product
surface (image CLI, pipeline CLI serial fast path, pipeline dir batch)
falls back to mirror-padding the image to the smallest arch-valid
extents, one whole forward, and a crop."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from nind_denoise_tpu.core import tiles
from nind_denoise_tpu.models import params_io
from nind_denoise_tpu.models.utnet import UtNet


@pytest.fixture(scope="module")
def params():
    return UtNet.init(jax.random.PRNGKey(7), funit=8)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, params):
    p = str(tmp_path_factory.mktemp("ckpt") / "generator_1.npz")
    params_io.save(params, p)
    return p


def _write_png(path, arr):
    import cv2

    cv2.imwrite(str(path), arr[..., ::-1] if arr.ndim == 3 else arr)


# -- geometry helpers ---------------------------------------------------------

def test_next_valid_dim_is_minimal_for_utnet():
    for n in (1, 33, 50, 104, 105, 200):
        d = tiles.next_valid_dim(n, UtNet.check_cs)
        assert d >= n
        UtNet.check_cs(d)  # accepted
        for bad in range(n, d):  # independent minimality sweep
            with pytest.raises(ValueError):
                UtNet.check_cs(bad)


def test_next_valid_dim_without_check_rounds_to_64():
    assert tiles.next_valid_dim(1, None) == 64
    assert tiles.next_valid_dim(64, None) == 64
    assert tiles.next_valid_dim(65, None) == 128


def test_pad_to_size_single_step_matches_np_pad():
    rng = np.random.default_rng(0)
    img = rng.random((60, 60, 3), dtype=np.float32)
    out = tiles.pad_to_size(img, 104, 104)
    np.testing.assert_array_equal(
        out, np.pad(img, ((0, 44), (0, 44), (0, 0)), mode="symmetric"))


def test_pad_to_size_grows_past_double():
    rng = np.random.default_rng(1)
    img = rng.random((1, 3, 3), dtype=np.float32)
    out = tiles.pad_to_size(img, 104, 120)
    assert out.shape == (104, 120, 3)
    np.testing.assert_array_equal(out[:1, :3], img)  # original in the corner
    assert np.isfinite(out).all()


# -- engine path --------------------------------------------------------------

def test_denoise_tiny_valid_size_is_plain_forward(params):
    """On an already-valid size the pad is a no-op: denoise_tiny must equal
    the direct reference-shaped forward."""
    from nind_denoise_tpu.engine.tile_engine import make_engine

    rng = np.random.default_rng(2)
    raw = rng.integers(0, 65536, (104, 104, 3), dtype=np.uint16)
    eng = make_engine("UtNet", params, compute_dtype="float32")
    got = eng.denoise_tiny(raw, 65535.0, out_dtype="float32")
    want = np.asarray(UtNet.apply(
        params, (raw.astype(np.float32) / 65535.0)[None])[0])
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_denoise_tiny_matches_manual_pad_oracle(params):
    """60x60 -> padded 104x104 forward -> crop, against a hand-built
    np.pad(symmetric) + direct forward oracle."""
    from nind_denoise_tpu.engine.tile_engine import make_engine

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (60, 60, 3), dtype=np.uint8)
    eng = make_engine("UtNet", params, compute_dtype="float32")
    got = eng.denoise_tiny(raw, 255.0, out_dtype="float32")
    padded = np.pad(raw.astype(np.float32) / 255.0,
                    ((0, 44), (0, 44), (0, 0)), mode="symmetric")
    want = np.asarray(UtNet.apply(params, padded[None])[0][:60, :60])
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert got.shape == (60, 60, 3)


# -- product CLIs -------------------------------------------------------------

def test_image_cli_tiny_input(tmp_path, ckpt):
    from nind_denoise_tpu.pipeline import denoise_image_cli as dic

    rng = np.random.default_rng(4)
    pin = tmp_path / "tiny.png"
    _write_png(pin, rng.integers(0, 256, (33, 47, 3), dtype=np.uint8))
    out = tmp_path / "tiny_out.png"
    dic.main(["-i", str(pin), "-o", str(out), "--network", "UtNet",
              "--model_parameters", "funit=8", "--model_path", ckpt,
              "--exif_method", "noexif"])
    import cv2

    img = cv2.imread(str(out), cv2.IMREAD_UNCHANGED)
    assert img is not None and img.shape[:2] == (33, 47)


def test_pipeline_cli_tiny_file(tmp_path, ckpt):
    """Serial fast path: tiny TIFF through the full pipeline CLI including
    the on-device RL stage."""
    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(5)
    pin = tmp_path / "tiny.tif"
    _write_png(pin, rng.integers(0, 65536, (40, 40, 3), dtype=np.uint16))
    outd = tmp_path / "out"
    outd.mkdir()
    denoise_cli.main([str(pin), "-o", str(outd), "--tiff-input", "-e", "png",
                      "--model_path", ckpt, "--iterations", "2",
                      "--devices", "1"])
    import cv2

    outs = list(outd.iterdir())
    assert len(outs) == 1
    img = cv2.imread(str(outs[0]), cv2.IMREAD_UNCHANGED)
    assert img is not None and img.shape[:2] == (40, 40)


def test_pipeline_dir_batch_with_tiny_images(tmp_path, ckpt):
    """Directory batch over 8 devices where one shape group is below the
    minimum tiling: the tiny group takes the padded-forward path and the
    batch output matches the serial run (both bf16; 1 LSB)."""
    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(6)
    ind = tmp_path / "in"
    ind.mkdir()
    _write_png(ind / "tiny.tif",
               rng.integers(0, 65536, (40, 50, 3), dtype=np.uint16))
    for i in range(2):
        _write_png(ind / f"img{i}.tif",
                   rng.integers(0, 65536, (120, 160, 3), dtype=np.uint16))

    out_s = tmp_path / "serial"
    out_b = tmp_path / "batch"
    out_s.mkdir()
    out_b.mkdir()
    common = ["--tiff-input", "-e", "png", "--model_path", ckpt,
              "--iterations", "2"]
    denoise_cli.main([str(ind), "-o", str(out_s), "--devices", "1"] + common)
    denoise_cli.main([str(ind), "-o", str(out_b), "--devices", "8"] + common)

    import cv2

    names = sorted(p.name for p in out_s.iterdir())
    assert names == sorted(p.name for p in out_b.iterdir())
    assert len(names) == 3
    for n in names:
        a = cv2.imread(str(out_s / n), cv2.IMREAD_UNCHANGED)
        b = cv2.imread(str(out_b / n), cv2.IMREAD_UNCHANGED)
        assert a.shape == b.shape
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, (n, diff.max())


def test_denoise_tiny_respects_max_subpixels(params):
    """The tiny fallback engages automatically (thin strips can be long in
    the other dimension), so --max_subpixels must bound its single whole
    forward exactly like denoise_raw's batch guard (review r3)."""
    from nind_denoise_tpu.engine.tile_engine import make_engine

    raw = np.zeros((20, 600, 3), np.uint8)  # pads to >= 64 x 640
    eng = make_engine("UtNet", params, compute_dtype="float32",
                      max_subpixels=10_000)
    with pytest.raises(RuntimeError, match="max_subpixels"):
        eng.denoise_tiny(raw, 255.0, out_dtype="float32")
    # generous budget: runs
    eng2 = make_engine("UtNet", params, compute_dtype="float32",
                       max_subpixels=10_000_000)
    out = eng2.denoise_tiny(raw, 255.0, out_dtype="float32")
    assert out.shape == raw.shape


def test_denoise_tiny_honors_float32_precision(params):
    """precision='float32' must wrap the tiny forward in
    default_matmul_precision('highest') like the tiled step does — the
    documented bit-parity mode can't silently drop to fast matmuls on the
    tiny path (review r3). On CPU both precisions are exact, so assert the
    wrapper is installed rather than comparing numerics."""
    import jax as _jax

    from nind_denoise_tpu.engine import tile_engine as te

    raw = np.zeros((60, 60, 3), np.uint8)
    eng = make_engine_f32 = te.make_engine(
        "UtNet", params, compute_dtype="float32", precision="float32")
    seen = []
    orig = _jax.default_matmul_precision

    def spy(level):
        seen.append(level)
        return orig(level)

    _jax.default_matmul_precision, te.jax.default_matmul_precision = spy, spy
    try:
        eng.denoise_tiny(raw, 255.0, out_dtype="float32")
    finally:
        _jax.default_matmul_precision = te.jax.default_matmul_precision = orig
    assert "highest" in seen
