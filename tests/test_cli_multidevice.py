"""Multi-device execution through the PRODUCT CLIs (VERDICT r2 item 1).

These drive the real CLI entry points — not the parallel/ classes — over the
virtual 8-device CPU mesh (tests/conftest.py), asserting the multi-device
paths produce the single-device outputs:

* ``denoise_image_cli --devices 8``: row-band tile sharding
  (parallel/sharded_engine) behind the single-image CLI.
* ``denoise_cli <dir> --devices 8``: image-per-device directory batch
  (parallel/batch_engine) behind the pipeline CLI — the reference's serial
  dir loop (/root/reference/src/denoise.py:491-500) parallelized.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from nind_denoise_tpu.core import imgio
from nind_denoise_tpu.models import params_io
from nind_denoise_tpu.models.utnet import UtNet


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    p = str(d / "generator_1.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=8), p)
    return p


def _write_png16(path, rng, h=150, w=200):
    import cv2

    img = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    cv2.imwrite(str(path), img[..., ::-1])
    return img


def _write_tif16(path, rng, h=150, w=200):
    import cv2

    img = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    cv2.imwrite(str(path), img[..., ::-1])
    return img


def test_denoise_image_cli_sharded_matches_single(tmp_path, ckpt):
    """The single-image CLI over 8 devices must reproduce the single-device
    output (fp32 end to end; the only tolerated difference is the fp32
    accumulation order where feather strips from different devices meet)."""
    from nind_denoise_tpu.pipeline import denoise_image_cli as dic

    rng = np.random.default_rng(0)
    pin = tmp_path / "in.png"
    _write_png16(pin, rng)
    common = ["-i", str(pin), "--model_path", ckpt, "--network", "UtNet",
              "--cs", "104", "--ucs", "88", "--compute_dtype", "float32",
              "--precision", "float32", "--exif_method", "noexif"]
    o1, o8 = str(tmp_path / "out1.tiff"), str(tmp_path / "out8.tiff")
    dic.run(dic.build_parser().parse_known_args_layered(
        common + ["-o", o1, "--devices", "1"])[0])
    assert jax.device_count() >= 8, "conftest must provision the 8-CPU mesh"
    dic.run(dic.build_parser().parse_known_args_layered(
        common + ["-o", o8, "--devices", "8"])[0])
    x1, x8 = imgio.load_img(o1), imgio.load_img(o8)
    np.testing.assert_allclose(x8, x1, atol=2e-6)  # ~1 ulp of fp32 around 1.0


def test_denoise_image_cli_sharded_uint16_out(tmp_path, ckpt):
    """16-bit .tif output through the sharded path: quantization conventions
    must match the single-device engine (at most 1 LSB of rounding skew on
    isolated feather-strip pixels)."""
    from nind_denoise_tpu.pipeline import denoise_image_cli as dic

    rng = np.random.default_rng(1)
    pin = tmp_path / "in.png"
    _write_png16(pin, rng, h=120, w=160)
    common = ["-i", str(pin), "--model_path", ckpt, "--network", "UtNet",
              "--cs", "104", "--ucs", "88", "--compute_dtype", "float32",
              "--precision", "float32", "--exif_method", "noexif"]
    o1, o8 = str(tmp_path / "o1.tif"), str(tmp_path / "o8.tif")
    dic.run(dic.build_parser().parse_known_args_layered(
        common + ["-o", o1, "--devices", "1"])[0])
    dic.run(dic.build_parser().parse_known_args_layered(
        common + ["-o", o8, "--devices", "8"])[0])
    import cv2

    u1 = cv2.imread(o1, cv2.IMREAD_UNCHANGED)
    u8 = cv2.imread(o8, cv2.IMREAD_UNCHANGED)
    diff = np.abs(u1.astype(np.int32) - u8.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_denoise_cli_dir_batch_matches_serial(tmp_path, ckpt):
    """Pipeline CLI directory mode over 8 devices vs the serial run. The
    workload covers BOTH multi-device strategies: 5 same-shape images
    (5*2 > 8 -> image-per-device SPMD chunk with sharded per-device RL)
    plus 1 odd-shaped image (1*2 <= 8 -> row-band tile sharding across the
    whole mesh)."""
    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(2)
    ind = tmp_path / "in"
    ind.mkdir()
    for i in range(5):
        _write_tif16(ind / f"img{i}.tif", rng)
    _write_tif16(ind / "odd.tif", rng, h=120, w=180)

    out_s = tmp_path / "serial"
    out_b = tmp_path / "batch"
    out_s.mkdir()
    out_b.mkdir()
    common = ["--tiff-input", "-e", "png", "--model_path", ckpt,
              "--cs", "104", "--ucs", "88", "--iterations", "2"]
    denoise_cli.main([str(ind), "-o", str(out_s), "--devices", "1"] + common)
    denoise_cli.main([str(ind), "-o", str(out_b), "--devices", "8"] + common)

    import cv2

    names = sorted(p.name for p in out_s.iterdir())
    assert names == sorted(p.name for p in out_b.iterdir())
    assert len(names) == 6
    for n in names:
        a = cv2.imread(str(out_s / n), cv2.IMREAD_UNCHANGED)
        b = cv2.imread(str(out_b / n), cv2.IMREAD_UNCHANGED)
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        # all paths run bf16; compare the quantized uint8 output to 1 LSB
        assert diff.max() <= 1, (n, diff.max())


def test_denoise_cli_dir_batch_nightmode_no_deblur(tmp_path, ckpt):
    """--nightmode --no_deblur directory batch through the multi-device
    path (the BASELINE config #5 shape): .tiff outputs, no RL stage."""
    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(3)
    ind = tmp_path / "in"
    ind.mkdir()
    imgs = [_write_tif16(ind / f"i{i}.tif", rng, h=120, w=160)
            for i in range(2)]
    outd = tmp_path / "out"
    outd.mkdir()
    denoise_cli.main([str(ind), "-o", str(outd), "--tiff-input", "-e", "tiff",
                      "--nightmode", "--no_deblur", "--model_path", ckpt,
                      "--cs", "104", "--ucs", "88", "--devices", "8"])
    outs = sorted(outd.iterdir())
    assert len(outs) == 2
    for p in outs:
        x = imgio.load_img(str(p))
        assert x.shape == (3, 120, 160) and np.isfinite(x).all()


def test_denoise_image_cli_sharded_unet(tmp_path):
    """UNet (BN-state generator) through the sharded CLI path: the
    resolve_apply_fn (params, state) handling must survive mesh
    replication; 8-device output matches single-device."""
    from nind_denoise_tpu.models.unet import UNet
    from nind_denoise_tpu.pipeline import denoise_image_cli as dic

    params, state = UNet.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "generator_unet_1.npz")
    params_io.save({"params": params, "state": state}, ckpt)
    rng = np.random.default_rng(3)
    pin = tmp_path / "in.png"
    _write_png16(pin, rng, h=150, w=200)
    common = ["-i", str(pin), "--model_path", ckpt, "--network", "UNet",
              "--cs", "128", "--ucs", "96",  # small tiles: CPU-sized UNet run
              "--compute_dtype", "float32", "--precision", "float32",
              "--exif_method", "noexif"]
    o1, o8 = str(tmp_path / "o1.tiff"), str(tmp_path / "o8.tiff")
    dic.run(dic.build_parser().parse_known_args_layered(
        common + ["-o", o1, "--devices", "1"])[0])
    dic.run(dic.build_parser().parse_known_args_layered(
        common + ["-o", o8, "--devices", "8"])[0])
    from nind_denoise_tpu.core import imgio

    x1, x8 = imgio.load_img(o1), imgio.load_img(o8)
    np.testing.assert_allclose(x8, x1, atol=2e-6)


def test_small_image_default_tiling_adapts(tmp_path, ckpt):
    """denoise_image_cli with the UtNet DEFAULT tiling (504/480) on a small
    image: core/tiles.adapt_cs_ucs shrinks the tile instead of raising
    (the reference crashes below ~246 px)."""
    from nind_denoise_tpu.pipeline import denoise_image_cli as dic

    rng = np.random.default_rng(9)
    pin = tmp_path / "small.png"
    _write_png16(pin, rng, h=150, w=180)
    out = str(tmp_path / "out.tiff")
    ns = dic.build_parser().parse_known_args_layered(
        ["-i", str(pin), "-o", out, "--model_path", ckpt,
         "--network", "UtNet", "--compute_dtype", "float32",
         "--exif_method", "noexif", "--devices", "1"])[0]
    dic.run(ns)  # default cs/ucs resolve to 504/480 -> must adapt, not raise
    x = imgio.load_img(out)
    assert x.shape == (3, 150, 180) and np.isfinite(x).all()


def test_batch_engine_program_reuse_across_shapes(ckpt):
    """CLAUDE.md invariant: compiled programs keyed by BUCKETED shapes.
    Two different image sizes in the same buckets must share one compiled
    tile-loop program (review r3: the first cut baked coords in as
    constants and compiled per exact shape — 30s-15min per remote compile)."""
    from nind_denoise_tpu.engine.tile_engine import resolve_apply_fn
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.parallel import mesh as pmesh
    from nind_denoise_tpu.parallel.batch_engine import DeviceBatchDenoiser

    params, _ = params_io.load_generator(ckpt, "UtNet")
    apply_fn, params = resolve_apply_fn("UtNet", params)
    eng = DeviceBatchDenoiser(apply_fn, params, cs=104, ucs=88,
                              tiles_per_dispatch=1,
                              mesh=pmesh.make_mesh(8))
    rng = np.random.default_rng(0)
    a = rng.random((2, 150, 200, 3)).astype(np.float32)   # 6 tiles -> ntb 8
    b = rng.random((2, 160, 180, 3)).astype(np.float32)   # 6 tiles -> ntb 8
    ya = np.asarray(eng.denoise_batch(a))
    yb = np.asarray(eng.denoise_batch(b))
    assert ya.shape == a.shape and yb.shape == b.shape
    assert np.isfinite(ya).all() and np.isfinite(yb).all()
    assert len(eng._step_cache) == 1, eng._step_cache.keys()


def test_denoise_cli_dir_mixed_shapes_pooled(tmp_path, ckpt, capsys):
    """Directory of mixed-shape stragglers (every shape appears once, so
    the image-batcher can never fill a chunk): the CLI must route them
    through the request-per-device pool (parallel/engine_pool) — one image
    per chip, concurrently — rather than the serial row-band pass, and the
    outputs must match the single-device run. The 33x47 image is below the
    minimum tiling and exercises the pool replica's tiny fallback."""
    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(9)
    ind = tmp_path / "in"
    ind.mkdir()
    _write_tif16(ind / "a.tif", rng, h=150, w=200)
    _write_tif16(ind / "b.tif", rng, h=120, w=180)
    _write_tif16(ind / "c.tif", rng, h=140, w=160)
    _write_tif16(ind / "tiny.tif", rng, h=33, w=47)

    out_s = tmp_path / "serial"
    out_p = tmp_path / "pool"
    out_s.mkdir()
    out_p.mkdir()
    common = ["--tiff-input", "-e", "png", "--model_path", ckpt,
              "--cs", "104", "--ucs", "88", "--iterations", "2"]
    denoise_cli.main([str(ind), "-o", str(out_s), "--devices", "1"] + common)
    denoise_cli.main([str(ind), "-o", str(out_p), "--devices", "8"] + common)
    assert "(pool: " in capsys.readouterr().out  # routing, not a fallback

    import cv2

    names = sorted(p.name for p in out_s.iterdir())
    assert names == sorted(p.name for p in out_p.iterdir())
    assert len(names) == 4
    for n in names:
        a = cv2.imread(str(out_s / n), cv2.IMREAD_UNCHANGED)
        b = cv2.imread(str(out_p / n), cv2.IMREAD_UNCHANGED)
        assert a is not None and a.shape == b.shape
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1, (n, diff.max())
