"""Pipeline tests: XMP history splitting against a synthetic darktable
sidecar, and the full denoise CLI end-to-end with --tiff-input (no darktable
/ gmic binaries needed; on-device RL-deblur path)."""

import os
import pathlib

import numpy as np
import pytest
from bs4 import BeautifulSoup

from nind_denoise_tpu.pipeline import xmp

SIDECAR = """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:darktable="http://darktable.sf.net/"
    darktable:iop_order_version="3"
    darktable:iop_order_list="rawprepare,0,temperature,0,highlights,0,demosaic,0,colorin,0,exposure,0,sharpen,0,colorout,0">
   <darktable:history>
    <rdf:Seq>
     <rdf:li darktable:num="2" darktable:operation="sharpen" darktable:enabled="1" darktable:params="aa"/>
     <rdf:li darktable:num="0" darktable:operation="demosaic" darktable:enabled="1" darktable:params="bb"/>
     <rdf:li darktable:num="1" darktable:operation="exposure" darktable:enabled="1" darktable:params="cc"/>
     <rdf:li darktable:num="3" darktable:operation="flip" darktable:enabled="1" darktable:params="dd"/>
     <rdf:li darktable:num="4" darktable:operation="toneequal" darktable:enabled="1" darktable:params="ee"/>
     <rdf:li darktable:num="5" darktable:operation="mystery_op" darktable:enabled="1" darktable:params="ff"/>
     <rdf:li darktable:num="6" darktable:operation="colorin" darktable:enabled="1" darktable:params="gg"/>
    </rdf:Seq>
   </darktable:history>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
"""


def _ops(soup):
    return {li["darktable:operation"]: li
            for li in soup.find("darktable:history").find_all("rdf:li")}


@pytest.fixture
def sidecar(tmp_path):
    p = tmp_path / "img.nef.xmp"
    p.write_text(SIDECAR)
    return p


def test_split_history_stages(sidecar):
    cfg = xmp.read_config()
    xmp.split_history(sidecar, cfg)
    s1 = BeautifulSoup(sidecar.with_suffix(".s1.xmp").read_text(), "xml")
    s2 = BeautifulSoup(sidecar.with_suffix(".s2.xmp").read_text(), "xml")

    ops1 = _ops(s1)
    # first stage: development ops only; sharpen/toneequal/mystery removed
    assert set(ops1) == {"demosaic", "exposure", "flip", "colorin"}
    assert ops1["flip"]["darktable:enabled"] == "0"  # kept but disabled

    ops2 = _ops(s2)
    # second stage: first-stage-only ops removed; unknown ops kept (K/K/R/K)
    assert "demosaic" not in ops2 and "exposure" not in ops2
    assert set(ops2) >= {"sharpen", "toneequal", "mystery_op", "flip", "colorin"}
    # colorin override applied
    assert ops2["colorin"]["darktable:modversion"] == "7"
    desc = s2.find("rdf:Description")
    assert desc["darktable:iop_order_version"] == "5"
    # colorin moved right after demosaic in the iop order
    assert "demosaic,0,colorin,0" in desc["darktable:iop_order_list"]
    assert not desc["darktable:iop_order_list"].startswith("colorin")


def test_split_history_nightmode(sidecar):
    cfg = xmp.read_config(nightmode=True)
    xmp.split_history(sidecar, cfg)
    s1 = BeautifulSoup(sidecar.with_suffix(".s1.xmp").read_text(), "xml")
    s2 = BeautifulSoup(sidecar.with_suffix(".s2.xmp").read_text(), "xml")
    assert "toneequal" in _ops(s1)      # moved into stage 1
    assert "toneequal" not in _ops(s2)  # and out of stage 2


def test_nightmode_config_rewrite():
    cfg = xmp.read_config(nightmode=True)
    assert "exposure" in cfg["operations"]["first_stage"]
    assert "toneequal" in cfg["operations"]["first_stage"]
    assert "toneequal" not in cfg["operations"]["second_stage"]


@pytest.fixture
def tiny_checkpoint(tmp_path):
    import jax

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    params = UtNet.init(jax.random.PRNGKey(0), funit=2)
    p = str(tmp_path / "models" / "utnet_tiny" / "generator_1.npz")
    params_io.save(params, p)
    return p


def test_denoise_cli_tiff_input_end_to_end(tmp_path, tiny_checkpoint, sidecar):
    """Full pipeline on a TIFF input: denoise + on-device RL deblur -> jpg."""
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(0)
    img = (rng.random((200, 220, 3)) * 65535).astype(np.uint16)
    tif = tmp_path / "img.tif"
    cv2.imwrite(str(tif), img)
    # sidecar named like the tiff input
    (tmp_path / "img.tif.xmp").write_text(SIDECAR)

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    denoise_cli.main([
        str(tif), "--tiff-input", "-o", str(out_dir), "-q", "97",
        "--model_path", tiny_checkpoint, "--cs", "104", "--ucs", "88",
        "--batch_size", "2",
    ])
    outs = list(out_dir.iterdir())
    assert len(outs) == 1 and outs[0].suffix == ".jpg", outs
    back = cv2.imread(str(outs[0]))
    assert back.shape == (200, 220, 3)


def test_denoise_cli_verbose_stage_timers(tmp_path, tiny_checkpoint, capsys):
    """--verbose prints the per-stage wall-time summary (StageTimers)."""
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(1)
    img = (rng.random((120, 130, 3)) * 65535).astype(np.uint16)
    tif = tmp_path / "img.tif"
    cv2.imwrite(str(tif), img)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    denoise_cli.main([
        str(tif), "--tiff-input", "-o", str(out_dir),
        "--model_path", tiny_checkpoint, "--cs", "104", "--ucs", "88",
        "--batch_size", "2", "--verbose",
    ])
    out = capsys.readouterr().out
    assert "stages: " in out and "denoise: " in out and "rl+encode: " in out


def test_denoise_cli_tiff_directory_mode(tmp_path, tiny_checkpoint):
    """Directory input with --tiff-input: every TIFF is processed (the
    reference's dir loop only matched RAW extensions, so its TIFF dir mode
    silently did nothing) with decode-ahead prefetch across images."""
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(5)
    src = tmp_path / "batch"
    src.mkdir()
    for i in range(3):
        img = (rng.random((150, 160, 3)) * 65535).astype(np.uint16)
        cv2.imwrite(str(src / f"im{i}.tif"), img)
    (src / "notes.txt").write_text("ignored")
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    denoise_cli.main([
        str(src), "--tiff-input", "-o", str(out_dir),
        "--model_path", tiny_checkpoint, "--cs", "104", "--ucs", "88",
        "--batch_size", "2",
    ])
    outs = sorted(p.name for p in out_dir.iterdir())
    assert outs == ["im0.jpg", "im1.jpg", "im2.jpg"], outs


def test_denoise_cli_no_deblur(tmp_path, tiny_checkpoint):
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(1)
    img = (rng.random((150, 150, 3)) * 65535).astype(np.uint16)
    tif = tmp_path / "pic.tif"
    cv2.imwrite(str(tif), img)

    out_dir = tmp_path / "out2"
    out_dir.mkdir()
    denoise_cli.main([
        str(tif), "--tiff-input", "--no_deblur", "-o", str(out_dir),
        "-e", "jpg", "--model_path", tiny_checkpoint,
        "--cs", "104", "--ucs", "88", "--batch_size", "2",
    ])
    outs = list(out_dir.iterdir())
    assert len(outs) == 1
    assert outs[0].suffix == ".jpg"


def test_collision_naming(tmp_path, tiny_checkpoint):
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    img = (np.random.default_rng(2).random((120, 120, 3)) * 65535).astype(np.uint16)
    tif = tmp_path / "c.tif"
    cv2.imwrite(str(tif), img)
    out_dir = tmp_path / "out3"
    out_dir.mkdir()
    argv = [str(tif), "--tiff-input", "--no_deblur", "-o", str(out_dir),
            "--model_path", tiny_checkpoint, "--cs", "104", "--ucs", "88"]
    denoise_cli.main(argv)
    denoise_cli.main(argv)  # second run must get the _1 suffix
    names = sorted(p.name for p in out_dir.iterdir())
    assert names == ["c.jpg", "c_1.jpg"], names


def test_cli_rl_psf_gmic_fast(tmp_path, tiny_checkpoint):
    """--rl-psf gmic_fast plumbs through the fast path: output differs from
    the gaussian-PSF default (distinct deconvolutions) but stays a valid
    image."""
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(0)
    img = (rng.random((120, 150, 3)) * 65535).astype(np.uint16)
    tif = tmp_path / "in.tif"
    cv2.imwrite(str(tif), img[..., ::-1])
    outs = {}
    for psf in ("gaussian", "gmic_fast"):
        outd = tmp_path / psf
        outd.mkdir()
        denoise_cli.main([str(tif), "--tiff-input", "-o", str(outd),
                          "-e", "png", "--model_path", tiny_checkpoint,
                          "--cs", "104", "--ucs", "88", "--iterations", "2",
                          "--rl-psf", psf, "--devices", "1"])
        outs[psf] = cv2.imread(str(outd / "in.png"), cv2.IMREAD_UNCHANGED)
        assert outs[psf] is not None
    assert np.abs(outs["gaussian"].astype(np.int32)
                  - outs["gmic_fast"].astype(np.int32)).max() > 0


def test_cli_small_image_fast_path(tmp_path, tiny_checkpoint):
    """Pipeline CLI on a small TIFF with the DEFAULT tiling (504/480):
    the serial fast path must adapt the tile size instead of raising
    (review r3 finding)."""
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(4)
    img = (rng.random((150, 180, 3)) * 65535).astype(np.uint16)
    tif = tmp_path / "small.tif"
    cv2.imwrite(str(tif), img[..., ::-1])
    outd = tmp_path / "out"
    outd.mkdir()
    denoise_cli.main([str(tif), "--tiff-input", "-o", str(outd), "-e", "png",
                      "--model_path", tiny_checkpoint, "--iterations", "2",
                      "--devices", "1"])
    out = cv2.imread(str(outd / "small.png"), cv2.IMREAD_UNCHANGED)
    assert out is not None and out.shape == (150, 180, 3)


def _psnr_u16(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(65535.0 ** 2 / max(float((d ** 2).mean()), 1e-12))


@pytest.mark.slow  # three engine builds (f32 + 2x int8 programs)
def test_denoise_cli_compute_dtype_int8_serial_and_batch(tmp_path,
                                                         tiny_checkpoint):
    """--compute_dtype int8_static through the PIPELINE CLI (round 3): the
    serial per-file path (per-image calibration via the image CLI) and the
    directory batch path (synthetic calibration — shared SPMD program)
    must both run quantized and stay close to the float32 output."""
    import cv2

    from nind_denoise_tpu.pipeline import denoise_cli

    rng = np.random.default_rng(7)
    src = tmp_path / "din"
    src.mkdir()
    for i in range(2):
        cv2.imwrite(str(src / f"im{i}.tif"),
                    (rng.random((150, 160, 3)) * 65535).astype(np.uint16))

    outs = {}
    for tag, extra in (("f32", ["--compute_dtype", "float32"]),
                       ("q_serial", ["--compute_dtype", "int8_static",
                                     "--devices", "1"]),
                       ("q_batch", ["--compute_dtype", "int8_static",
                                    "--devices", "8"])):
        od = tmp_path / f"out_{tag}"
        od.mkdir()
        denoise_cli.main([str(src), "--tiff-input", "--no_deblur",
                          "-e", "png", "-o", str(od),
                          "--model_path", tiny_checkpoint,
                          "--cs", "104", "--ucs", "88",
                          "--batch_size", "2"] + extra)
        outs[tag] = {p.name: cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
                     for p in od.iterdir()}
        assert sorted(outs[tag]) == ["im0.png", "im1.png"], sorted(outs[tag])

    for name in outs["f32"]:
        # quantization noise bound; exact floors are pinned in test_qconv
        assert _psnr_u16(outs["q_serial"][name], outs["f32"][name]) >= 35.0
        assert _psnr_u16(outs["q_batch"][name], outs["f32"][name]) >= 35.0
    # and the quantized paths are actually different programs from f32
    assert any((outs["q_serial"][n] != outs["f32"][n]).any()
               for n in outs["f32"])


def test_missing_xmp_skips_file_not_crash(tmp_path, tiny_checkpoint):
    """A RAW whose .xmp sidecar is missing must be SKIPPED with a message
    (hardening over the reference, which crashes the directory run inside
    the history parser once the RAW alone passes the good-file check)."""
    from nind_denoise_tpu.pipeline import denoise_cli

    raw = tmp_path / "shot.nef"
    raw.write_bytes(b"not really a nef")
    ns = denoise_cli.build_parser().parse_args(
        [str(raw), "-o", str(tmp_path), "--model_path", tiny_checkpoint,
         "--dt", "/bin/true"])  # a darktable stand-in so the RAW path runs
    out = denoise_cli.denoise_file(ns, raw)
    assert out is None  # skipped, no exception, nothing written
    assert not list(tmp_path.glob("*.jpg"))
