"""Coverage for the remaining untested reference-parity surfaces:

* pipeline/external.py — the darktable-cli stage-1/stage-2 and gmic argv
  CONTRACTS (/root/reference/src/denoise.py:397-410, :448-460, :470-475),
  pinned with fake recording binaries so no darktable/gmic is needed.
* pipeline/external.download_model — file:// fetch + failure cleanup.
* tools/pick_validation_set, tools/make_dataset_crops_list,
  tools/filter_dataset_by_iso — the three dataset tools (SURVEY §2.7).
"""

import os
import pathlib
import stat

import numpy as np
import pytest

from nind_denoise_tpu.pipeline import external


def _fake_tool(tmp_path, name, touch_arg=None):
    """Shell script that records its argv (one per line) and optionally
    creates the file named by positional arg ``touch_arg`` (darktable's
    exported image) in the CWD it was invoked with."""
    rec = tmp_path / f"{name}.argv"
    script = tmp_path / name
    touch = f'touch "${touch_arg}"\n' if touch_arg else ""
    script.write_text("#!/bin/sh\n"
                      f'printf \'%s\\n\' "$@" > "{rec}"\n'
                      f"{touch}")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script), rec


def test_stage1_argv_contract(tmp_path):
    """denoise.py:397-406: <raw> <s1.xmp> <outname> --apply-custom-presets
    false --core --conf bpp=32 --conf compress=0, run with cwd=out dir."""
    dt, rec = _fake_tool(tmp_path, "darktable-cli", touch_arg="3")
    raw = tmp_path / "shot.nef"
    xmp = tmp_path / "shot.s1.xmp"
    outd = tmp_path / "out"
    outd.mkdir()
    out = outd / "shot_s1.tif"
    external.run_darktable_stage1(dt, raw, xmp, out)
    argv = rec.read_text().splitlines()
    assert argv == [str(raw), str(xmp), "shot_s1.tif",
                    "--apply-custom-presets", "false", "--core",
                    "--conf", "plugins/imageio/format/tiff/bpp=32",
                    "--conf", "plugins/imageio/format/tiff/compress=0"]
    assert out.exists()  # created in cwd=out.parent by the fake


def test_stage1_missing_output_raises(tmp_path):
    """denoise.py:408-410: ChildProcessError when the export is missing."""
    dt, _ = _fake_tool(tmp_path, "darktable-cli")  # touches nothing
    with pytest.raises(ChildProcessError):
        external.run_darktable_stage1(dt, tmp_path / "a.nef",
                                      tmp_path / "a.s1.xmp",
                                      tmp_path / "a_s1.tif")


@pytest.mark.parametrize("height,want_h,want_w", [
    ("0", "0", "0"),          # no resize: both 0
    ("2442", "2442", "100000"),  # --height sets width=100000 (:446-447)
])
def test_stage2_argv_contract(tmp_path, height, want_h, want_w):
    """denoise.py:448-460 incl. the height->width=100000 rule."""
    dt, rec = _fake_tool(tmp_path, "darktable-cli")
    den = tmp_path / "x_s1_denoised.tiff"
    xmp = tmp_path / "x.s2.xmp"
    out = tmp_path / "x_s2.tif"
    external.run_darktable_stage2(dt, den, xmp, out, height=height)
    argv = rec.read_text().splitlines()
    assert argv == [str(den), str(xmp), "x_s2.tif",
                    "--icc-intent", "PERCEPTUAL", "--icc-type", "SRGB",
                    "--apply-custom-presets", "false",
                    "--upscale", "1", "--height", want_h, "--width", want_w,
                    "--core",
                    "--conf", "plugins/imageio/format/tiff/bpp=16",
                    "--conf", "plugins/imageio/format/tiff/compress=0",
                    "--conf", "plugins/imageio/format/tiff/pixelformat=FALSE"]


def test_gmic_argv_contract(tmp_path):
    """denoise.py:470-475: -deblur_richardsonlucy s,i,1 -/ 256 cut 0,255
    round -o out,quality."""
    gm, rec = _fake_tool(tmp_path, "gmic")
    inp = tmp_path / "x_s2.tif"
    external.run_gmic_rl_deblur(gm, inp, "final.jpg", 1, 10, "97")
    argv = rec.read_text().splitlines()
    assert argv == [str(inp), "-deblur_richardsonlucy", "1,10,1",
                    "-/", "256", "cut", "0,255", "round",
                    "-o", "final.jpg,97"]


def test_download_model_file_url(tmp_path):
    src = tmp_path / "ckpt.bin"
    src.write_bytes(b"weights")
    dest = tmp_path / "models" / "generator_650.pt"
    external.download_model(src.as_uri(), str(dest))
    assert dest.read_bytes() == b"weights"


def test_download_model_failure_cleans_partial(tmp_path):
    dest = tmp_path / "m" / "g.pt"
    with pytest.raises(RuntimeError, match="could not download"):
        external.download_model((tmp_path / "missing.bin").as_uri(), str(dest))
    assert not dest.exists() and not pathlib.Path(str(dest) + ".part").exists()


# -- dataset tools ------------------------------------------------------------

def _write_crop_layout(root, scenes, isos, cs=168, n_crops=2, seed=0):
    """<root>/TEST_192_<cs>/<scene>/ISO<v>/TEST_<scene>_<iso>_<x>_<y>_<cs>.png"""
    import cv2

    rng = np.random.default_rng(seed)
    ds = root / f"TEST_192_{cs}"
    for scene in scenes:
        base = rng.random((cs, cs, 3)).astype(np.float32)
        for iso, sigma in isos:
            d = ds / scene / iso
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_crops):
                img = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
                fn = f"TEST_{scene}_{iso}_{i * cs}_0_{cs}.png"
                cv2.imwrite(str(d / fn), (img * 65535).astype(np.uint16))
    return ds


def test_pick_validation_set(tmp_path):
    """Pairs come only from reserved sets; yaml schema [[clean, noisy], ...]
    with existing files; clean side is the base ISO
    (tools/pick_validation_set.py:1-73 parity)."""
    import yaml

    from nind_denoise_tpu.tools import pick_validation_set as pvs

    ds = _write_crop_layout(tmp_path, ["sceneA", "reservedB"],
                            [("ISO200", 0.0), ("ISO6400", 0.1)], cs=32)
    reserve = tmp_path / "reserve.yaml"
    reserve.write_text("- reservedB\n")
    outd = tmp_path / "cfg"
    out_fpath = pvs.main(["--train_data", str(ds),
                          "--test_reserve", str(reserve),
                          "--out_dir", str(outd), "-n", "3", "--seed", "1"])
    pairs = yaml.safe_load(open(out_fpath))
    assert len(pairs) == 2  # only reservedB's 2 crops qualify
    for clean, noisy in pairs:
        assert "reservedB" in clean and "reservedB" in noisy
        assert "ISO200" in clean and "ISO6400" in noisy
        assert os.path.isfile(clean) and os.path.isfile(noisy)
    assert os.path.basename(out_fpath).startswith("validation_set_2_TEST_192_32_")


def test_make_dataset_crops_list(tmp_path):
    """CSV rows (xpath, ypath, msssim) for every pair; clean-vs-clean
    scores ~1 (tools/make_dataset_crops_list.py:1-39 parity; MS-SSIM needs
    >= 162 px, pt_losses.py:29)."""
    from nind_denoise_tpu.tools import make_dataset_crops_list as mkcsv

    ds = _write_crop_layout(tmp_path, ["sceneA"],
                            [("ISO200", 0.0), ("ISO3200", 0.2)],
                            cs=168, n_crops=1)
    outd = tmp_path / "csv"
    mkcsv.main(["--train_data", str(ds), "--out_dir", str(outd)])
    csv_path = outd / "TEST_192_168-msssim.csv"
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].split(",")[:3] == ["xpath", "ypath", "score"]
    rows = [ln.rsplit(",", 1) for ln in lines[1:]]
    assert len(rows) == 1  # one scene x one crop x one noisy ISO
    score = float(rows[0][1])
    assert 0.0 < score < 1.0  # sigma=0.2 noise must cost quality
    assert "ISO200" in rows[0][0] and "ISO3200" in rows[0][0]


def test_filter_dataset_by_iso(tmp_path):
    """EXIF-ISO gate via the PIL fallback chain
    (libimganalysis.get_iso parity)."""
    Image = pytest.importorskip("PIL.Image")

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    rng = np.random.default_rng(0)

    def write_jpg(name, iso=None):
        im = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        kw = {}
        if iso is not None:
            exif = Image.Exif()
            exif[34855] = iso
            kw["exif"] = exif
        im.save(str(src / name), **kw)

    write_jpg("low.jpg", iso=100)
    write_jpg("high.jpg", iso=800)
    write_jpg("none.jpg")

    from nind_denoise_tpu.tools import filter_dataset_by_iso as fbi

    fbi.main(["--src_dir", str(src), "--dst_dir", str(dst), "--max_iso", "200"])
    kept = sorted(p.name for p in dst.iterdir())
    if kept == []:  # exiftool absent AND PIL exif roundtrip unsupported
        pytest.skip("no EXIF ISO backend available in this environment")
    assert kept == ["low.jpg"]
