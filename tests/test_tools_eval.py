"""Tools + eval harness tests: crop grid geometry, crop_ds layout,
denoise_dir end-to-end on synthetic scenes, grapher, score file metrics."""

import os

import numpy as np
import pytest

from nind_denoise_tpu.tools import crop_ds
from nind_denoise_tpu.train.dataset import get_baseline_fpath, sort_isos


def test_crop_grid_covers_image():
    grid = crop_ds.crop_grid(500, 300, 256, 192)
    assert (0, 0) in grid
    xs = {x for x, _ in grid}
    ys = {y for _, y in grid}
    assert max(xs) + 256 == 500  # clamped edge tile
    assert max(ys) + 256 == 300


def test_crop_ds_end_to_end(tmp_path):
    import cv2

    orig = tmp_path / "DS"
    for iso in ("ISO200", "ISO3200"):
        d = orig / "scene1"
        d.mkdir(parents=True, exist_ok=True)
        img = (np.random.default_rng(0).random((300, 400, 3)) * 65535).astype(np.uint16)
        cv2.imwrite(str(d / f"DS_scene1_{iso}.png"), img)
    res = tmp_path / "cropped"
    crop_ds.main(["--cs", "128", "--stride", "96", "--orig_data", str(orig),
                  "--resdir", str(res), "--workers", "1"])
    out_root = res / "DS_128_96"
    assert (out_root / "scene1" / "ISO200").is_dir()
    crops = list((out_root / "scene1" / "ISO200").iterdir())
    assert crops and all("_96" in c.stem for c in crops)
    img = cv2.imread(str(crops[0]), -1)
    assert img.shape == (128, 128, 3)

    # layout round-trips into DenoisingDataset
    from nind_denoise_tpu.train.dataset import DenoisingDataset

    ds = DenoisingDataset([str(out_root)], cs=128, seed=0)
    x, y = ds[0]
    assert x.shape == (3, 128, 128)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Whole-image test scenes: <root>/<scene>/<name>_ISO<val>.png"""
    import cv2

    root = tmp_path_factory.mktemp("scenes")
    rng = np.random.default_rng(0)
    for scene in ("sceneX",):
        d = root / scene
        d.mkdir()
        base = rng.random((176, 200, 3)).astype(np.float32)  # >= MS-SSIM min 162
        for iso, sigma in (("ISO100", 0.0), ("ISO3200", 0.08)):
            img = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
            cv2.imwrite(str(d / f"NIND_{scene}_{iso}.png"),
                        (img * 65535).astype(np.uint16))
    return str(root)


def test_get_baseline(scene_dir):
    b = get_baseline_fpath(os.path.join(scene_dir, "sceneX"))
    assert b.endswith("ISO100.png")


@pytest.mark.parametrize("devices", ["1", "8"])
def test_denoise_dir_end_to_end(scene_dir, tmp_path, devices):
    """devices=8: the eval harness auto-engages row-band tile sharding on
    the virtual mesh (same engagement as the product CLIs)."""
    import jax

    from nind_denoise_tpu.eval import denoise_dir
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    ckpt_dir = tmp_path / "run"
    ckpt_dir.mkdir()
    params = params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=2),
                            str(ckpt_dir / "generator_5.npz"))
    overall = denoise_dir.main([
        "--model_path", str(ckpt_dir / "generator_5.npz"),
        "--network", "UtNet", "--cs", "104", "--ucs", "88",
        "--noisy_dir", scene_dir,
        "--result_dir", str(tmp_path / "results"),
        "--batch_size", "2", "--devices", devices,
    ])
    assert set(overall) == {"mse", "ssim", "msssim"}
    assert all(np.isfinite(v) for v in overall.values())
    # results recorded next to the checkpoint
    assert (ckpt_dir / "trainres.json").is_file()
    assert (ckpt_dir / "testres.json").is_file()

    # --no_scoring actually skips scoring (round-3 fix: it previously still
    # paid — and could crash on — the baseline comparison per image)
    overall2 = denoise_dir.main([
        "--model_path", str(ckpt_dir / "generator_5.npz"),
        "--network", "UtNet", "--cs", "104", "--ucs", "88",
        "--noisy_dir", scene_dir,
        "--result_dir", str(tmp_path / "results2"),
        "--batch_size", "2", "--no_scoring", "--devices", devices,
    ])
    assert overall2 == {}
    assert os.listdir(tmp_path / "results2")  # outputs still written


def test_grapher(tmp_path):
    from nind_denoise_tpu.eval import grapher

    d = tmp_path / "exp1"
    d.mkdir()
    (d / "res.txt").write_text(
        "filename,ssim,mse\n"
        "NIND_a_ISO200.png,0.1,0.001\nNIND_a_ISO3200.png,0.3,0.004\n"
        "NIND_a_ISOH1.png,0.5,0.01\n")
    out = grapher.plot([str(d)], metric="ssim",
                       out_fpath=str(tmp_path / "g.png"))
    assert os.path.isfile(out)


def test_score_get_losses(tmp_path):
    import cv2

    from nind_denoise_tpu.eval import score

    rng = np.random.default_rng(0)
    a = (rng.random((170, 170, 3)) * 65535).astype(np.uint16)
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(pa, a)
    cv2.imwrite(pb, a)
    res = score.get_losses(pa, pb)
    assert res["mse"] == 0 and abs(res["msssim"]) < 1e-6


def test_pinned_nind_manifest():
    """The bundled 2021-05-21 manifest is the reference's exact dataset
    definition (dl_ds_1.py:12-146): 6 camera sets, 114 scenes, 749 files,
    incl. both fixture-crop source images and all 7 test-reserve scenes."""
    import yaml

    from nind_denoise_tpu.tools import dl_ds

    assert os.path.isfile(dl_ds.DEFAULT_MANIFEST)
    with open(dl_ds.DEFAULT_MANIFEST) as fp:
        man = yaml.safe_load(fp)
    assert man["last_update"] == "2021-05-21"
    assert len(man["sets"]) == 6
    nscenes = sum(len(s["scenes"]) for s in man["sets"].values())
    titles = dl_ds.manifest_titles(man)
    assert nscenes == 114 and len(titles) == 749
    assert "NIND_bananapi_ISO50.png" in titles
    assert "NIND_MuseeL-yombe_ISO200.jpg" in titles
    scenes = {sc for s in man["sets"].values() for sc in s["scenes"]}
    reserve = {"ursulines-red", "stefantiek", "ursulines-building",
               "MuseeL-Bobo", "CourtineDeVillersDebris", "MuseeL-Bobo-C500D",
               "Pen-pile"}
    assert reserve <= scenes
    # per-scene dirs + filename layout round-trips through scene_of
    assert dl_ds.scene_of("NIND_MuseeL-Bobo-C500D_ISOH1.jpg") == "MuseeL-Bobo-C500D"


def test_convert_checkpoint(tmp_path):
    """torch .pt -> .npz conversion CLI: the converted file loads without
    torch-import machinery and matches the direct-torch-load params
    bit-for-bit."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    from test_models_parity import build_torch_utnet

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.tools import convert_checkpoint

    torch.manual_seed(0)
    model = build_torch_utnet(funit=2)
    pt = str(tmp_path / "generator_7.pt")
    torch.save(model.state_dict(), pt)
    npz = convert_checkpoint.main([pt, "--network", "UtNet"])
    assert npz.endswith(".npz") and os.path.isfile(npz)
    direct, _ = params_io.load_generator(pt, "UtNet")
    converted, state = params_io.load_generator(npz, "UtNet")
    assert state is None
    la = jax.tree_util.tree_leaves(direct)
    lb = jax.tree_util.tree_leaves(converted)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_denoise_dir_skip_existing_no_decode(scene_dir, tmp_path, monkeypatch):
    """--skip_existing must not decode (or denoise) already-done images:
    a second run over a complete result dir performs zero image decodes
    beyond scoring (review r3 — skipped images' decode futures leaked)."""
    import jax

    from nind_denoise_tpu.core import imgio
    from nind_denoise_tpu.eval import denoise_dir
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    ckpt_dir = tmp_path / "run"
    ckpt_dir.mkdir()
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=2),
                   str(ckpt_dir / "generator_5.npz"))
    argv = ["--model_path", str(ckpt_dir / "generator_5.npz"),
            "--network", "UtNet", "--cs", "104", "--ucs", "88",
            "--noisy_dir", scene_dir,
            "--result_dir", str(tmp_path / "results"),
            "--batch_size", "2", "--no_scoring", "--devices", "1",
            "--skip_existing"]
    denoise_dir.main(argv)  # populates every output

    calls = []
    orig = imgio.load_img_raw
    monkeypatch.setattr(imgio, "load_img_raw",
                        lambda p: (calls.append(p), orig(p))[1])
    overall = denoise_dir.main(argv)  # everything skipped
    assert calls == [], calls
    assert all(np.isfinite(v) for v in overall.values())


def test_denoise_dir_requires_input(tmp_path):
    """No --noisy_dir and no --test_reserve must exit with a clear message,
    not a TypeError (review r3)."""
    import jax
    import pytest as _pytest

    from nind_denoise_tpu.eval import denoise_dir
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    ck = str(tmp_path / "generator_5.npz")
    params_io.save(UtNet.init(jax.random.PRNGKey(0), funit=2), ck)
    with _pytest.raises(SystemExit, match="noisy_dir"):
        denoise_dir.main(["--model_path", ck, "--network", "UtNet",
                          "--cs", "104", "--ucs", "88", "--test_reserve"])
    # sibling hole (review r3): --test_reserve without --orig_data used to
    # crash later with TypeError(join(None, ...)) instead of a clear exit
    with _pytest.raises(SystemExit, match="orig_data"):
        denoise_dir.main(["--model_path", ck, "--network", "UtNet",
                          "--cs", "104", "--ucs", "88",
                          "--test_reserve", "setA"])
