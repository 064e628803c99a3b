"""utils tests: layered config precedence, JSONSaver best tracking +
reference schema compatibility, params_io round trips, failure handling."""

import json
import os

import numpy as np
import pytest

from nind_denoise_tpu.models import params_io
from nind_denoise_tpu.utils import conf, json_saver, utilities


def test_layered_config_precedence(tmp_path):
    d1 = tmp_path / "defaults.yaml"
    d1.write_text("a: 1\nb: 2\nc: 3\n")
    c1 = tmp_path / "c1.yaml"
    c1.write_text("b: 20\nc: 30\n")
    c2 = tmp_path / "c2.yaml"
    c2.write_text("c: 300\n")

    p = conf.LayeredArgumentParser(default_config_files=[str(d1)])
    p.add_argument("--a", type=int)
    p.add_argument("--b", type=int)
    p.add_argument("--c", type=int)
    args = p.parse_args(["--config", str(c1), "--config2", str(c2), "--c", "999"])
    # precedence: CLI > config2 > config > defaults
    assert (args.a, args.b, args.c) == (1, 20, 999)

    args = p.parse_args(["--config", str(c1), "--config2", str(c2)])
    assert args.c == 300


def test_layered_config_list_coercion(tmp_path):
    d1 = tmp_path / "d.yaml"
    d1.write_text("items: single\n")
    p = conf.LayeredArgumentParser(default_config_files=[str(d1)])
    p.add_argument("--items", nargs="*")
    assert p.parse_args([]).items == ["single"]


def test_json_saver_reference_schema(tmp_path):
    """Output must match the reference trainres.json schema: integer epoch
    keys + best_epoch/best_val dicts (models/2021-05-31T22_11 format)."""
    fpath = str(tmp_path / "trainres.json")
    js = json_saver.JSONSaver(fpath, step_type="epoch")
    js.add_res(1, {"validation_loss": 0.5})
    js.add_res(2, {"validation_loss": 0.3})
    js.add_res(3, {"validation_loss": 0.4})
    raw = json.load(open(fpath))
    assert set(raw) >= {"1", "2", "3", "best_epoch", "best_val"}
    assert raw["best_epoch"]["validation_loss"] == 2
    assert raw["best_val"]["validation_loss"] == 0.3

    # reload: integer keys come back as ints, best tracking continues
    js2 = json_saver.JSONSaver(fpath, step_type="epoch")
    assert 2 in js2.results
    js2.add_res(4, {"validation_loss": 0.1})
    assert js2.get_best_steps() == {4}


def test_json_saver_maximize(tmp_path):
    js = json_saver.JSONSaver(str(tmp_path / "r.json"), step_type="epoch")
    js.add_res(1, {"psnr": 30.0}, minimize=False)
    js.add_res(2, {"psnr": 28.0}, minimize=False)
    assert js.get_best("psnr") == (1, 30.0)


def test_params_io_roundtrip_nested(tmp_path):
    tree = {
        "a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "list": [np.ones(2), np.zeros(3)],
        "flag": True,
        "name": "PReLU",
        "nested": {"empty": None, "n": 7},
    }
    fpath = str(tmp_path / "t.npz")
    params_io.save(tree, fpath)
    back = params_io.load(fpath)
    np.testing.assert_array_equal(back["a"]["w"], tree["a"]["w"])
    assert isinstance(back["list"], list) and len(back["list"]) == 2
    assert back["flag"] is True
    assert back["name"] == "PReLU"
    assert back["nested"]["empty"] is None
    assert back["nested"]["n"] == 7


def test_complete_path_resolution(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    for e in (3, 10, 7):
        (d / f"generator_{e}.npz").write_bytes(b"x")
    # no trainres.json -> highest epoch
    assert params_io.complete_path(str(d)).endswith("generator_10.npz")
    # best epoch from trainres.json wins
    (d / "trainres.json").write_text(json.dumps(
        {"best_epoch": {"validation_loss": 7}}))
    assert params_io.complete_path(str(d)).endswith("generator_7.npz")
    # models_dpath indirection
    assert params_io.complete_path("run", models_dpath=str(tmp_path)) \
        .endswith("generator_7.npz")
    with pytest.raises(FileNotFoundError):
        params_io.complete_path(str(tmp_path / "nope"))


def test_avg_listofdicts():
    out = utilities.avg_listofdicts([{"a": 1.0, "b": 2.0}, {"a": 3.0, "b": 4.0}])
    assert out == {"a": 2.0, "b": 3.0}
    assert utilities.avg_listofdicts([]) == {}


def test_pipeline_failure_modes(tmp_path):
    """Fault injection: clean typed errors, no partial output."""
    from nind_denoise_tpu.pipeline import denoise_cli

    # missing input
    args = denoise_cli.build_parser().parse_args(
        [str(tmp_path / "missing.tif"), "--tiff-input", "--model_path", "x"])
    with pytest.raises(FileNotFoundError):
        denoise_cli.denoise_file(args, (tmp_path / "missing.tif"))

    # RAW input without darktable
    import cv2

    img = (np.zeros((32, 32, 3)) * 65535).astype(np.uint16)
    nef = tmp_path / "x.nef"
    nef.write_bytes(b"not a raw")
    args = denoise_cli.build_parser().parse_args(
        [str(nef), "--model_path", "x", "--dt", str(tmp_path / "no-darktable")])
    with pytest.raises(FileNotFoundError, match="darktable"):
        denoise_cli.denoise_file(args, nef)

    # corrupt checkpoint
    bad = tmp_path / "generator_1.npz"
    bad.write_bytes(b"garbage")
    with pytest.raises(Exception):
        params_io.load(str(bad))
