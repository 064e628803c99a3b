"""Real published-checkpoint parity harness (VERDICT r1 item 4).

The production checkpoint ``generator_650.pt`` (UtNet funit=64 PReLU,
auto-downloaded by the reference from Backblaze B2 —
/root/reference/src/denoise.py:423-428, registry
src/config/operations.yaml:71-73) cannot be fetched in this zero-egress
image. These tests SKIP until the file is supplied, then exercise the full
import path on the real state_dict layout and assert numerical parity of
the JAX model vs a torch-CPU run on the two reference fixture crops.

To supply the checkpoint offline (see README "Real-checkpoint parity"):
    mkdir -p models/2021-06-14T20_27_nn_train
    cp <downloaded>/generator_650.pt models/2021-06-14T20_27_nn_train/
or point NIND_GOLDEN_CKPT at the .pt file.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = "/root/reference/src/nind_denoise/unittest_resources"


def _find_ckpt():
    cands = [os.environ.get("NIND_GOLDEN_CKPT", "")]
    for root in (REPO, "/root/reference/src/nind_denoise",
                 "/root/reference/src"):
        cands.append(os.path.join(
            root, "models", "2021-06-14T20_27_nn_train", "generator_650.pt"))
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None


CKPT = _find_ckpt()
pytestmark = pytest.mark.skipif(
    CKPT is None,
    reason="generator_650.pt not present (no egress here); see module "
           "docstring / README 'Real-checkpoint parity' to supply it")


def _fixture_paths():
    paths = []
    if os.path.isdir(FIXTURES):
        for fn in sorted(os.listdir(FIXTURES)):
            if fn.lower().endswith((".png", ".jpg")):
                paths.append(os.path.join(FIXTURES, fn))
    return paths


def test_import_real_state_dict_layout():
    """The importer consumes the published layout without key fallbacks."""
    from nind_denoise_tpu.models import params_io

    params, _ = params_io.load_generator(CKPT, "UtNet", funit=64)
    assert params["convs1"]["c0"]["w"].shape == (3, 3, 3, 64)
    assert params["up1"]["w"].shape == (1024, 4 * 512)
    assert params["tconvs4"]["c2"]["w"].shape == (1, 1, 64, 3)


def test_denoise_fixtures_matches_torch_cpu():
    """Denoise the two reference fixture crops with the imported weights;
    JAX output must match the torch-CPU reference forward well past the
    0.1 dB north star (>= 55 dB PSNR between outputs makes any quality
    metric differ by far less than 0.1 dB)."""
    torch = pytest.importorskip("torch")
    from test_models_parity import build_torch_utnet

    from nind_denoise_tpu.core import imgio
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    fixtures = _fixture_paths()
    assert fixtures, f"reference fixture crops not found under {FIXTURES}"

    params, _ = params_io.load_generator(CKPT, "UtNet", funit=64)
    tm = build_torch_utnet(funit=64, activation="PReLU").eval()
    sd = torch.load(CKPT, map_location="cpu", weights_only=True)
    tm.load_state_dict(sd)

    for path in fixtures:
        chw = imgio.load_img(path)  # (3, H, W) fp32 [0,1]
        x = chw[None]
        with torch.no_grad():
            ref = tm.forward(torch.from_numpy(x)).numpy()
        got = np.asarray(UtNet.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), activation="PReLU")
        ).transpose(0, 3, 1, 2)
        mse = float(((got - ref) ** 2).mean())
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 55.0, (path, psnr)
