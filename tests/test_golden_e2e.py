"""End-to-end golden parity: the TPU-native engine (device gather + stitch +
model) must match a torch-CPU reference implementation that follows the
reference repo's own algorithm (per-tile mirror crops, forward, seam
feathering, host accumulate — denoise_image.py:240-267 semantics) to fp32
tolerance on a full image."""

import numpy as np
import pytest

import jax

from nind_denoise_tpu.core import tiles
from nind_denoise_tpu.engine.tile_engine import TileEngine
from nind_denoise_tpu.models import torch_import
from nind_denoise_tpu.models.utnet import UtNet
from tests.test_tiles import reference_tile

torch = pytest.importorskip("torch")

from tests.test_models_parity import build_torch_utnet  # noqa: E402


def torch_reference_denoise(tm, img_chw, cs, ucs, ol):
    """The reference's tiled inference, independently re-implemented with
    the per-tile oracle from test_tiles."""
    _, H, W = img_chw.shape
    plan = tiles.TilePlan(H, W, cs, ucs, ol)  # reused only for grid math
    newimg = np.zeros((3, H, W), dtype=np.float32)
    for i in range(plan.ntiles):
        ret, ud, us = reference_tile(img_chw, plan, i)
        with torch.no_grad():
            out = tm.forward(torch.from_numpy(ret[None])).numpy()[0]
        tens = out[:, ud[1]:ud[3], ud[0]:ud[2]].copy()
        absx0, absy0 = us
        # make_seamless_edges (denoise_image.py:204-213)
        if absx0 != 0:
            tens[:, :, 0:ol] /= 2
        if absy0 != 0:
            tens[:, 0:ol, :] /= 2
        if absx0 + ucs < W and ol:
            tens[:, :, -ol:] /= 2
        if absy0 + ucs < H and ol:
            tens[:, -ol:, :] /= 2
        newimg[:, absy0:absy0 + tens.shape[1], absx0:absx0 + tens.shape[2]] += tens
    return newimg


def test_engine_matches_torch_reference_pipeline():
    torch.manual_seed(11)
    tm = build_torch_utnet(funit=4).eval()
    params = torch_import.import_utnet(tm.state_dict())

    rng = np.random.default_rng(5)
    img = rng.random((3, 150, 170), dtype=np.float32)

    ref = torch_reference_denoise(tm, img, cs=104, ucs=88, ol=6)

    eng = TileEngine(lambda p, x: UtNet.apply(p, x), params,
                     cs=104, ucs=88, ol=6, batch_size=3,
                     compute_dtype="float32")
    got = eng.denoise_chw(img)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
    # PSNR-style agreement: quantization-irrelevant difference
    psnr = 10 * np.log10(1.0 / np.mean((got - ref) ** 2))
    assert psnr > 80, psnr


def test_engine_matches_torch_reference_across_shapes():
    """Shape sweep over the stitching-adversarial cases: exact stride
    multiples (seam lands on the border), off-by-one around them, a
    single-tile image at exactly ucs, cs-sized, tall-thin/wide-short
    grids, plus seeded random shapes. Any gather/scatter/feather indexing
    bug shows up at one of these boundaries."""
    torch.manual_seed(12)
    tm = build_torch_utnet(funit=4).eval()
    params = torch_import.import_utnet(tm.state_dict())
    cs, ucs, ol = 104, 88, 6
    stride = ucs - ol  # 82

    eng = TileEngine(lambda p, x: UtNet.apply(p, x), params,
                     cs=cs, ucs=ucs, ol=ol, batch_size=3,
                     compute_dtype="float32")
    rng = np.random.default_rng(6)
    shapes = [(ucs, ucs), (cs, cs),
              (ucs + stride, ucs + stride),          # seam exactly at border
              (ucs + stride - 1, ucs + stride + 1),  # off-by-one both ways
              (60, 260), (260, 60)]                  # 1xN / Nx1 tile grids
    shapes += [tuple(rng.integers(55, 280, 2)) for _ in range(3)]
    for h, w in shapes:
        img = rng.random((3, int(h), int(w)), dtype=np.float32)
        ref = torch_reference_denoise(tm, img, cs=cs, ucs=ucs, ol=ol)
        got = eng.denoise_chw(img)
        np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4,
                                   err_msg=f"shape {(h, w)}")
