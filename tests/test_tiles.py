"""Tile-geometry tests.

Oracle: an independent per-tile reimplementation of the reference's mirror
indexing (OneImageDS.__getitem__, denoise_image.py:108-174) checks that the
global symmetric-pad gather produces identical tiles; the identity-model
stitch invariant checks grid + feather weights + scatter reconstruct the
source exactly (overlap contributions of identical tiles sum to 1).
"""

import math

import numpy as np
import pytest

from nind_denoise_tpu.core import tiles


def reference_tile(img_chw, plan, i):
    """Per-tile mirror logic as in the reference (independent oracle)."""
    c, H, W = img_chw.shape
    cs, ucs, ol, pad = plan.cs, plan.ucs, plan.ol, plan.pad
    iperhl = plan.iperhl
    yi = int(math.ceil((i + 1) / (iperhl + 1) - 1))
    xi = i - yi * (iperhl + 1)
    x0 = ucs * xi - ol * xi - pad
    x1 = x0 + cs
    y0 = ucs * yi - ol * yi - pad
    y1 = y0 + cs
    ret = np.zeros((c, cs, cs), dtype=np.float32)
    x0pad = -min(0, x0)
    x1pad = max(0, x1 - W)
    y0pad = -min(0, y0)
    y1pad = max(0, y1 - H)
    crop = img_chw[:, y0 + y0pad:y1 - y1pad, x0 + x0pad:x1 - x1pad]
    ret[:, y0pad:cs - y1pad, x0pad:cs - x1pad] = crop
    if x0pad > 0:
        ret[:, y0pad:cs - y1pad, :x0pad] = np.flip(
            img_chw[:, y0 + y0pad:y1 - y1pad, x0 + x0pad:x0 + x0pad * 2], axis=2)
        if y0pad > 0:
            ret[:, :y0pad, :x0pad] = np.flip(img_chw[:, :y0pad, :x0pad], axis=(1, 2))
        if y1pad > 0:
            ret[:, -y1pad:, :x0pad] = np.flip(img_chw[:, -y1pad:, :x0pad], axis=(1, 2))
    if x1pad > 0:
        ret[:, y0pad:cs - y1pad, cs - x1pad:] = np.flip(
            img_chw[:, y0 + y0pad:y1 - y1pad, x1 - x1pad * 2:x1 - x1pad], axis=2)
        if y0pad > 0:
            ret[:, :y0pad, -x1pad:] = np.flip(img_chw[:, :y0pad, -x1pad:], axis=(1, 2))
        if y1pad > 0:
            ret[:, -y1pad:, -x1pad:] = np.flip(img_chw[:, -y1pad:, -x1pad:], axis=(1, 2))
    if y0pad > 0:
        ret[:, :y0pad, x0pad:cs - x1pad] = np.flip(
            img_chw[:, y0 + y0pad:y0 + y0pad * 2, x0 + x0pad:x1 - x1pad], axis=1)
    if y1pad > 0:
        ret[:, cs - y1pad:, x0pad:cs - x1pad] = np.flip(
            img_chw[:, y1 - y1pad * 2:y1 - y1pad, x0 + x0pad:x1 - x1pad], axis=1)
    usefuldim = (pad, pad, cs - max(pad, x1pad), cs - max(pad, y1pad))
    usefulstart = (x0 + pad, y0 + pad)
    return ret, usefuldim, usefulstart


@pytest.mark.parametrize("hw,cs,ucs,ol", [
    ((200, 300), 104, 88, 6),
    ((90, 90), 64, 48, 4),
    ((101, 67), 56, 40, 6),
    ((120, 120), 120, 104, 6),
])
def test_gather_matches_reference_oracle(hw, cs, ucs, ol):
    rng = np.random.default_rng(0)
    img = rng.random((3, *hw), dtype=np.float32)
    plan = tiles.TilePlan(hw[0], hw[1], cs, ucs, ol)
    padded = plan.pad_image(img.transpose(1, 2, 0))
    got = plan.gather(padded, range(plan.ntiles))
    assert plan.ntiles == (plan.iperhl + 1) * (plan.ipervl + 1)
    for i in range(plan.ntiles):
        ref, ud, us = reference_tile(img, plan, i)
        np.testing.assert_array_equal(got[i].transpose(2, 0, 1), ref,
                                      err_msg=f"tile {i}")
        s = plan.spec(i)
        assert (s.abs_x0, s.abs_y0) == us
        assert s.useful_w == ud[2] - ud[0]
        assert s.useful_h == ud[3] - ud[1]


@pytest.mark.parametrize("hw,cs,ucs,ol", [
    ((200, 300), 104, 88, 6),
    ((90, 90), 64, 48, 4),
    ((101, 67), 56, 40, 6),
    ((480, 640), 104, 88, 0),
])
def test_identity_stitch_reconstructs_input(hw, cs, ucs, ol):
    rng = np.random.default_rng(1)
    img = rng.random((*hw, 3), dtype=np.float32)
    plan = tiles.TilePlan(hw[0], hw[1], cs, ucs, ol)
    padded = plan.pad_image(img)
    canvas = plan.new_canvas()
    for batch in plan.batches(7):
        out = plan.gather(padded, batch)  # identity "denoiser"
        plan.scatter_add(canvas, out, batch)
    got = plan.finalize(canvas)
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_weight_masks_sum_to_one():
    plan = tiles.TilePlan(200, 300, 104, 88, 6)
    total = np.zeros((plan.grid_h, plan.grid_w), dtype=np.float64)
    for i in range(plan.ntiles):
        s = plan.spec(i)
        total[s.abs_y0:s.abs_y0 + plan.ucs, s.abs_x0:s.abs_x0 + plan.ucs] += plan.weight_mask(i)
    np.testing.assert_allclose(total[:plan.H, :plan.W], 1.0, atol=1e-6)


def test_whole_image_pad_matches_reference_semantics():
    rng = np.random.default_rng(2)
    img = rng.random((3, 20, 30), dtype=np.float32)
    pad = 4
    ret = tiles.whole_image_pad(img, pad)
    assert ret.shape == (3, 28, 38)
    np.testing.assert_array_equal(ret[:, pad:-pad, pad:-pad], img)
    # sides mirrored with edge duplication, corners zero (reference behavior)
    np.testing.assert_array_equal(ret[:, pad:-pad, :pad], np.flip(img[:, :, :pad], axis=2))
    np.testing.assert_array_equal(ret[:, :pad, :pad], 0)
