"""Native tileio ops vs numpy reference: bit-identical geometry."""

import numpy as np
import pytest

from nind_denoise_tpu.core import native, tiles

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libtileio.so not built")


@pytest.fixture
def plan_and_img():
    rng = np.random.default_rng(0)
    img = rng.random((200, 300, 3), dtype=np.float32)
    plan = tiles.TilePlan(200, 300, 104, 88, 6)
    return plan, img


def _np_padded(plan, img):
    return np.pad(img, ((plan.pad_top, plan.pad_bottom),
                        (plan.pad_left, plan.pad_right), (0, 0)),
                  mode="symmetric")


def test_symmetric_pad_matches_numpy(plan_and_img):
    plan, img = plan_and_img
    got = native.symmetric_pad(img, plan.pad_top, plan.pad_bottom,
                               plan.pad_left, plan.pad_right)
    np.testing.assert_array_equal(got, _np_padded(plan, img))


def test_gather_matches_numpy(plan_and_img):
    plan, img = plan_and_img
    idx = list(range(plan.ntiles))
    ref = plan.gather(_np_padded(plan, img), idx)
    got = plan.gather_from_source(img, idx)
    np.testing.assert_array_equal(got, ref)


def test_scatter_add_matches_numpy(plan_and_img):
    plan, img = plan_and_img
    rng = np.random.default_rng(1)
    idx = list(range(plan.ntiles))
    fake_out = rng.random((plan.ntiles, plan.cs, plan.cs, 3), dtype=np.float32)

    cv_native = plan.new_canvas()
    plan.scatter_add(cv_native, fake_out, idx)  # takes the native path

    cv_ref = plan.new_canvas()
    p, u = plan.pad, plan.ucs
    for j, i in enumerate(idx):
        s = plan.spec(i)
        slab = fake_out[j, p:p + u, p:p + u] * plan.weight_mask(i)[..., None]
        cv_ref[s.abs_y0:s.abs_y0 + u, s.abs_x0:s.abs_x0 + u] += slab

    np.testing.assert_allclose(cv_native, cv_ref, atol=1e-6)


def test_identity_stitch_through_native(plan_and_img):
    plan, img = plan_and_img
    canvas = plan.new_canvas()
    for batch in plan.batches(5):
        out = plan.gather_from_source(img, batch)
        plan.scatter_add(canvas, out, batch)
    np.testing.assert_allclose(plan.finalize(canvas), img, atol=1e-6)
