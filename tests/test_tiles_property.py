"""Property-based tile-geometry invariants (hypothesis).

The strongest global invariant of the overlap-tile decomposition: with an
IDENTITY model, gather -> weight -> scatter-add -> finalize must reproduce
the source image exactly, for EVERY (H, W, cs, ucs, ol) the plan accepts.
That single property pins simultaneously: the grid covers the image, the
mirror padding feeds each tile the right pixels, the useful-region crops
tile the canvas, and the feather masks of overlapping neighbours sum to
exactly 1 everywhere (0.5+0.5 on edges, 4 x 0.25 on corners) — the same
semantics as the reference's make_seamless_edges + accumulate
(/root/reference/src/nind_denoise/denoise_image.py:204-213,267), searched
over shapes instead of hand-picked cases (tests/test_tiles.py holds the
oracle-derived fixed cases).
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from nind_denoise_tpu.core.tiles import TilePlan


@st.composite
def plan_and_image(draw):
    cs = draw(st.integers(12, 72))
    ucs = draw(st.integers(4, cs))
    ucs -= (cs - ucs) % 2  # cs-ucs must be even
    assume(ucs >= 4)
    ol = draw(st.integers(0, min(ucs - 1, 8)))
    h = draw(st.integers(4, 120))
    w = draw(st.integers(4, 120))
    try:
        plan = TilePlan(h, w, cs, ucs, ol)
    except ValueError:
        assume(False)
    assume(plan.ntiles <= 64)  # bound runtime; coverage comes from variety
    img = draw(st.randoms(use_true_random=False))
    rng = np.random.default_rng(img.randint(0, 2**31))
    return plan, rng.random((h, w, 3), dtype=np.float32)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(plan_and_image())
def test_identity_model_reconstructs_image(case):
    plan, img = case
    padded = plan.pad_image(img)
    canvas = plan.new_canvas()
    for batch in plan.batches(5):
        tiles = plan.gather(padded, batch)       # (B, cs, cs, 3)
        assert tiles.shape[1:] == (plan.cs, plan.cs, 3)
        plan.scatter_add(canvas, tiles, batch)   # identity "model"
    out = plan.finalize(canvas)
    np.testing.assert_allclose(out, img, atol=1e-6)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(plan_and_image())
def test_weight_masks_partition_unity(case):
    """Summing every tile's weight mask onto the canvas gives exactly 1.0
    on all image pixels (the feathers form a partition of unity)."""
    plan, img = case
    acc = np.zeros((plan.grid_h, plan.grid_w), np.float32)
    for i in range(plan.ntiles):
        s = plan.spec(i)
        acc[s.abs_y0:s.abs_y0 + plan.ucs,
            s.abs_x0:s.abs_x0 + plan.ucs] += plan.weight_mask(i)
    np.testing.assert_array_equal(acc[:plan.H, :plan.W],
                                  np.ones((plan.H, plan.W), np.float32))


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 400), st.integers(1, 400))
def test_adapt_cs_ucs_result_always_valid(h, w):
    """Whatever adapt_cs_ucs returns must construct a valid TilePlan (incl.
    the 2*ol <= ucs feather constraint) and pass the arch size formula —
    for every image size it doesn't reject outright. UNet's huge receptive
    pad (cs-ucs = 120) is the adversarial case: before the feather
    constraint it could emit ucs=8 with ol=6 (silent 1.25-1.5x seam
    brightness, hypothesis-found)."""
    from nind_denoise_tpu.core.tiles import TilingError, adapt_cs_ucs
    from nind_denoise_tpu.models.unet import UNet
    from nind_denoise_tpu.models.utnet import UtNet

    for cs0, ucs0, check in ((504, 480, UtNet.check_cs),
                             (440, 320, getattr(UNet, "check_cs", None))):
        try:
            cs, ucs = adapt_cs_ucs(h, w, cs0, ucs0, ol=6, check=check)
        except TilingError:
            continue
        plan = TilePlan(h, w, cs, ucs, 6)  # must not raise
        assert 2 * 6 <= ucs
        if check is not None:
            check(cs)
        assert plan.ntiles >= 1


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 400), st.integers(1, 400))
def test_plan_rejects_or_covers(h, w):
    """For any image size, the UtNet-default plan either raises ValueError
    (too small: callers adapt or use the tiny path) or covers the image."""
    try:
        plan = TilePlan(h, w, 48, 40, 6)
    except ValueError:
        return
    assert plan.grid_h >= h and plan.grid_w >= w
    last = plan.spec(plan.ntiles - 1)
    assert last.abs_y0 + last.useful_h >= h
    assert last.abs_x0 + last.useful_w >= w
