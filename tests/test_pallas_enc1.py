"""Fused enc1 Mosaic kernel (ops/pallas_enc1.py) vs the XLA enc1 it
replaces — exact parity in f32 interpret mode (CPU), plus the geometry
gate and the apply_fast integration."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nind_denoise_tpu.models.utnet import UtNet  # noqa: E402
from nind_denoise_tpu.ops import conv as C  # noqa: E402
from nind_denoise_tpu.ops import fastconv as F  # noqa: E402
from nind_denoise_tpu.ops.pallas_enc1 import enc1_fits, enc1_pallas  # noqa: E402


def _xla_enc1(params, x, activation="PReLU"):
    n, H, W, _ = x.shape
    derived = UtNet.precompute_fast(params)
    act = lambda t, p: C.apply_activation(t, activation, p.get("a"))
    xf = F.fold_w(C.reflect_pad(x, 2))
    wb1 = xf.shape[2]
    p = params["convs1"]["c0"]
    t = F.folded_conv3(xf, derived["enc1_c0"], p["b"], (0, 0))
    t = act(t, p) * F.col_mask(wb1, t.shape[3], 1, W + 3, t.dtype)
    p = params["convs1"]["c1"]
    t = F.folded_conv3(t, derived["enc1_c1"], p["b"], (0, 0))
    l1f = act(t, p) * F.col_mask(wb1, t.shape[3], 2, W + 2, t.dtype)
    fu = l1f.shape[3] // 2
    pooled = jnp.maximum(l1f[..., :fu], l1f[..., fu:])
    pooled = pooled.reshape(n, H // 2, 2, wb1, fu).max(axis=2)
    return xf, derived, l1f, pooled[:, :, 1:1 + W // 2, :]


@pytest.mark.parametrize("hw", [(56, 56), (40, 72), (104, 104)])
def test_enc1_pallas_matches_xla_exactly(hw):
    H, W = hw
    params = UtNet.init(jax.random.PRNGKey(0), funit=8)
    x = jnp.asarray(np.random.default_rng(1).random((2, H, W, 3),
                                                    dtype=np.float32))
    xf, derived, l1f_ref, l2_ref = _xla_enc1(params, x)
    p0, p1 = params["convs1"]["c0"], params["convs1"]["c1"]
    l1f, l2 = enc1_pallas(xf, derived["enc1_c0"], p0["b"], p0["a"],
                          derived["enc1_c1"], p1["b"], p1["a"],
                          interpret=True)
    wb = l1f_ref.shape[2]
    # l1f carries 8-aligned zero pad columns (DMA tiling); real data first
    np.testing.assert_allclose(np.asarray(l1f[:, :, :wb, :]),
                               np.asarray(l1f_ref), atol=2e-6, rtol=2e-5)
    assert not np.asarray(l1f[:, :, wb:, :]).any()
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l2_ref),
                               atol=2e-6, rtol=2e-5)


def test_enc1_fits_gate():
    assert enc1_fits(504, 504)
    assert enc1_fits(104, 104, c2=16)
    assert not enc1_fits(105, 104)       # odd H
    assert not enc1_fits(104, 105)       # odd W


def test_apply_fast_pallas_enc1_full_forward():
    """enc1_impl='pallas' through the whole forward equals the default on
    CPU interpret (same math, f32)."""
    params = UtNet.init(jax.random.PRNGKey(2), funit=8)
    x = jnp.asarray(np.random.default_rng(3).random((1, 104, 104, 3),
                                                    dtype=np.float32))
    a = np.asarray(UtNet.apply_fast(params, x, enc1_impl="xla"))
    b = np.asarray(UtNet.apply_fast(params, x, enc1_impl="pallas"))
    np.testing.assert_allclose(b, a, atol=5e-6, rtol=2e-5)


def test_apply_fast_auto_stays_xla_off_tpu():
    """'auto' must resolve to the differentiable XLA path when not tracing
    for a TPU — gradients through apply_fast must keep working."""
    params = UtNet.init(jax.random.PRNGKey(2), funit=8)
    x = jnp.asarray(np.random.default_rng(3).random((1, 104, 104, 3),
                                                    dtype=np.float32))

    def loss(p):
        return jnp.sum(UtNet.apply_fast(p, x, enc1_impl="auto") ** 2)

    g = jax.grad(loss)(params)
    leaf = g["convs1"]["c0"]["w"]
    assert np.isfinite(np.asarray(leaf)).all()
