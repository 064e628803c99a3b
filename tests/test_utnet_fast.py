"""apply_fast (ops/fastconv.py rewrites) must match apply exactly.

``apply`` itself is golden-tested against the torch reference UtNet
(tests/test_models_parity.py), so equivalence here transfers reference
parity to the fast path. The rewrites recompose kernels (fp32 einsums),
so tolerance is ~1e-5 relative rather than bitwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.ops import fastconv as F


def _rel_err(a, b):
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


@pytest.mark.parametrize("activation", ["PReLU", "ELU", "Hardswish"])
def test_apply_fast_matches_apply(activation):
    params = UtNet.init(jax.random.PRNGKey(3), funit=8, activation=activation)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 136, 136, 3)).astype(np.float32) * 0.3 + 0.4)
    ref = np.asarray(UtNet.apply(params, x, activation))
    out = np.asarray(UtNet.apply_fast(params, x, activation))
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 1e-5


def test_apply_fast_precomputed_derived():
    params = UtNet.init(jax.random.PRNGKey(1), funit=8)
    derived = UtNet.precompute_fast(params)
    x = jnp.asarray(np.random.default_rng(1).random((1, 168, 168, 3),
                                                    dtype=np.float32))
    ref = np.asarray(UtNet.apply(params, x))
    out = np.asarray(UtNet.apply_fast(params, x, derived=derived))
    assert _rel_err(out, ref) < 1e-5


def test_apply_fast_jits_and_nonsquare():
    """Rectangular even sizes must also be exact (engine uses square tiles,
    but whole-image mode may not)."""
    params = UtNet.init(jax.random.PRNGKey(2), funit=8)
    x = jnp.asarray(np.random.default_rng(2).random((1, 136, 168, 3),
                                                    dtype=np.float32))
    ref = np.asarray(UtNet.apply(params, x))
    fast = jax.jit(lambda p, t: UtNet.apply_fast(p, t))
    out = np.asarray(fast(params, x))
    assert _rel_err(out, ref) < 1e-5


def test_apply_fast_gradients():
    """value_and_grad through apply_fast matches apply: the training loop
    (train/loop.py) routes UtNet through the fast path, so the rewrites
    must be exact under differentiation too (the kernel compositions are
    linear, so grads recompose the same way)."""
    params = UtNet.init(jax.random.PRNGKey(5), funit=8)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, 104, 104, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 104, 104, 3), dtype=np.float32))

    def loss(fwd):
        return lambda p: jnp.mean((fwd(p, x) - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss(UtNet.apply))(params)
    v_fast, g_fast = jax.value_and_grad(loss(UtNet.apply_fast))(params)
    assert abs(float(v_fast) - float(v_ref)) < 1e-6 * max(1.0, abs(float(v_ref)))
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fast)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        assert _rel_err(np.asarray(a), np.asarray(b)) < 2e-5


def test_folded_conv_exactness():
    """fold_kernel/folded_conv3 vs plain conv, VALID and FULL, with the
    real-column window bookkeeping."""
    from nind_denoise_tpu.ops import conv as C

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))

    ref = np.asarray(C.conv2d(x, w, b, "VALID"))           # (2, 10, 14, 4)
    yf = F.folded_conv3(F.fold_w(x), F.fold_kernel(w), b, (0, 0))
    y = np.asarray(F.unfold_w(yf))[:, :, 1:15, :]          # real cols [1, 15)
    assert _rel_err(y, ref) < 1e-6

    ref_full = np.asarray(C.conv2d(x, w, b, "FULL"))       # (2, 14, 18, 4)
    # FULL extends 1 col each side; embed input at cols [2, 18) of a
    # 20-col buffer so the output window [1, 19) stays inside
    xpad = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
    yf = F.folded_conv3(F.fold_w(xpad), F.fold_kernel(w), b, (2, 2))
    y = np.asarray(F.unfold_w(yf))[:, :, 1:19, :]
    assert _rel_err(y, ref_full) < 1e-6


def test_composed_up_conv_exactness():
    """up_conv3_composed(+bias map) == conv3x3_FULL(concat(upconv2x, skip))."""
    from nind_denoise_tpu.ops import conv as C

    rng = np.random.default_rng(4)
    cin, cmid, cskip, cout, h = 6, 5, 4, 7, 8
    t = jnp.asarray(rng.standard_normal((2, h, h, cin)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 2 * h, 2 * h, cskip)).astype(np.float32))
    w_up = jnp.asarray(rng.standard_normal((cin, 4 * cmid)).astype(np.float32))
    b_up = jnp.asarray(rng.standard_normal((cmid,)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((3, 3, cmid + cskip, cout)).astype(np.float32))

    cat = jnp.concatenate([C.upconv2x(t, w_up, b_up), skip], axis=-1)
    ref = np.asarray(C.conv2d(cat, w3, None, "FULL"))

    K = F.compose_up3(w_up, w3[:, :, :cmid])
    zA = F.up_conv3_composed(t, K)
    zB = C.conv2d(skip, w3[:, :, cmid:], None, "FULL")
    bmap = F.up_bias_map(2 * h, 2 * h, b_up, w3[:, :, :cmid], jnp.float32)
    out = np.asarray(zA + zB + bmap.astype(zA.dtype))
    assert _rel_err(out, ref) < 1e-5


def test_composed_up_conv_folded_exactness():
    """Folded-output composed up-conv: buffer col 2j+v = grid col 2j+v-2."""
    from nind_denoise_tpu.ops import conv as C

    rng = np.random.default_rng(5)
    cin, cout, h = 6, 4, 8
    t = jnp.asarray(rng.standard_normal((2, h, h, cin)).astype(np.float32))
    w_up = jnp.asarray(rng.standard_normal((cin, 4 * cout)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((3, 3, cout, cout)).astype(np.float32))

    up = C.upconv2x(t, w_up, None)
    ref = np.asarray(C.conv2d(up, w3, None, "FULL"))        # (2, 2h+2, 2h+2, cout)

    Kf = F.compose_up3_folded_w(w_up, w3)
    zf = F.up_conv3_composed_folded(t, Kf)                  # (2, 2h+2, h+2, 2cout)
    z = np.asarray(F.unfold_w(zf))[:, :, 1:2 * h + 3, :]    # real cols [1, 2h+3)
    assert _rel_err(z, ref) < 1e-5


def test_every_valid_size_takes_the_fast_path():
    """apply_fast falls back to apply for odd H/W — but every size that
    passes check_cs (UtNet.py:6-7 formula) is even, so the fast path always
    engages on engine-legal tiles; the fallback is purely defensive."""
    valid = []
    for cs in range(100, 600):
        try:
            UtNet.check_cs(cs)
            valid.append(cs)
        except ValueError:
            pass
    assert valid and all(cs % 2 == 0 for cs in valid)
    assert 504 in valid  # the production tile size
