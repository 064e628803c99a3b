"""Hulb128Net generator family: transposed-conv primitive parity vs torch
(dilated and stride-3 variants — new lowering paths) and whole-net
shape/finiteness at the canonical 128 crop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nind_denoise_tpu.models import hul_gen, torch_import
from nind_denoise_tpu.ops import conv as C

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

pytestmark = pytest.mark.slow  # torch-twin zoo parity: minutes on 1 core



def _tc_w(m):
    w = m.weight.detach().numpy()[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def test_tconv_dilated_matches_torch():
    torch.manual_seed(0)
    m = nn.ConvTranspose2d(5, 7, 3, dilation=2)
    x = np.random.default_rng(0).random((1, 5, 20, 22), dtype=np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    got = C.tconv2d_k3s1_dil(jnp.asarray(x.transpose(0, 2, 3, 1)),
                             jnp.asarray(_tc_w(m)),
                             jnp.asarray(m.bias.detach().numpy()), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_tconv_stride3_matches_torch():
    torch.manual_seed(1)
    m = nn.ConvTranspose2d(4, 6, 3, stride=3)
    x = np.random.default_rng(1).random((1, 4, 10, 12), dtype=np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    got = C.tconv2d_k3s3(jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(_tc_w(m)),
                         jnp.asarray(m.bias.detach().numpy()))
    assert got.shape[1] == ref.shape[2]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_dilated_conv_matches_torch():
    torch.manual_seed(2)
    m = nn.Conv2d(4, 6, 3, dilation=5, bias=False)
    x = np.random.default_rng(2).random((1, 4, 30, 30), dtype=np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    got = C.conv2d_dilated(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(torch_import.conv_w(m.weight)),
                           None, 5)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


@pytest.mark.parametrize("net,act", [(hul_gen.Hulb128Net, "PReLU"),
                                     (hul_gen.Hulbs128Net, "PReLU")])
def test_hulb128_shape_preserving(net, act):
    params = net.init(jax.random.PRNGKey(0), funit=2, activation=act)
    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 3),
                                                    dtype=np.float32))
    y = net.apply(params, x, activation=act)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
