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


def _build_hulb_twin(cls, funit):
    """Torch twin of Hulb128Net/Hulbs128Net built from the declarative plan
    (independent of models/torch_import.py), mirroring the reference module
    layout (Hul.py:12-250): Sequential blocks of conv/tconv -> activation,
    no BatchNorm, final 1x1 tconv head without trailing activation."""
    torch.manual_seed(0)
    mk = {
        "c": lambda i, o, b: nn.Conv2d(i, o, 3, bias=b),
        "d2": lambda i, o, b: nn.Conv2d(i, o, 3, dilation=2, bias=b),
        "d5": lambda i, o, b: nn.Conv2d(i, o, 3, dilation=5, bias=b),
        "s3": lambda i, o, b: nn.Conv2d(i, o, 3, stride=3, bias=b),
        "t": lambda i, o, b: nn.ConvTranspose2d(i, o, 3, bias=b),
        "td2": lambda i, o, b: nn.ConvTranspose2d(i, o, 3, dilation=2, bias=b),
        "ts3": lambda i, o, b: nn.ConvTranspose2d(i, o, 3, stride=3, bias=b),
        "t1": lambda i, o, b: nn.ConvTranspose2d(i, o, 1, bias=b),
    }
    m = nn.Module()
    for bname, specs in hul_gen._PLAN.items():
        seq = []
        for li, (cin_m, cout_m, ltype, bias) in enumerate(specs):
            cin = 3 if cin_m is None else cin_m * funit
            cout = max(1, cout_m * funit) if cout_m else 3
            seq.append(mk[ltype](cin, cout, bias))
            if not (bname == "dec126to128std" and li == len(specs) - 1):
                seq.append(nn.PReLU(init=0.01) if cls.act == "PReLU"
                           else nn.SELU())
        m.add_module(bname, nn.Sequential(*seq))
    m.activation = nn.PReLU(init=0.01)
    return m.eval()


def _hulb_twin_forward(m, x):
    """Reference dataflow (Hul.py Hulb128Net.forward, :215-250)."""
    cat = lambda *ts: torch.cat(ts, 1)
    l126 = m.enc128to126std(x)
    l122 = cat(m.enc126to122std(l126), m.enc126to122dil(l126))
    l118 = cat(m.enc122to118std(l122), m.enc122to118dil(l122),
               m.enc128to118dil(x))
    l114 = cat(m.enc118to114std(l118), m.enc118to114dil(l118))
    l38 = m.enc114to38str(l114)
    l34 = cat(m.enc38to34std(l38), m.enc38to34dil(l38))
    l30 = cat(m.enc34to30std(l34), m.enc34to30dil(l34))
    l10 = m.enc30to10str(l30)
    l6 = cat(m.enc10to6std(l10), m.enc10to6dil(l10))
    l2 = cat(m.enc6to2std(l6), m.enc6to2dil(l6))
    l6 = cat(l6, m.dec2to6std(l2), m.dec2to6dil(l2))
    l10 = cat(l10, m.dec6to10std(l6), m.dec6to10dil(l6))
    l30 = cat(l30, m.dec10to30str(l10))
    l34 = cat(l34, m.dec30to34std(l30), m.dec30to34dil(l30))
    l38 = cat(l38, m.dec34to38std(l34), m.dec34to38dil(l34))
    l114 = cat(l114, m.dec38to114str(l38))
    l118 = cat(l118, m.dec114to118std(l114), m.dec114to118dil(l114))
    l122 = cat(l122, m.dec118to122std(l118), m.dec118to122dil(l118))
    l126 = cat(l126, m.dec122to126std(l122), m.dec122to126dil(l122))
    return m.activation(m.dec126to128std(l126))


@pytest.mark.parametrize("net", ["Hulb128Net", "Hulbs128Net"])
def test_hulb128_torch_import_parity(net):
    """import_hul_gen maps a reference-layout state_dict so that the JAX
    forward matches the torch twin — the first full-net torch parity for
    the Hul generator family (previously shape/finiteness only)."""
    cls = getattr(hul_gen, net)
    twin = _build_hulb_twin(cls, funit=2)
    params = torch_import.import_hul_gen(twin.state_dict(), net)
    rng = np.random.default_rng(5)
    x = rng.random((1, 3, 128, 128), dtype=np.float32)
    with torch.no_grad():
        ref = _hulb_twin_forward(twin, torch.from_numpy(x)).numpy()
    got = cls.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    activation="PReLU")
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)
