"""MobileNetV3 (LR-ASPP) parity vs a hand-built torch twin whose module tree
matches torchvision's lraspp_mobilenet_v3_large exactly (so the importer is
exercised on the real state_dict key layout, ThirdPartyNets.py:171-179)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nind_denoise_tpu.models import third_party, torch_import

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

pytestmark = pytest.mark.slow  # full MobileNetV3-Large graph


def _cna(cin, cout, k=1, s=1, d=1, groups=1, act=None, eps=1e-3):
    p = (k - 1) // 2 * d
    layers = [nn.Conv2d(cin, cout, k, s, p, dilation=d, groups=groups,
                        bias=False),
              nn.BatchNorm2d(cout, eps=eps, momentum=0.01)]
    if act is not None:
        layers.append(act())
    return nn.Sequential(*layers)


class SE(nn.Module):
    """torchvision.ops.SqueezeExcitation module tree."""

    def __init__(self, c, sq):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(c, sq, 1)
        self.fc2 = nn.Conv2d(sq, c, 1)
        self.activation = nn.ReLU()
        self.scale_activation = nn.Hardsigmoid()

    def forward(self, x):
        s = self.activation(self.fc1(self.avgpool(x)))
        return x * self.scale_activation(self.fc2(s))


class InvRes(nn.Module):
    def __init__(self, cin, k, exp, cout, se, act, s, d):
        super().__init__()
        stride = 1 if d > 1 else s
        self.use_res = stride == 1 and cin == cout
        A = nn.ReLU if act == "RE" else nn.Hardswish
        layers = []
        if exp != cin:
            layers.append(_cna(cin, exp, 1, act=A))
        layers.append(_cna(exp, exp, k, stride, d, groups=exp, act=A))
        if se:
            layers.append(SE(exp, third_party.make_divisible(exp // 4, 8)))
        layers.append(_cna(exp, cout, 1))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


def build_torch_lraspp(n_classes=3):
    m = nn.Module()
    backbone = nn.ModuleDict()
    backbone["0"] = _cna(3, 16, 3, 2, act=nn.Hardswish)
    cin = 16
    for i, (k, exp, cout, se, act, s, d) in enumerate(third_party._LARGE_DILATED):
        backbone[str(i + 1)] = InvRes(cin, k, exp, cout, se, act, s, d)
        cin = cout
    backbone["16"] = _cna(cin, 6 * cin, 1, act=nn.Hardswish)
    m.backbone = backbone
    cl = nn.Module()
    cl.cbr = nn.Sequential(nn.Conv2d(960, 128, 1, bias=False),
                           nn.BatchNorm2d(128), nn.ReLU())
    cl.scale = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                             nn.Conv2d(960, 128, 1, bias=False), nn.Sigmoid())
    cl.low_classifier = nn.Conv2d(40, n_classes, 1)
    cl.high_classifier = nn.Conv2d(128, n_classes, 1)
    m.classifier = cl
    F = torch.nn.functional

    def forward(x):
        inshape = x.shape[-2:]
        t = x
        low = None
        for i in range(17):
            t = m.backbone[str(i)](t)
            if i == 4:
                low = t
        h = cl.cbr(t) * cl.scale(t)
        h = F.interpolate(h, size=low.shape[-2:], mode="bilinear",
                          align_corners=False)
        out = cl.low_classifier(low) + cl.high_classifier(h)
        return F.interpolate(out, size=inshape, mode="bilinear",
                             align_corners=False)

    m.forward = forward
    return m


def _randomized_state_dict(tm, seed=1):
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in tm.state_dict().items():
        if k.endswith("running_var"):
            out[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.5
        elif k.endswith("num_batches_tracked"):
            out[k] = v
        else:
            out[k] = torch.randn(v.shape, generator=g) * 0.05
    return out


def test_mobilenetv3_matches_torch():
    torch.manual_seed(0)
    tm = build_torch_lraspp().eval()
    sd = _randomized_state_dict(tm)
    tm.load_state_dict(sd)
    params, state = torch_import.import_mobilenetv3(sd)

    x = np.random.default_rng(2).random((1, 3, 64, 96), dtype=np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()
    got, _ = third_party.MobileNetV3.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), state)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_mobilenetv3_net_prefix_and_surgery():
    """The reference wraps the model as self.net (ThirdPartyNets.py:173) —
    the importer strips that prefix; heads are the surgical 3-channel 1x1s."""
    tm = build_torch_lraspp().eval()
    sd = {"net." + k: v for k, v in _randomized_state_dict(tm).items()}
    params, _ = torch_import.import_mobilenetv3(sd)
    assert params["classifier"]["low_classifier"]["w"].shape == (1, 1, 40, 3)
    assert params["classifier"]["high_classifier"]["w"].shape == (1, 1, 128, 3)


def test_mobilenetv3_fresh_init_forward():
    import jax

    params, state = third_party.MobileNetV3.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    y, _ = third_party.MobileNetV3.apply(params, x, state)
    assert y.shape == (1, 64, 64, 3)
