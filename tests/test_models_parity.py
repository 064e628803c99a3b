"""Golden numerical-parity tests: JAX models vs torch-CPU oracles.

The torch oracles are constructed programmatically here (not loaded from the
reference repo) with the same layer graph as the published architectures;
random torch weights are exported through models/torch_import.py and the two
frameworks must agree to float32 tolerance. This validates the #1 parity risk
called out in SURVEY.md §7: ConvTranspose2d kernel mapping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nind_denoise_tpu.models import utnet, unet, torch_import

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


def build_torch_utnet(funit=8, activation="PReLU"):
    """Programmatic torch twin of UtNet (networks/UtNet.py:13-109)."""
    acts = {"PReLU": nn.PReLU, "ELU": nn.ELU, "Hardswish": nn.Hardswish}
    act = acts[activation]
    f = funit
    m = nn.Module()

    def dbl(cin, cmid, cout, t=False):
        C = nn.ConvTranspose2d if t else nn.Conv2d
        return nn.Sequential(C(cin, cmid, 3), act(), C(cmid, cout, 3), act())

    m.convs1 = dbl(3, f, f)
    m.convs2 = dbl(f, 2 * f, 2 * f)
    m.convs3 = dbl(2 * f, 4 * f, 4 * f)
    m.convs4 = dbl(4 * f, 8 * f, 8 * f)
    m.bottom = nn.Sequential(nn.Conv2d(8 * f, 16 * f, 3), act(),
                             nn.ConvTranspose2d(16 * f, 16 * f, 3), act())
    m.up1 = nn.ConvTranspose2d(16 * f, 8 * f, 2, stride=2)
    m.tconvs1 = dbl(16 * f, 8 * f, 8 * f, t=True)
    m.up2 = nn.ConvTranspose2d(8 * f, 4 * f, 2, stride=2)
    m.tconvs2 = dbl(8 * f, 4 * f, 4 * f, t=True)
    m.up3 = nn.ConvTranspose2d(4 * f, 2 * f, 2, stride=2)
    m.tconvs3 = dbl(4 * f, 2 * f, 2 * f, t=True)
    m.up4 = nn.ConvTranspose2d(2 * f, f, 2, stride=2)
    m.tconvs4 = nn.Sequential(nn.ConvTranspose2d(2 * f, f, 3), act(),
                              nn.ConvTranspose2d(f, f, 3), act(),
                              nn.Conv2d(f, 3, 1))
    pad = nn.ReflectionPad2d(2)
    pool = nn.MaxPool2d(2)
    unpad = nn.ZeroPad2d(-2)

    def forward(x):
        x = pad(x)
        l1 = m.convs1(x)
        l2 = m.convs2(pool(l1))
        l3 = m.convs3(pool(l2))
        l4 = m.convs4(pool(l3))
        t = torch.cat([m.up1(m.bottom(pool(l4))), l4], dim=1)
        t = torch.cat([m.up2(m.tconvs1(t)), l3], dim=1)
        t = torch.cat([m.up3(m.tconvs2(t)), l2], dim=1)
        t = torch.cat([m.up4(m.tconvs3(t)), l1], dim=1)
        return unpad(m.tconvs4(t))

    m.forward = forward
    return m


@pytest.mark.parametrize("activation", ["PReLU", "ELU", "Hardswish"])
def test_utnet_matches_torch(activation):
    torch.manual_seed(7)
    tm = build_torch_utnet(funit=8, activation=activation).eval()
    params = torch_import.import_utnet(tm.state_dict())

    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 104, 104), dtype=np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()

    y = utnet.UtNet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          activation=activation)
    got = np.asarray(y).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_utnet_shape_preserving():
    """Reference testNets invariant (UtNet.py:116-119): output shape == input."""
    params = utnet.UtNet.init(jax.random.PRNGKey(0), funit=4)
    x = jnp.zeros((1, 104, 104, 3))
    y = utnet.UtNet.apply(params, x)
    assert y.shape == x.shape


def build_torch_unet(n_channels=3, n_classes=3):
    """Programmatic torch twin of the legacy UNet (nnModules.py:104-210)."""
    import torch.nn.functional as F

    def dc(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True))

    m = nn.Module()
    m.inc = nn.Module(); m.inc.conv = nn.Module(); m.inc.conv.conv = dc(n_channels, 64)
    chans = [64, 128, 256, 512, 512]
    for i in range(1, 5):
        blk = nn.Module()
        blk.mpconv = nn.Sequential(nn.MaxPool2d(2), nn.Module())
        blk.mpconv[1].conv = dc(chans[i - 1], chans[i])
        setattr(m, f"down{i}", blk)
    upch = [(1024, 256), (512, 128), (256, 64), (128, 64)]
    for i, (cin, cout) in enumerate(upch, 1):
        blk = nn.Module()
        blk.up = nn.ConvTranspose2d(cin // 2, cin // 2, 2, stride=2)
        blk.conv = nn.Module(); blk.conv.conv = dc(cin, cout)
        setattr(m, f"up{i}", blk)
    m.outc = nn.Module(); m.outc.conv = nn.Conv2d(64, n_classes, 1)

    def dcf(mod, x):
        return mod(x)

    def up_f(blk, x1, x2):
        x1 = blk.up(x1)
        dy, dx = x2.size(2) - x1.size(2), x2.size(3) - x1.size(3)
        x1 = F.pad(x1, (dx // 2, dx - dx // 2, dy // 2, dy - dy // 2))
        return blk.conv.conv(torch.cat([x2, x1], dim=1))

    def forward(x):
        x1 = m.inc.conv.conv(x)
        x2 = m.down1.mpconv[1].conv(F.max_pool2d(x1, 2))
        x3 = m.down2.mpconv[1].conv(F.max_pool2d(x2, 2))
        x4 = m.down3.mpconv[1].conv(F.max_pool2d(x3, 2))
        x5 = m.down4.mpconv[1].conv(F.max_pool2d(x4, 2))
        x = up_f(m.up1, x5, x4)
        x = up_f(m.up2, x, x3)
        x = up_f(m.up3, x, x2)
        x = up_f(m.up4, x, x1)
        return torch.sigmoid(m.outc.conv(x))

    m.forward = forward
    return m


def test_unet_matches_torch():
    torch.manual_seed(3)
    tm = build_torch_unet().eval()
    params, state = torch_import.import_unet(tm.state_dict())

    rng = np.random.default_rng(2)
    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()
    y, _ = unet.UNet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), state,
                           train=False)
    got = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
