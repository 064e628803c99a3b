"""Relic zoo torch parity (reference networks/relics.py).

The upstream file is non-runnable dead code (it only imports ``torch.nn``,
so every forward NameErrors on ``torch.cat``/``floor``). The twins here are
built from the port's own declarative spec tables plus the documented
forward graphs with those imports repaired, then verified numerically
against the JAX implementations with randomized BN stats and PReLU slopes
(so a mis-copied or mis-ordered BN/act would be caught).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nind_denoise_tpu.models import get_network, relics, torch_import as ti

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

pytestmark = pytest.mark.slow  # torch-twin zoo parity: minutes on 1 core



def _resolve(c, funit, cin_raw):
    return relics._resolve(c, funit, cin_raw)


def _make_conv(op, cin, cout, bias):
    if op in ("c3", "c2", "c5"):
        return nn.Conv2d(cin, cout, relics._K[op], bias=bias)
    if op == "c3d2":
        return nn.Conv2d(cin, cout, 3, dilation=2, bias=bias)
    if op == "c3d5":
        return nn.Conv2d(cin, cout, 3, dilation=5, bias=bias)
    if op == "c3s3":
        return nn.Conv2d(cin, cout, 3, stride=3, bias=bias)
    if op == "c2s2":
        return nn.Conv2d(cin, cout, 2, stride=2, bias=bias)
    if op in ("t3", "t5"):
        return nn.ConvTranspose2d(cin, cout, relics._K[op], bias=bias)
    if op == "t3d2":
        return nn.ConvTranspose2d(cin, cout, 3, dilation=2, bias=bias)
    if op == "t3s3":
        return nn.ConvTranspose2d(cin, cout, 3, stride=3, bias=bias)
    if op == "t2s2":
        return nn.ConvTranspose2d(cin, cout, 2, stride=2, bias=bias)
    raise ValueError(op)


def _t_block(specs, funit, cin_raw, act_name, prelu_init):
    """Build the torch Sequential a spec list describes."""
    mods = []
    mk_act = (lambda: nn.ReLU()) if act_name == "ReLU" \
        else (lambda: nn.PReLU(init=prelu_init))
    for (op, cin_c, cout_c, bias, post) in specs:
        cin = _resolve(cin_c, funit, cin_raw)
        cout = _resolve(cout_c, funit, cin_raw)
        if op != "pre":
            mods.append(_make_conv(op, cin, cout, bias))
        bn_c = cout if op != "pre" else cin
        if post == "a":
            mods.append(mk_act())
        elif post == "ab":
            mods.append(mk_act())
            mods.append(nn.BatchNorm2d(bn_c))
        elif post == "ba":
            mods.append(nn.BatchNorm2d(bn_c))
            mods.append(mk_act())
        elif post == "sig":
            mods.append(nn.Sigmoid())
        elif post == "relu":
            mods.append(nn.ReLU())
    return nn.Sequential(*mods)


def _randomize(seq, gen):
    """Non-trivial BN running stats + PReLU slopes so copy errors surface."""
    for m in seq.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.1, generator=gen)
            m.running_var.data.uniform_(0.5, 1.5, generator=gen)
            m.weight.data.uniform_(0.7, 1.3, generator=gen)
            m.bias.data.normal_(0, 0.1, generator=gen)
        elif isinstance(m, nn.PReLU):
            m.weight.data.uniform_(0.05, 0.4, generator=gen)


def _w(m, op):
    if op == "t2s2":
        return ti.upconv_w(m.weight)
    if op.startswith("t"):
        return ti.tconv3_w(m.weight)  # flip+transpose works for any k
    return ti.conv_w(m.weight)


def _copy_block(tseq, specs, jlays, jstate):
    """Copy a torch Sequential into the port's per-block param/state lists."""
    it = iter(tseq)
    for li, (op, _, _, bias, post) in enumerate(specs):
        lay = jlays[li]
        if op != "pre":
            m = next(it)
            lay["w"] = _w(m, op)
            if bias:
                lay["b"] = ti._np(m.bias)

        def take_act():
            m = next(it)
            if isinstance(m, nn.PReLU):
                lay["a"] = ti._np(m.weight).reshape(())

        def take_bn():
            m = next(it)
            lay["bn"] = {"scale": ti._np(m.weight), "bias": ti._np(m.bias)}
            jstate[li] = {"mean": ti._np(m.running_mean),
                          "var": ti._np(m.running_var)}

        if post == "a":
            take_act()
        elif post == "ab":
            take_act()
            take_bn()
        elif post == "ba":
            take_bn()
            take_act()
        elif post in ("sig", "relu"):
            next(it)


def _build_twin(cls, funit, cin_raw=3, seed=0):
    """(torch blocks dict in eval mode, jax params, jax state)."""
    torch.manual_seed(seed)
    gen = torch.Generator().manual_seed(seed + 1)
    blocks = {}
    for bname, specs in cls.plan.items():
        blk = _t_block(specs, funit, cin_raw, cls.act, cls.prelu_init)
        _randomize(blk, gen)
        blk.eval()
        blocks[bname] = blk
    params, state = cls.init(jax.random.PRNGKey(0), funit=funit,
                             input_channels=cin_raw)
    for bname, specs in cls.plan.items():
        _copy_block(blocks[bname], specs, params[bname], state[bname])
    return blocks, params, state


def _hu_torch(bl, x, generator=True):
    cat = lambda *t: torch.cat(t, 1)
    l158 = bl["enc160to158std"](x)
    l154 = cat(bl["enc158to154std"](l158), bl["enc158to154dil"](l158))
    l150 = cat(bl["enc154to150std"](l154), bl["enc154to150dil"](l154),
               bl["enc160to150dil"](x))
    l50 = bl["enc150to50str"](l150)
    l46 = cat(bl["enc50to46std"](l50), bl["enc50to46dil"](l50))
    l42 = cat(bl["enc46to42std"](l46), bl["enc46to42dil"](l46))
    l14 = bl["enc42to14str"](l42)
    l10 = cat(bl["enc14to10std"](l14), bl["enc14to10dil"](l14))
    l6 = cat(bl["enc10to6std"](l10), bl["enc10to6dil"](l10))
    l3 = bl["enc6to3str"](l6)
    if not generator:
        return bl["enc3to1std"](l3)
    l1 = bl["enc3to1std"](l3)
    l3 = cat(l3, bl["dec1to3std"](l1))
    l6 = cat(l6, bl["dec3to6str"](l3))
    l10 = cat(l10, bl["dec6to10std"](l6), bl["dec6to10dil"](l6))
    l14 = cat(l14, bl["dec10to14std"](l10), bl["dec10to14dil"](l10))
    l42 = cat(l42, bl["dec14to42str"](l14))
    l46 = cat(l46, bl["dec42to46std"](l42), bl["dec42to46dil"](l42))
    l50 = cat(l50, bl["dec46to50std"](l46), bl["dec46to50dil"](l46))
    l150 = cat(l150, bl["dec50to150str"](l50))
    l154 = cat(l154, bl["dec150to154std"](l150), bl["dec150to154dil"](l150))
    l158 = cat(l158, bl["dec154to158std"](l154), bl["dec154to158dil"](l154))
    return bl["dec158to160std"](l158)


def _check(cls, torch_fwd, size, funit=2, cin=3, atol=5e-4, seed=0):
    blocks, params, state = _build_twin(cls, funit, cin, seed)
    rng = np.random.default_rng(seed)
    x = rng.random((1, cin, size, size), dtype=np.float32)
    with torch.no_grad():
        ref = torch_fwd(blocks, torch.from_numpy(x)).numpy()
    got, _ = cls.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), state,
                       train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=2e-3)
    return got


def test_hunnet_matches_torch():
    out = _check(relics.HunNet, _hu_torch, 160)
    assert out.shape == (1, 3, 160, 160)  # size-preserving generator


def test_hunet_matches_torch():
    out = _check(relics.HuNet, _hu_torch, 160)
    assert out.shape == (1, 3, 160, 160)


def test_hul160net_matches_torch():
    out = _check(relics.Hul160Net, _hu_torch, 160)
    assert out.shape == (1, 3, 160, 160)


def test_hudisc_matches_torch():
    out = _check(relics.HuDisc,
                 lambda bl, x: _hu_torch(bl, x, generator=False), 160)
    assert out.shape == (1, 1, 1, 1)
    assert (out >= 0).all() and (out <= 1).all()


def _hul128_torch(bl, x):
    cat = lambda *t: torch.cat(t, 1)
    l126 = bl["enc128to126std"](x)
    l122 = cat(bl["enc126to122std"](l126), bl["enc126to122dil"](l126))
    l118 = cat(bl["enc122to118std"](l122), bl["enc122to118dil"](l122),
               bl["enc128to118dil"](x))
    l114 = cat(bl["enc118to114std"](l118), bl["enc118to114dil"](l118))
    l38 = bl["enc114to38str"](l114)
    l34 = cat(bl["enc38to34std"](l38), bl["enc38to34dil"](l38))
    l30 = cat(bl["enc34to30std"](l34), bl["enc34to30dil"](l34))
    l10 = bl["enc30to10str"](l30)
    l6 = cat(bl["enc10to6std"](l10), bl["enc10to6dil"](l10))
    l2 = cat(bl["enc6to2std"](l6), bl["enc6to2dil"](l6))
    l6 = cat(l6, bl["dec2to6std"](l2), bl["dec2to6dil"](l2))
    l10 = cat(l10, bl["dec6to10std"](l6), bl["dec6to10dil"](l6))
    l30 = cat(l30, bl["dec10to30str"](l10))
    l34 = cat(l34, bl["dec30to34std"](l30), bl["dec30to34dil"](l30))
    l38 = cat(l38, bl["dec34to38std"](l34), bl["dec34to38dil"](l34))
    l114 = cat(l114, bl["dec38to114str"](l38))
    l118 = cat(l118, bl["dec114to118std"](l114), bl["dec114to118dil"](l114))
    l122 = cat(l122, bl["dec118to122std"](l118), bl["dec118to122dil"](l118))
    l126 = cat(l126, bl["dec122to126std"](l122), bl["dec122to126dil"](l122))
    return bl["dec126to128std"](l126)


def test_hul128net_matches_torch():
    out = _check(relics.Hul128Net, _hul128_torch, 128)
    assert out.shape == (1, 3, 128, 128)


def _hul144_torch(bl, x, finalpool=False):
    cat = lambda *t: torch.cat(t, 1)
    li = bl["enc144to142std"](x)
    li = cat(bl["enc142to138std"](li), bl["enc142to138dil"](li))
    layer = cat(bl["enc138to134std"](li), bl["enc138to134dil"](li),
                bl["enc144to134dil"](x))
    layer = bl["enc134to132std"](layer)
    layer = bl["enc132to44str"](layer)
    layer = cat(bl["enc44to40std"](layer), bl["enc44to40dil"](layer))
    layer = cat(bl["enc40to36std"](layer), bl["enc40to36dil"](layer))
    layer = bl["enc36to12str"](layer)
    layer = cat(bl["enc12to8std"](layer), bl["enc12to8dil"](layer))
    layer = cat(bl["enc8to4std"](layer), bl["enc8to4dil"](layer))
    if finalpool:
        layer = bl["enc4to2pool"](layer)
        return nn.AdaptiveMaxPool2d(1)(layer)
    layer = bl["enc4to2std"](layer)
    return bl["decide"](layer)


def test_hul144disc_matches_torch():
    out = _check(relics.Hul144Disc, _hul144_torch, 144)
    assert out.shape == (1, 1, 1, 1)


def test_hul144disc_finalpool_matches_torch():
    blocks, params, state = _build_twin(relics.Hul144Disc, 2, seed=7)
    rng = np.random.default_rng(7)
    x = rng.random((1, 3, 144, 144), dtype=np.float32)
    with torch.no_grad():
        ref = _hul144_torch(blocks, torch.from_numpy(x), finalpool=True).numpy()
    got, _ = relics.Hul144Disc.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), state, train=False,
        finalpool=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=5e-4, rtol=2e-3)


def _hunkydisc_torch(bl, x):
    pool = nn.MaxPool2d(2)
    for b in ("enc1", "enc2", "enc3", "enc4", "enc5"):
        x = pool(bl[b](x))
    return bl["encdec"](x)


def test_hunkydisc_matches_torch():
    out = _check(relics.HunkyDisc, _hunkydisc_torch, 256, atol=1e-3)
    assert out.shape == (1, 1, 1, 1)


def _hunkynet_torch(bl, x):
    pool = nn.MaxPool2d(2)
    residuals = []
    for b in ("enc1", "enc2", "enc3", "enc4", "enc5"):
        x = bl[b](x)
        residuals.append(x)
        x = pool(x)
    x = bl["encdec"](x)
    for up, dec in (("up1", "dec2"), ("up2", "dec3"), ("up3", "dec4"),
                    ("up4", "dec5"), ("up5", "dec6")):
        x = bl[up](x)
        x = x + residuals.pop()
        x = bl[dec](x)
    return x


def test_hunkynet_matches_torch():
    out = _check(relics.HunkyNet, _hunkynet_torch, 224, atol=1e-3)
    assert out.shape == (1, 3, 224, 224)


def test_redishcnn_matches_torch():
    nch, depth = 8, 8
    torch.manual_seed(5)
    gen = torch.Generator().manual_seed(6)
    conv_first = nn.Conv2d(3, nch, 5)
    conv = nn.Conv2d(nch, nch, 5)
    deconv = nn.ConvTranspose2d(nch, nch, 5)
    deconv_last = nn.ConvTranspose2d(nch, 3, 5)
    bn = nn.BatchNorm2d(nch).eval()
    bn.running_mean.data.normal_(0, 0.1, generator=gen)
    bn.running_var.data.uniform_(0.5, 1.5, generator=gen)
    relu = nn.RReLU().eval()  # eval-mode RReLU = fixed (l+u)/2 slope

    def fwd(x, find_noise):
        it = (depth - 6) // 2
        layer = relu(conv_first(x))
        residuals = [layer.clone()]
        for _ in range(it):
            for _ in range(2):
                layer = conv(relu(bn(layer)))
            residuals.append(layer.clone())
        layer = relu(conv(layer))
        layer = relu(deconv(layer))
        layer = relu(layer + residuals.pop())
        for _ in range(it):
            for _ in range(2):
                layer = deconv(relu(bn(layer)))
            layer = relu(layer + residuals.pop())
        layer = relu(deconv_last(layer))
        return x - layer if find_noise else layer

    params, state = relics.RedishCNN.init(jax.random.PRNGKey(0),
                                          n_channels=nch)

    def cw(m):
        return {"w": ti.conv_w(m.weight), "b": ti._np(m.bias)}

    def tw(m):
        return {"w": ti.tconv3_w(m.weight), "b": ti._np(m.bias)}

    params["conv_first"] = cw(conv_first)
    params["conv"] = cw(conv)
    params["deconv"] = tw(deconv)
    params["deconv_last"] = tw(deconv_last)
    params["bn"] = {"scale": ti._np(bn.weight), "bias": ti._np(bn.bias)}
    state["bn"] = {"mean": ti._np(bn.running_mean),
                   "var": ti._np(bn.running_var)}

    rng = np.random.default_rng(8)
    x = rng.random((1, 3, 40, 40), dtype=np.float32)
    for find_noise in (False, True):
        with torch.no_grad():
            ref = fwd(torch.from_numpy(x), find_noise).numpy()
        got, _ = relics.RedishCNN.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)), state, train=False,
            depth=depth, find_noise=find_noise)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, atol=3e-5)


def test_relics_registry():
    for name in ("RedishCNN", "HunkyDisc", "HunkyNet", "HunNet", "HuNet",
                 "HuDisc", "Hul144Disc", "Hul128Net", "Hul160Net"):
        assert get_network(name) is not None
    assert get_network("HulNet") is relics.Hul160Net  # relics.py:1608 alias


def test_torchvision_experiments_are_gated():
    """MobileNetV3 is a real functional port (tests/test_third_party.py);
    deeplabv3 stays a gated stub matching upstream's own forward, which
    literally raises NotImplementedError (ThirdPartyNets.py:186-187)."""
    assert get_network("MobileNetV3") is not None  # real model; parity suite
    net = get_network("deeplabv3_resnet101")
    with pytest.raises(NotImplementedError):
        net.init(jax.random.PRNGKey(0))
