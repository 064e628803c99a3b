"""Zoo breadth tests: DnCNN/RedCNN torch parity, pix2pix nets shape + torch
parity for the PatchGAN ladder and resnet generator, Hul discriminator shape."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nind_denoise_tpu.models import get_network, hul, legacy, p2p, torch_import

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

pytestmark = pytest.mark.slow  # torch-twin zoo parity: minutes on 1 core



def test_registry_resolves():
    for name in ("UtNet", "UNet", "DnCNN", "RedCNN", "ResnetGenerator",
                 "PatchGAN", "PixelDiscriminator", "MultiscaleDiscriminator",
                 "Hul112Disc", "Hulb112Disc", "Hull112Disc", "Hulf112Disc"):
        assert get_network(name) is not None
    with pytest.raises(KeyError):
        get_network("NopeNet")


def test_dncnn_matches_torch():
    depth, nch = 6, 8
    torch.manual_seed(0)
    layers = [nn.Conv2d(3, nch, 3, padding=1), nn.ReLU()]
    for _ in range(depth - 2):
        layers += [nn.Conv2d(nch, nch, 3, padding=1, bias=False),
                   nn.BatchNorm2d(nch, eps=1e-4, momentum=0.95), nn.ReLU()]
    layers.append(nn.Conv2d(nch, 3, 3, padding=1, bias=False))
    tm = nn.Sequential(*layers).eval()

    sd = tm.state_dict()
    params, state = legacy.DnCNN.init(jax.random.PRNGKey(0), depth=depth,
                                      n_channels=nch)
    params["first"] = torch_import._lay(sd, "0", "conv")
    for i in range(depth - 2):
        params["mid"][i]["c"] = {"w": torch_import.conv_w(sd[f"{2+3*i}.weight"])}
        bnp, bns = torch_import._bn(sd, f"{3+3*i}")
        params["mid"][i]["bn"] = bnp
        state[f"bn{i}"] = bns
    params["last"] = {"w": torch_import.conv_w(sd[f"{2+3*(depth-2)}.weight"])}

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 40, 40), dtype=np.float32)
    with torch.no_grad():
        ref = (torch.from_numpy(x) - tm(torch.from_numpy(x))).numpy()
    got, _ = legacy.DnCNN.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                state, train=False, find_noise=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-5)


def test_redcnn_matches_torch():
    nch, depth, ks = 8, 10, 5
    torch.manual_seed(1)
    conv_first = nn.Conv2d(3, nch, ks)
    conv = nn.Conv2d(nch, nch, ks)
    deconv = nn.ConvTranspose2d(nch, nch, ks)
    deconv_last = nn.ConvTranspose2d(nch, 3, ks)
    relu = nn.ReLU()

    def fwd(x):
        residuals = []
        t = relu(conv_first(x))
        t = relu(conv(t))
        residuals.append(t.clone())
        for _ in range((depth - 6) // 2):
            t = relu(conv(t))
            t = relu(conv(t))
            residuals.append(t.clone())
        t = relu(conv(t))
        t = relu(deconv(t))
        t = relu(t + residuals.pop())
        for _ in range((depth - 6) // 2):
            t = relu(deconv(t))
            t = relu(deconv(t))
            t = relu(t + residuals.pop())
        t = relu(deconv(t))
        return relu(deconv_last(t))

    def tc_w(m):  # transposed conv (I,O,k,k) -> flipped HWIO
        w = m.weight.detach().numpy()[:, :, ::-1, ::-1]
        return np.ascontiguousarray(w.transpose(2, 3, 0, 1))

    params = {
        "conv_first": {"w": torch_import.conv_w(conv_first.weight),
                       "b": torch_import._np(conv_first.bias)},
        "conv": {"w": torch_import.conv_w(conv.weight),
                 "b": torch_import._np(conv.bias)},
        "deconv": {"w": tc_w(deconv), "b": torch_import._np(deconv.bias)},
        "deconv_last": {"w": tc_w(deconv_last),
                        "b": torch_import._np(deconv_last.bias)},
    }
    rng = np.random.default_rng(2)
    x = rng.random((1, 3, 48, 48), dtype=np.float32)
    with torch.no_grad():
        ref = fwd(torch.from_numpy(x)).numpy()
    got = legacy.RedCNN.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              depth=depth)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=3e-5)


def test_resnet_generator_shapes():
    params, state = p2p.ResnetGenerator.init(jax.random.PRNGKey(0), ngf=8,
                                             n_blocks=2)
    x = jnp.zeros((1, 64, 64, 3))
    y, _ = p2p.ResnetGenerator.apply(params, x, state, train=False)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


def test_patchgan_matches_torch():
    """4x4 stride-2 ladder parity incl. the asymmetric SAME-like padding."""
    ndf, n_layers = 8, 2
    torch.manual_seed(3)
    # padding=2 (= ceil(3/2)) and the ABSOLUTE 512 doubling cap, exactly as
    # p2p_networks.py:310-331 builds it
    seq = [nn.Conv2d(6, ndf, 4, stride=2, padding=2), nn.LeakyReLU(0.2)]
    c = ndf
    for i in range(1, n_layers + 1):
        cout = min(c * 2, 512)
        stride = 2 if i < n_layers else 1
        seq += [nn.Conv2d(c, cout, 4, stride=stride, padding=2),
                nn.BatchNorm2d(cout), nn.LeakyReLU(0.2)]
        c = cout
    seq.append(nn.Conv2d(c, 1, 4, stride=1, padding=2))
    tm = nn.Sequential(*seq).eval()

    sd = tm.state_dict()
    params, state = p2p.NLayerDiscriminator.init(
        jax.random.PRNGKey(0), input_nc=6, ndf=ndf, n_layers=n_layers)
    idxs = [0, 2, 5]
    for li, (lay, ti) in enumerate(zip(params["layers"], idxs)):
        lay["c"] = torch_import._lay(sd, str(ti), "conv")
        if f"n{li}" in state:
            bnp, bns = torch_import._bn(sd, str(ti + 1))
            lay["n"] = bnp
            state[f"n{li}"] = bns
    params["out"] = torch_import._lay(sd, "8", "conv")

    rng = np.random.default_rng(4)
    x = rng.random((1, 6, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got, _ = p2p.NLayerDiscriminator.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), state, train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_multiscale_discriminator():
    params, state = p2p.MultiscaleDiscriminator.init(
        jax.random.PRNGKey(0), input_nc=6, ndf=4, num_D=2)
    outs, _ = p2p.MultiscaleDiscriminator.apply(
        params, jnp.zeros((1, 64, 64, 6)), state)
    assert len(outs) == 2
    assert outs[1].shape[1] < outs[0].shape[1]  # pyramid


def test_multiscale_downsample_matches_torch_avgpool():
    """The pyramid downsample is AvgPool2d(3, 2, padding=1,
    count_include_pad=False) (p2p_networks.py:372) — overlapping windows
    with edge renormalization, not a disjoint 2x2 pool."""
    rng = np.random.default_rng(0)
    x = rng.random((2, 9, 12, 3), dtype=np.float32)
    ref = nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(p2p._avgpool3x3_s2_p1(jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_hulf112_shapes():
    params, state = hul.Hulf112Disc.init(jax.random.PRNGKey(0), funit=1)
    y, _ = hul.Hulf112Disc.apply(params, jnp.zeros((1, 112, 112, 6)), state)
    assert y.shape[0] == 1 and y.shape[-1] == 1


def _build_hul_twin(cls, input_channels, funit):
    """Torch twin of a Hul discriminator built from the declarative plan
    (independent of models/torch_import.py): Sequential blocks of
    Conv2d -> activation -> [BatchNorm2d], mirroring the reference's module
    layout (Hul.py:255-417 and variants)."""
    torch.manual_seed(0)
    m = nn.Module()
    for bname, specs in cls.plan.items():
        seq = []
        for li, (cin_m, cout_m, k, dil, stride, bias, bn) in enumerate(specs):
            cin = input_channels if cin_m is None else cin_m * funit
            cout = max(1, cout_m * funit) if cout_m else 1
            seq.append(nn.Conv2d(cin, cout, k, stride=stride, dilation=dil,
                                 bias=bias))
            if not (bname == "decide" and li == len(specs) - 1):
                seq.append(nn.PReLU(init=0.01) if cls.activation == "PReLU"
                           else nn.LeakyReLU())
            if bn and cls.use_bn:
                b = nn.BatchNorm2d(cout)
                # randomize affine + running stats so the import mapping of
                # all four BN tensors is actually exercised
                with torch.no_grad():
                    b.weight.uniform_(0.5, 1.5)
                    b.bias.uniform_(-0.3, 0.3)
                    b.running_mean.uniform_(-0.2, 0.2)
                    b.running_var.uniform_(0.5, 1.5)
                seq.append(b)
        m.add_module(bname, nn.Sequential(*seq))
    m.out_activation = nn.PReLU(init=0.01)
    return m.eval()


def _hul_twin_forward(m, x):
    """Reference dataflow (Hul.py forward, :400-417): std/dil concat pairs
    with the 112->102 dilated branch fed from the raw input."""
    cat = lambda a, b: torch.cat([a, b], 1)
    layer = cat(m.enc112to108std(x), m.enc112to108dil(x))
    layer = cat(m.enc108to104std(layer), m.enc108to104dil(layer))
    layer = cat(m.enc104to102std(layer), m.enc112to102dil(x))
    layer = m.enc102to34str(layer)
    for lvl in ("34to30", "30to26", "26to22", "22to18"):
        layer = cat(getattr(m, f"enc{lvl}std")(layer),
                    getattr(m, f"enc{lvl}dil")(layer))
    layer = m.enc18to6str(layer)
    layer = cat(m.enc6to2std(layer), m.enc6to2dil(layer))
    return m.out_activation(m.decide(layer))


@pytest.mark.parametrize("net,in_ch", [("Hul112Disc", 3), ("Hulb112Disc", 3),
                                       ("Hull112Disc", 3), ("Hulf112Disc", 6)])
def test_hul_disc_torch_import_parity(net, in_ch, tmp_path):
    """import_hul_disc maps a reference-layout state_dict so that the JAX
    forward matches the torch twin (eval mode, running BN stats)."""
    cls = getattr(hul, net)
    twin = _build_hul_twin(cls, in_ch, funit=2)
    fp = str(tmp_path / f"discriminator_5.pt")
    torch.save(twin.state_dict(), fp)

    params, state = torch_import.import_hul_disc(fp, net)
    rng = np.random.default_rng(7)
    x = rng.random((2, in_ch, 112, 112), dtype=np.float32)
    with torch.no_grad():
        ref = _hul_twin_forward(twin, torch.from_numpy(x)).numpy()
    got, _ = cls.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), state,
                       train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_hul_disc_import_rejects_finalpool(tmp_path):
    """finalpool=True checkpoints have a 1x1 first decide conv; the importer
    must reject them instead of silently mis-wiring."""
    twin = _build_hul_twin(hul.Hul112Disc, 3, funit=2)
    sd = twin.state_dict()
    sd["decide.0.weight"] = torch.zeros((4, 12, 1, 1))
    with pytest.raises(ValueError, match="finalpool"):
        torch_import.import_hul_disc(sd, "Hul112Disc")


def test_discriminator_wrapper_loads_pt(tmp_path):
    """DiscriminatorWrapper(model_path=<dir with .pt>) imports the torch
    state_dict (fresh Adam/scheduler, matching a reference-era resume)."""
    from nind_denoise_tpu.train import gan

    twin = _build_hul_twin(hul.Hul112Disc, 6, funit=2)
    torch.save(twin.state_dict(), str(tmp_path / "discriminator_7.pt"))

    class A:
        beta1 = 0.5
        models_dpath = None

    d = gan.DiscriminatorWrapper(A, network="Hul112Disc", funit=2, lr=1e-4,
                                 conditional=True, seed=0,
                                 model_path=str(tmp_path))
    ref_w = twin.decide[2].weight.detach().numpy()
    got_w = np.asarray(d.state.params["decide"][1]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(got_w, ref_w, atol=0)
