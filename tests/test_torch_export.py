"""torch_export: JAX pytree -> reference-format torch state_dict.

The oracle is strict ``load_state_dict`` into the SAME programmatic torch
twins the import-parity tests use (test_models_parity.build_torch_*): a
strict load proves the exported key set and shapes match the reference
module tree exactly, and the forward comparison proves the kernel inverse
maps (HWIO->OIHW, un-flip tconv3, matmul->(I,O,2,2)) are right, not just
shape-compatible. Round-trip import(export(p)) must be bit-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nind_denoise_tpu.models import torch_export, torch_import, unet, utnet

torch = pytest.importorskip("torch")

from test_models_parity import build_torch_unet, build_torch_utnet  # noqa: E402


def _to_torch(sd):
    return {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}


@pytest.mark.parametrize("activation", ["PReLU", "ELU"])
def test_utnet_export_loads_strict_and_matches(activation):
    params = utnet.UtNet.init(jax.random.PRNGKey(4), funit=8,
                              activation=activation)
    sd = torch_export.export_utnet(params)
    tm = build_torch_utnet(funit=8, activation=activation)
    tm.load_state_dict(_to_torch(sd), strict=True)
    tm.eval()

    rng = np.random.default_rng(9)
    x = rng.random((1, 3, 104, 104), dtype=np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()
    y = utnet.UtNet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          activation=activation)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=1e-4)


def test_utnet_export_import_roundtrip_bitexact():
    params = utnet.UtNet.init(jax.random.PRNGKey(5), funit=8)
    sd = _to_torch(torch_export.export_utnet(params))
    back = torch_import.import_utnet(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      flat_b[jax.tree_util.keystr(k)])


def test_unet_export_loads_strict_and_matches():
    params, state = unet.UNet.init(jax.random.PRNGKey(6))
    sd = torch_export.export_unet(params, state)
    tm = build_torch_unet()
    tm.load_state_dict(_to_torch(sd), strict=True)
    tm.eval()

    rng = np.random.default_rng(10)
    x = rng.random((1, 3, 64, 64), dtype=np.float32)
    with torch.no_grad():
        ref = tm.forward(torch.from_numpy(x)).numpy()
    y, _ = unet.UNet.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           state, train=False)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("net,in_ch", [("Hul112Disc", 3), ("Hulb112Disc", 3),
                                       ("Hull112Disc", 3), ("Hulf112Disc", 6)])
def test_hul_disc_export_roundtrip_strict(net, in_ch):
    """export_hul_disc inverts import_hul_disc bit-exactly, and the result
    strict-loads into the reference-layout torch twin."""
    from test_models_zoo import _build_hul_twin

    from nind_denoise_tpu.models import hul

    twin = _build_hul_twin(getattr(hul, net), in_ch, funit=2)
    sd0 = twin.state_dict()
    params, state = torch_import.import_hul_disc(sd0, net)
    sd1 = torch_export.export_hul_disc(params, state, net)
    assert set(sd1) == set(sd0.keys())
    for k, v in sd0.items():
        np.testing.assert_array_equal(sd1[k], v.numpy())
    twin.load_state_dict(_to_torch(sd1), strict=True)


@pytest.mark.parametrize("net", ["Hulb128Net", "Hulbs128Net"])
def test_hul_gen_export_roundtrip_strict(net):
    from test_hul_gen import _build_hulb_twin

    from nind_denoise_tpu.models import hul_gen

    twin = _build_hulb_twin(getattr(hul_gen, net), funit=1)
    sd0 = twin.state_dict()
    params = torch_import.import_hul_gen(sd0, net)
    sd1 = torch_export.export_hul_gen(params, net)
    assert set(sd1) == set(sd0.keys())
    for k, v in sd0.items():
        np.testing.assert_array_equal(sd1[k], v.numpy())
    twin.load_state_dict(_to_torch(sd1), strict=True)


def test_convert_checkpoint_reverse_cli(tmp_path):
    """nind-convert-checkpoint mine.npz mine.pt --network UtNet: the written
    .pt must deserialize to the exported state_dict bit-for-bit."""
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.tools import convert_checkpoint

    params = utnet.UtNet.init(jax.random.PRNGKey(7), funit=8)
    src = str(tmp_path / "generator_2.npz")
    dst = str(tmp_path / "generator_2.pt")
    params_io.save({"params": params, "epoch": 2}, src)
    out = convert_checkpoint.main([src, dst, "--network", "UtNet"])
    assert out == dst
    sd = torch.load(dst, map_location="cpu", weights_only=True)
    want = torch_export.export_utnet(params)
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k].numpy(), want[k])
    # and the reference-side loader path accepts it: import back, same tree
    back = torch_import.import_utnet(sd)
    np.testing.assert_array_equal(
        np.asarray(back["up1"]["w"]), np.asarray(params["up1"]["w"]))
