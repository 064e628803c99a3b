"""pix2pix-style GAN infrastructure (functional JAX, NHWC).

Parity with /root/reference/src/nind_denoise/networks/p2p_networks.py:

* ``ResnetGenerator`` (:107-143): reflect-pad-3 + 7x7 conv head, two
  stride-2 down convs, 9 residual blocks (reflect-padded 3x3 convs), two
  stride-2 transposed-conv ups (k3, p1, output_padding=1), 7x7 tanh tail.
* ``NLayerDiscriminator`` / PatchGAN (:304-354): 4x4 stride-2 conv ladder
  with norm + LeakyReLU(0.2), stride-1 tail to a 1-channel patch map,
  optional sigmoid.
* ``PixelDiscriminator`` (:279-302): 1x1 conv stack.
* ``MultiscaleDiscriminator`` (:356-397): N patch discriminators over an
  avg-pool image pyramid.
* ``define_G`` / ``define_D`` factories (:85-105, :254-278) resolving to the
  registry (Hul* nets included).

Norm choice: 'batch' (stateful — apply returns (y, new_state)) or 'instance'
(torch defaults: affine=False, no running stats — stateless).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import conv as C
from . import norm
from .utnet import _init_conv


def _tconv2d_k3s2(x, w_conv, b=None):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) with the
    kernel pre-converted to plain-conv HWIO form: lhs-dilated conv with
    asymmetric padding ((1,2),(1,2)); output spatial = 2x input."""
    dn = lax.conv_dimension_numbers(x.shape, w_conv.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w_conv.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 2), (1, 2)), lhs_dilation=(2, 2), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _maybe_norm(nt: str, c: int):
    """(params, state) for one norm site; instance norm has neither."""
    if nt == "batch":
        return norm.init(c)
    return None, None


def _apply_norm(nt, nparams, nstate, x, train):
    if nt == "batch":
        return norm.apply(nparams, nstate, x, train)
    if nt == "instance":
        return norm.instance_norm(x), nstate
    return x, nstate


class ResnetGenerator:
    name = "ResnetGenerator"
    kind = "generator"

    @staticmethod
    def init(key, input_nc: int = 3, output_nc: int = 3, ngf: int = 64,
             n_blocks: int = 9, norm_type: str = "batch", **_ignored):
        keys = iter(jax.random.split(key, 8 + 2 * n_blocks))
        nk = lambda: next(keys)
        params: Dict = {}
        state: Dict = {}

        def site(tag, kh, cin, cout):
            params[tag] = _init_conv(nk(), kh, kh, cin, cout, None)
            np_, ns_ = _maybe_norm(norm_type, cout)
            if np_ is not None:
                params[tag + "_n"], state[tag + "_n"] = np_, ns_

        site("inc", 7, input_nc, ngf)
        site("down1", 3, ngf, ngf * 2)
        site("down2", 3, ngf * 2, ngf * 4)
        blocks = []
        for i in range(n_blocks):
            b: Dict = {"c0": _init_conv(nk(), 3, 3, ngf * 4, ngf * 4, None),
                       "c1": _init_conv(nk(), 3, 3, ngf * 4, ngf * 4, None)}
            for j in (0, 1):
                np_, ns_ = _maybe_norm(norm_type, ngf * 4)
                if np_ is not None:
                    b[f"n{j}"] = np_
                    state[f"res{i}_n{j}"] = ns_
            blocks.append(b)
        params["blocks"] = blocks
        site("up1", 3, ngf * 4, ngf * 2)
        site("up2", 3, ngf * 2, ngf)
        params["outc"] = _init_conv(nk(), 7, 7, ngf, output_nc, None)
        return params, state

    @staticmethod
    def apply(params, x, state, train: bool = False, norm_type: str = "batch",
              **_ignored):
        ns: Dict = {}

        def conv_norm_relu(tag, t, k, stride=1, reflect=0):
            if reflect:
                t = C.reflect_pad(t, reflect)
            pad = "VALID" if reflect else ("SAME" if stride == 1 else ((1, 1), (1, 1)))
            t = C.conv2d(t, params[tag]["w"], params[tag].get("b"), pad, stride)
            t, ns[tag + "_n"] = _apply_norm(norm_type, params.get(tag + "_n"),
                                            state.get(tag + "_n"), t, train)
            return jax.nn.relu(t)

        t = conv_norm_relu("inc", x, 7, reflect=3)
        t = conv_norm_relu("down1", t, 3, stride=2)
        t = conv_norm_relu("down2", t, 3, stride=2)
        for i, b in enumerate(params["blocks"]):
            r = C.reflect_pad(t, 1)
            r = C.conv2d(r, b["c0"]["w"], b["c0"].get("b"), "VALID")
            r, ns[f"res{i}_n0"] = _apply_norm(norm_type, b.get("n0"),
                                              state.get(f"res{i}_n0"), r, train)
            r = jax.nn.relu(r)
            r = C.reflect_pad(r, 1)
            r = C.conv2d(r, b["c1"]["w"], b["c1"].get("b"), "VALID")
            r, ns[f"res{i}_n1"] = _apply_norm(norm_type, b.get("n1"),
                                              state.get(f"res{i}_n1"), r, train)
            t = t + r
        for tag in ("up1", "up2"):
            t = _tconv2d_k3s2(t, params[tag]["w"], params[tag].get("b"))
            t, ns[tag + "_n"] = _apply_norm(norm_type, params.get(tag + "_n"),
                                            state.get(tag + "_n"), t, train)
            t = jax.nn.relu(t)
        t = C.reflect_pad(t, 3)
        t = C.conv2d(t, params["outc"]["w"], params["outc"].get("b"), "VALID")
        return jnp.tanh(t), {k: v for k, v in ns.items() if v is not None}


class NLayerDiscriminator:
    """PatchGAN critic (4x4 stride-2 ladder)."""

    name = "NLayerDiscriminator"
    kind = "discriminator"

    @staticmethod
    def init(key, input_nc: int = 6, ndf: int = 64, n_layers: int = 3,
             norm_type: str = "batch", **_ignored):
        keys = iter(jax.random.split(key, n_layers + 3))
        nk = lambda: next(keys)
        params: Dict = {"layers": []}
        state: Dict = {}
        cin, cout = input_nc, ndf
        params["layers"].append({"c": _init_conv(nk(), 4, 4, cin, cout, None)})
        for i in range(1, n_layers + 1):
            # reference doubles capped at an ABSOLUTE 512 (p2p_networks.py:
            # 317,324 ``nf = min(nf * 2, 512)``), not 8*ndf
            cin, cout = cout, min(cout * 2, 512)
            lay = {"c": _init_conv(nk(), 4, 4, cin, cout, None)}
            np_, ns_ = _maybe_norm(norm_type, cout)
            if np_ is not None:
                lay["n"] = np_
                state[f"n{i}"] = ns_
            params["layers"].append(lay)
        params["out"] = _init_conv(nk(), 4, 4, cout, 1, None)
        return params, state

    @staticmethod
    def apply(params, x, state, train: bool = False, norm_type: str = "batch",
              use_sigmoid: bool = False, **_ignored):
        ns: Dict = {}
        t = x
        n_total = len(params["layers"])
        # torch Conv2d(k=4, padding=ceil(3/2)=2) — p2p_networks.py:311
        pad1 = ((2, 2), (2, 2))
        for i, lay in enumerate(params["layers"]):
            stride = 2 if i < n_total - 1 else 1  # last ladder conv is stride 1
            t = C.conv2d(t, lay["c"]["w"], lay["c"].get("b"), pad1, stride)
            if "n" in lay:
                t, ns[f"n{i}"] = norm.apply(lay["n"], state[f"n{i}"], t, train)
            elif norm_type == "instance" and i > 0:
                t = norm.instance_norm(t)
            t = jax.nn.leaky_relu(t, 0.2)
        t = C.conv2d(t, params["out"]["w"], params["out"].get("b"), pad1)
        if use_sigmoid:
            t = jax.nn.sigmoid(t)
        return t, ns


class PixelDiscriminator:
    name = "PixelDiscriminator"
    kind = "discriminator"

    @staticmethod
    def init(key, input_nc: int = 6, ndf: int = 64, norm_type: str = "batch",
             **_ignored):
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "c0": _init_conv(k1, 1, 1, input_nc, ndf, None),
            "c1": _init_conv(k2, 1, 1, ndf, ndf * 2, None),
            "c2": _init_conv(k3, 1, 1, ndf * 2, 1, None),
        }
        state: Dict = {}
        np_, ns_ = _maybe_norm(norm_type, ndf * 2)
        if np_ is not None:
            params["n1"], state["n1"] = np_, ns_
        return params, state

    @staticmethod
    def apply(params, x, state, train: bool = False, norm_type: str = "batch",
              use_sigmoid: bool = False, **_ignored):
        ns: Dict = {}
        t = jax.nn.leaky_relu(C.conv2d(x, params["c0"]["w"], params["c0"]["b"],
                                       "VALID"), 0.2)
        t = C.conv2d(t, params["c1"]["w"], params["c1"].get("b"), "VALID")
        t, ns["n1"] = _apply_norm(norm_type, params.get("n1"), state.get("n1"),
                                  t, train)
        t = jax.nn.leaky_relu(t, 0.2)
        t = C.conv2d(t, params["c2"]["w"], params["c2"].get("b"), "VALID")
        if use_sigmoid:
            t = jax.nn.sigmoid(t)
        return t, ns


def _avgpool3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch AvgPool2d(3, stride=2, padding=1, count_include_pad=False),
    NHWC — the MultiscaleDiscriminator pyramid downsample
    (p2p_networks.py:372)."""
    import jax.lax as lax

    win, strides = (1, 3, 3, 1), (1, 2, 2, 1)
    padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = lax.reduce_window(x, 0.0, lax.add, win, strides, padding)
    cnt = lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, lax.add,
                            win, strides, padding)
    return s / cnt


class MultiscaleDiscriminator:
    """N PatchGAN critics over an avg-pooled image pyramid."""

    name = "MultiscaleDiscriminator"
    kind = "discriminator"

    @staticmethod
    def init(key, input_nc: int = 6, ndf: int = 64, n_layers: int = 3,
             num_D: int = 3, norm_type: str = "batch", **_ignored):
        params, state = {}, {}
        for d, k in enumerate(jax.random.split(key, num_D)):
            params[f"d{d}"], state[f"d{d}"] = NLayerDiscriminator.init(
                k, input_nc, ndf, n_layers, norm_type)
        return params, state

    @staticmethod
    def apply(params, x, state, train: bool = False, norm_type: str = "batch",
              **_ignored) -> Tuple[List[jnp.ndarray], Dict]:
        outs, ns = [], {}
        t = x
        num_d = len(params)
        # reference order (p2p_networks.py:389-396): critic num_D-1 sees the
        # FULL resolution, critic 0 the smallest; downsample is an
        # overlapping AvgPool2d(3, stride=2, padding=1,
        # count_include_pad=False), not a disjoint 2x2 pool
        for i in range(num_d):
            d = num_d - 1 - i
            o, ns[f"d{d}"] = NLayerDiscriminator.apply(
                params[f"d{d}"], t, state[f"d{d}"], train, norm_type)
            outs.append(o)
            if i < num_d - 1:
                t = _avgpool3x3_s2_p1(t)
        return outs, ns


def define_G(key, input_nc: int, output_nc: int, ngf: int,
             norm: str = "batch", net_type: str = "Resnet", **kwargs):
    """Generator factory (p2p_networks.define_G parity)."""
    from . import get_network

    if net_type == "Resnet":
        return ResnetGenerator, ResnetGenerator.init(
            key, input_nc, output_nc, ngf, norm_type=norm, **kwargs)
    return get_network(net_type), get_network(net_type).init(key, **kwargs)


def define_D(key, input_nc: int, ndf: int, netD: str, n_layers_D: int = 3,
             norm: str = "batch", **kwargs):
    """Discriminator factory (p2p_networks.define_D parity)."""
    from . import get_network

    if netD == "basic":
        return NLayerDiscriminator, NLayerDiscriminator.init(
            key, input_nc, ndf, 3, norm)
    if netD == "n_layers":
        return NLayerDiscriminator, NLayerDiscriminator.init(
            key, input_nc, ndf, n_layers_D, norm)
    if netD == "pixel":
        return PixelDiscriminator, PixelDiscriminator.init(key, input_nc, ndf, norm)
    if netD == "multiscale":
        return MultiscaleDiscriminator, MultiscaleDiscriminator.init(
            key, input_nc, ndf, n_layers_D, norm_type=norm)
    net = get_network(netD)
    return net, net.init(key, input_channels=input_nc, **kwargs)
