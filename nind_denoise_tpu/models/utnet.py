"""UtNet — the production denoising generator, in functional JAX (NHWC).

Architecture parity with the reference (networks/UtNet.py:13-109 in
/root/reference/src): a 4-level U-Net-with-transposed-convs —

  input --ReflectionPad(2)--> convs1 (3->f->f, two VALID 3x3 + act)
        --maxpool--> convs2 (f->2f->2f) --maxpool--> convs3 (2f->4f->4f)
        --maxpool--> convs4 (4f->8f->8f) --maxpool-->
        bottom (conv3 8f->16f + tconv3 16f->16f)
  then four decoder levels: up_k (k=1..4) 2x2/stride-2 transposed-conv
  upsample, concat with the matching encoder feature, then two 3x3
  transposed convs (tconvs_k); a final 1x1 conv to 3 channels and a
  ZeroPad2d(-2) crop. funit=64, activation in {PReLU, ELU, Hardswish}.

TPU-first reformulation (see ops/conv.py): stride-1 3x3 transposed convs run
as FULL-padded plain convs (kernels pre-transformed at import time); the
2x2/stride-2 up-convs run as 1x1-conv matmuls + pixel shuffle. Everything is
NHWC so channels ride the 128-wide lane dimension of the MXU/VPU.

Spatial contract (UtNet.py:6-7): output size == input size; the input size
``cs`` must satisfy integrality of ``(((cs/2-4)/2-4)/2-4)/2-2`` — validated
by ``check_cs``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import conv as C

Params = Dict[str, object]


def _fan_in_init(key, shape, fan_in, dtype=jnp.float32):
    """torch-style kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _init_conv(key, kh, kw, cin, cout, act: Optional[str]):
    kw_, kb_, ka_ = jax.random.split(key, 3)
    fan_in = cin * kh * kw
    p = {
        "w": _fan_in_init(kw_, (kh, kw, cin, cout), fan_in),
        "b": _fan_in_init(kb_, (cout,), fan_in),
    }
    if act == "PReLU":
        p["a"] = jnp.full((), 0.25, jnp.float32)
    return p


def _init_tconv3(key, cin, cout, act: Optional[str]):
    # torch ConvTranspose2d fan_in uses weight dim 1 (= cout) * k * k
    kw_, kb_, ka_ = jax.random.split(key, 3)
    fan_in = cout * 9
    p = {
        "w": _fan_in_init(kw_, (3, 3, cin, cout), fan_in),
        "b": _fan_in_init(kb_, (cout,), fan_in),
    }
    if act == "PReLU":
        p["a"] = jnp.full((), 0.25, jnp.float32)
    return p


def _init_upconv(key, cin, cout):
    kw_, kb_ = jax.random.split(key)
    fan_in = cout * 4
    return {
        "w": _fan_in_init(kw_, (cin, 4 * cout), fan_in),
        "b": _fan_in_init(kb_, (cout,), fan_in),
    }


class UtNet:
    """Functional UtNet: ``params = UtNet.init(key, funit, activation)``,
    ``y = UtNet.apply(params, x, activation)`` with x NHWC in [0, 1]-ish."""

    name = "UtNet"
    kind = "generator"
    in_channels = 3
    out_channels = 3

    @staticmethod
    def check_cs(cs: int) -> None:
        """Validate the size formula (((cs/2-4)/2-4)/2-4)/2-2 (UtNet.py:6-7):
        every pool input must be even and the bottom conv must see >= 3 px."""
        v = cs
        for _ in range(3):
            if v % 2:
                raise ValueError(f"UtNet: invalid tile size {cs} (odd at a pool step)")
            v = v // 2 - 4
            if v <= 0:
                raise ValueError(f"UtNet: tile size {cs} too small")
        if v % 2:
            raise ValueError(f"UtNet: invalid tile size {cs} (odd at a pool step)")
        v = v // 2 - 2
        if v <= 0:
            raise ValueError(f"UtNet: tile size {cs} too small at bottom")

    @staticmethod
    def init(key, funit: int = 64, activation: str = "PReLU") -> Params:
        f = funit
        keys = iter(jax.random.split(key, 32))
        nk = lambda: next(keys)
        a = activation

        def double(cin, cmid, cout, tconv=False):
            mk = _init_tconv3 if tconv else (lambda k, ci, co, act: _init_conv(k, 3, 3, ci, co, act))
            return {"c0": mk(nk(), cin, cmid, a), "c1": mk(nk(), cmid, cout, a)}

        params: Params = {
            "convs1": double(3, f, f),
            "convs2": double(f, 2 * f, 2 * f),
            "convs3": double(2 * f, 4 * f, 4 * f),
            "convs4": double(4 * f, 8 * f, 8 * f),
            "bottom": {"c0": _init_conv(nk(), 3, 3, 8 * f, 16 * f, a),
                       "c1": _init_tconv3(nk(), 16 * f, 16 * f, a)},
            "up1": _init_upconv(nk(), 16 * f, 8 * f),
            "tconvs1": double(16 * f, 8 * f, 8 * f, tconv=True),
            "up2": _init_upconv(nk(), 8 * f, 4 * f),
            "tconvs2": double(8 * f, 4 * f, 4 * f, tconv=True),
            "up3": _init_upconv(nk(), 4 * f, 2 * f),
            "tconvs3": double(4 * f, 2 * f, 2 * f, tconv=True),
            "up4": _init_upconv(nk(), 2 * f, f),
            "tconvs4": {"c0": _init_tconv3(nk(), 2 * f, f, a),
                        "c1": _init_tconv3(nk(), f, f, a),
                        "c2": _init_conv(nk(), 1, 1, f, 3, None)},
        }
        return params

    @staticmethod
    def apply(params: Params, x: jnp.ndarray, activation: str = "PReLU") -> jnp.ndarray:
        """Forward pass. x: (N, H, W, 3); returns same shape."""
        act = lambda t, p: C.apply_activation(t, activation, p.get("a"))

        def double_conv(p, t):
            t = act(C.conv2d(t, p["c0"]["w"], p["c0"]["b"], "VALID"), p["c0"])
            t = act(C.conv2d(t, p["c1"]["w"], p["c1"]["b"], "VALID"), p["c1"])
            return t

        def double_tconv(p, t):
            t = act(C.tconv2d_k3s1(t, p["c0"]["w"], p["c0"]["b"]), p["c0"])
            t = act(C.tconv2d_k3s1(t, p["c1"]["w"], p["c1"]["b"]), p["c1"])
            return t

        x = C.reflect_pad(x, 2)
        l1 = double_conv(params["convs1"], x)
        l2 = double_conv(params["convs2"], C.maxpool2x(l1))
        l3 = double_conv(params["convs3"], C.maxpool2x(l2))
        l4 = double_conv(params["convs4"], C.maxpool2x(l3))

        b = params["bottom"]
        t = act(C.conv2d(C.maxpool2x(l4), b["c0"]["w"], b["c0"]["b"], "VALID"), b["c0"])
        t = act(C.tconv2d_k3s1(t, b["c1"]["w"], b["c1"]["b"]), b["c1"])

        t = jnp.concatenate([C.upconv2x(t, params["up1"]["w"], params["up1"]["b"]), l4], axis=-1)
        t = double_tconv(params["tconvs1"], t)
        t = jnp.concatenate([C.upconv2x(t, params["up2"]["w"], params["up2"]["b"]), l3], axis=-1)
        t = double_tconv(params["tconvs2"], t)
        t = jnp.concatenate([C.upconv2x(t, params["up3"]["w"], params["up3"]["b"]), l2], axis=-1)
        t = double_tconv(params["tconvs3"], t)
        t = jnp.concatenate([C.upconv2x(t, params["up4"]["w"], params["up4"]["b"]), l1], axis=-1)

        p4 = params["tconvs4"]
        t = act(C.tconv2d_k3s1(t, p4["c0"]["w"], p4["c0"]["b"]), p4["c0"])
        t = act(C.tconv2d_k3s1(t, p4["c1"]["w"], p4["c1"]["b"]), p4["c1"])
        t = C.conv2d(t, p4["c2"]["w"], p4["c2"]["b"], "VALID")
        return C.crop2(t, 2)
