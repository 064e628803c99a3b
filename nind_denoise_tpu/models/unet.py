"""Legacy UNet generator (functional JAX, NHWC).

Parity with the reference's classic U-Net
(/root/reference/src/nind_denoise/networks/nnModules.py:104-210): double
(3x3 SAME conv + BN + ReLU) blocks, 64->128->256->512->512 encoder with 2x2
max-pool downs, 2x2/stride-2 transposed-conv ups with center-pad alignment,
skip concats, 1x1 out conv, sigmoid output; optional ``find_noise`` residual
mode returns ``input - sigmoid(out)``.

Up-convs use the matmul + pixel-shuffle formulation (ops/conv.py). BatchNorm
is functional (models/norm.py): ``apply`` threads a state pytree.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import conv as C
from . import norm
from .utnet import _init_conv, _init_upconv

CHANNELS = [64, 128, 256, 512, 512]


def _init_double(key, cin, cout):
    k1, k2 = jax.random.split(key)
    p1 = _init_conv(k1, 3, 3, cin, cout, None)
    p2 = _init_conv(k2, 3, 3, cout, cout, None)
    bn1p, bn1s = norm.init(cout)
    bn2p, bn2s = norm.init(cout)
    params = {"c0": p1, "bn0": bn1p, "c1": p2, "bn1": bn2p}
    state = {"bn0": bn1s, "bn1": bn2s}
    return params, state


def _apply_double(p, s, x, train):
    x = C.conv2d(x, p["c0"]["w"], p["c0"]["b"], "SAME")
    x, s0 = norm.apply(p["bn0"], s["bn0"], x, train)
    x = jax.nn.relu(x)
    x = C.conv2d(x, p["c1"]["w"], p["c1"]["b"], "SAME")
    x, s1 = norm.apply(p["bn1"], s["bn1"], x, train)
    x = jax.nn.relu(x)
    return x, {"bn0": s0, "bn1": s1}


def _pad_to_match(x1, x2):
    """Center-pad x1 spatially to x2's H, W (reference up.forward diff pad)."""
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    return jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))


class UNet:
    name = "UNet"
    kind = "generator"

    @staticmethod
    def init(key, n_channels: int = 3, n_classes: int = 3,
             **_ignored) -> Tuple[Dict, Dict]:
        ch = CHANNELS
        keys = iter(jax.random.split(key, 16))
        nk = lambda: next(keys)
        params: Dict = {}
        state: Dict = {}
        params["inc"], state["inc"] = _init_double(nk(), n_channels, ch[0])
        for i in range(4):
            params[f"down{i+1}"], state[f"down{i+1}"] = _init_double(nk(), ch[i], ch[i + 1])
        # up blocks: up k operates on in_ch//2 feature channels
        up_inch = [1024, 512, 256, 128]
        up_outch = [256, 128, 64, 64]
        for i, (cin, cout) in enumerate(zip(up_inch, up_outch)):
            params[f"up{i+1}_t"] = _init_upconv(nk(), cin // 2, cin // 2)
            params[f"up{i+1}"], state[f"up{i+1}"] = _init_double(nk(), cin, cout)
        params["outc"] = _init_conv(nk(), 1, 1, ch[0], n_classes, None)
        return params, state

    @staticmethod
    def apply(params: Dict, x: jnp.ndarray, state: Dict, train: bool = False,
              find_noise: bool = False, **_ignored):
        """x: NHWC. Returns (y, new_state)."""
        new_state: Dict = {}
        x_in = x
        x1, new_state["inc"] = _apply_double(params["inc"], state["inc"], x, train)
        feats = [x1]
        t = x1
        for i in range(4):
            k = f"down{i+1}"
            t, new_state[k] = _apply_double(params[k], state[k], C.maxpool2x(t), train)
            feats.append(t)
        skips = feats[:4][::-1]  # x4, x3, x2, x1
        for i in range(4):
            k = f"up{i+1}"
            t = C.upconv2x(t, params[f"{k}_t"]["w"], params[f"{k}_t"]["b"])
            t = _pad_to_match(t, skips[i])
            t = jnp.concatenate([skips[i], t], axis=-1)
            t, new_state[k] = _apply_double(params[k], state[k], t, train)
        t = C.conv2d(t, params["outc"]["w"], params["outc"]["b"], "VALID")
        if find_noise:
            return x_in - jax.nn.sigmoid(t), new_state
        return jax.nn.sigmoid(t), new_state
