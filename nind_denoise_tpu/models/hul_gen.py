"""Hul generator family: Hulb128Net / Hulbs128Net (functional JAX, NHWC).

Parity with /root/reference/src/nind_denoise/networks/Hul.py:12-250 (Hulb) and
:421-658 (Hulbs — identical channel plan with SELU instead of PReLU(0.01)):
a dense-concat encoder/decoder with dual standard+dilated conv branches, two
stride-3 downsampling convs (canonical 128 -> 114 -> 38 -> 30 -> 10 -> 2
spatial plan), mirrored transposed-conv decoder (k3 plain / dilation-2 /
stride-3 — lowered to dilated plain convs, ops/conv.py), and dense skip
concats at every level. Final 3x3 tconv + 1x1 tconv head with an optional
output activation (PReLU(0.01) by default, Hul.py:204-213).

Valid input sizes: (size - 14) and the resulting /3 stages must stay
integral — 128 is the canonical training crop ("w/ Hulb128Net BS 12 on 7GB
GPU", Hul.py:253).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import conv as C

# layer spec: (cin_mult, cout_mult, type, bias)
#   type: c = conv3 VALID, d2/d5 = dilated conv, s3 = stride-3 conv,
#         t = tconv3, td2 = dilated tconv3, ts3 = stride-3 tconv3,
#         t1 = 1x1 tconv (== 1x1 conv)
# cin_mult None = raw input channels (3)
_PLAN: Dict[str, List[Tuple[Optional[int], int, str, bool]]] = {
    # encoder
    "enc128to126std": [(None, 2, "c", True)],
    "enc126to122std": [(2, 2, "c", False), (2, 2, "c", False)],
    "enc122to118std": [(4, 2, "c", False), (2, 2, "c", False)],
    "enc126to122dil": [(2, 2, "d2", False)],
    "enc122to118dil": [(4, 2, "d2", False)],
    "enc128to118dil": [(None, 2, "d5", False)],
    "enc118to114std": [(6, 2, "c", False), (2, 2, "c", False)],
    "enc118to114dil": [(6, 2, "d2", False)],
    "enc114to38str": [(4, 4, "s3", False)],
    "enc38to34std": [(4, 2, "c", False), (2, 2, "c", False)],
    "enc34to30std": [(4, 2, "c", False), (2, 2, "c", False)],
    "enc38to34dil": [(4, 2, "d2", False)],
    "enc34to30dil": [(4, 2, "d2", False)],
    "enc30to10str": [(4, 4, "s3", False)],
    "enc10to6std": [(4, 3, "c", False), (3, 3, "c", False)],
    "enc6to2std": [(6, 6, "c", False), (6, 6, "c", False)],
    "enc10to6dil": [(4, 3, "d2", False)],
    "enc6to2dil": [(6, 6, "d2", False)],
    # decoder
    "dec2to6std": [(12, 3, "t", False), (3, 3, "t", False)],
    "dec6to10std": [(12, 3, "t", False), (3, 3, "t", False)],
    "dec2to6dil": [(12, 3, "td2", False)],
    "dec6to10dil": [(12, 3, "td2", False)],
    "dec10to30str": [(10, 5, "ts3", False)],
    "dec30to34std": [(9, 3, "t", False), (3, 3, "t", False)],
    "dec30to34dil": [(9, 3, "td2", False)],
    "dec34to38std": [(10, 3, "t", False), (3, 3, "t", False)],
    "dec34to38dil": [(10, 3, "td2", False)],
    "dec38to114str": [(10, 4, "ts3", False)],
    "dec114to118std": [(8, 3, "t", False), (3, 3, "t", False)],
    "dec114to118dil": [(8, 3, "td2", False)],
    "dec118to122std": [(12, 3, "t", False), (3, 3, "t", False)],
    "dec118to122dil": [(12, 3, "td2", False)],
    "dec122to126std": [(10, 3, "t", False), (3, 3, "t", False)],
    "dec122to126dil": [(10, 3, "td2", False)],
    "dec126to128std": [(8, 2, "t", True), (2, 0, "t1", True)],
}

_KSIZE = {"c": 3, "d2": 3, "d5": 3, "s3": 3, "t": 3, "td2": 3, "ts3": 3, "t1": 1}


def _apply_layer(x, lay, ltype):
    w, b = lay["w"], lay.get("b")
    if ltype == "c":
        return C.conv2d(x, w, b, "VALID")
    if ltype == "d2":
        return C.conv2d_dilated(x, w, b, 2)
    if ltype == "d5":
        return C.conv2d_dilated(x, w, b, 5)
    if ltype == "s3":
        return C.conv2d(x, w, b, "VALID", stride=3)
    if ltype == "t":
        return C.tconv2d_k3s1(x, w, b)
    if ltype == "td2":
        return C.tconv2d_k3s1_dil(x, w, b, 2)
    if ltype == "ts3":
        return C.tconv2d_k3s3(x, w, b)
    if ltype == "t1":
        return C.conv2d(x, w, b, "VALID")  # 1x1 tconv == 1x1 conv
    raise ValueError(ltype)


class Hulb128Net:
    """Functional Hulb128Net. apply(params, x_nhwc) -> same spatial size."""

    name = "Hulb128Net"
    kind = "generator"
    act = "PReLU"  # PReLU(0.01) between convs

    @classmethod
    def init(cls, key, funit: int = 32, activation: str = "PReLU",
             in_channels: int = 3, **_ignored) -> Dict:
        """``activation`` selects the FINAL output activation (must be passed
        identically to ``apply``; it is static, not part of the pytree)."""
        params: Dict = {}
        keys = iter(jax.random.split(key, 64))
        for bname, specs in _PLAN.items():
            layers = []
            for (cin_m, cout_m, ltype, bias) in specs:
                cin = in_channels if cin_m is None else cin_m * funit
                cout = max(1, cout_m * funit) if cout_m else 3  # t1 head -> 3ch
                k = _KSIZE[ltype]
                fan_in = cin * k * k
                bound = 1.0 / math.sqrt(fan_in)
                kw, kb = jax.random.split(next(keys))
                lay = {"w": jax.random.uniform(kw, (k, k, cin, cout),
                                               jnp.float32, -bound, bound)}
                if bias:
                    lay["b"] = jax.random.uniform(kb, (cout,), jnp.float32,
                                                  -bound, bound)
                if cls.act == "PReLU":
                    lay["a"] = jnp.full((), 0.01, jnp.float32)
                layers.append(lay)
            params[bname] = layers
        if activation == "PReLU":
            params["_final_a"] = jnp.full((), 0.01, jnp.float32)
        return params

    @classmethod
    def _block(cls, params, bname, x, last_no_act: bool = False):
        specs = _PLAN[bname]
        for li, lay in enumerate(params[bname]):
            x = _apply_layer(x, lay, specs[li][2])
            if last_no_act and li == len(specs) - 1:
                break
            if cls.act == "PReLU":
                x = C.prelu(x, lay["a"])
            else:
                x = jax.nn.selu(x)
        return x

    @classmethod
    def apply(cls, params: Dict, x: jnp.ndarray, activation: str = "PReLU",
              **_ignored) -> jnp.ndarray:
        cat = lambda *ts: jnp.concatenate(ts, axis=-1)
        B = lambda name, t, **kw: cls._block(params, name, t, **kw)
        # encoder (dense concat branches)
        l126 = B("enc128to126std", x)
        l122 = cat(B("enc126to122std", l126), B("enc126to122dil", l126))
        l118 = cat(B("enc122to118std", l122), B("enc122to118dil", l122),
                   B("enc128to118dil", x))
        l114 = cat(B("enc118to114std", l118), B("enc118to114dil", l118))
        l38 = B("enc114to38str", l114)
        l34 = cat(B("enc38to34std", l38), B("enc38to34dil", l38))
        l30 = cat(B("enc34to30std", l34), B("enc34to30dil", l34))
        l10 = B("enc30to10str", l30)
        l6 = cat(B("enc10to6std", l10), B("enc10to6dil", l10))
        l2 = cat(B("enc6to2std", l6), B("enc6to2dil", l6))
        # decoder (skip concats)
        l6 = cat(l6, B("dec2to6std", l2), B("dec2to6dil", l2))
        l10 = cat(l10, B("dec6to10std", l6), B("dec6to10dil", l6))
        l30 = cat(l30, B("dec10to30str", l10))
        l34 = cat(l34, B("dec30to34std", l30), B("dec30to34dil", l30))
        l38 = cat(l38, B("dec34to38std", l34), B("dec34to38dil", l34))
        l114 = cat(l114, B("dec38to114str", l38))
        l118 = cat(l118, B("dec114to118std", l114), B("dec114to118dil", l114))
        l122 = cat(l122, B("dec118to122std", l118), B("dec118to122dil", l118))
        l126 = cat(l126, B("dec122to126std", l122), B("dec122to126dil", l122))
        res = B("dec126to128std", l126, last_no_act=True)
        if activation in (None, "None"):
            return res
        if activation == "ReLU":
            return jax.nn.relu(res)
        if activation == "Sigmoid":
            return jax.nn.sigmoid(res)
        return C.prelu(res, params["_final_a"])


class Hulbs128Net(Hulb128Net):
    """SELU variant (Hul.py:421-658): identical plan, SELU activations."""

    name = "Hulbs128Net"
    act = "SELU"
