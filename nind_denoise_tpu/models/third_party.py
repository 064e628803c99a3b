"""Torchvision segmentation-head experiments.

Parity notes for /root/reference/src/nind_denoise/networks/ThirdPartyNets.py
:171-187: the reference's ``MobileNetV3`` wraps torchvision's *pretrained*
``lraspp_mobilenet_v3_large`` and swaps both LR-ASPP classifiers for
3-channel 1x1 convs (low: 40->3, high: 128->3, ThirdPartyNets.py:176-177);
``deeplabv3_resnet101`` performs the analogous surgery but its forward
literally ``raise NotImplementedError`` upstream (ThirdPartyNets.py:186-187).

``MobileNetV3`` here is a REAL functional JAX port (NHWC, dict-pytree
params) of the full LR-ASPP MobileNetV3-Large graph in segmentation form
(dilated last stage), eval-mode BatchNorm — the support level the upstream
experiment actually has (it loads pretrained weights and runs inference;
it was never trained in-repo). Pretrained torchvision weights import via
``models/torch_import.import_mobilenetv3`` (parity-tested against a
hand-built torch twin in tests/test_third_party.py). ``deeplabv3_resnet101``
stays an honest raise-only stub, mirroring upstream.

Architecture facts encoded below (torchvision mobilenetv3 + lraspp):

* stem Conv2d(3,16,k3,s2,p1,bias=False) + BN(eps=1e-3) + Hardswish;
* 15 inverted-residual blocks per the MobileNetV3-Large table; for
  segmentation the last stage is dilated (dilation=2 forces stride=1);
* SE block: avgpool -> Conv1x1(exp, make_divisible(exp/4, 8)) -> ReLU ->
  Conv1x1 -> Hardsigmoid, multiplicative;
* head taps: low = output of features[4] (40ch, stride 8), high = output of
  features[16] (Conv1x1 160->960 + BN + HS, stride 16);
* LR-ASPP head: cbr = Conv1x1(960,128,bias=False)+BN(eps=1e-5)+ReLU;
  scale = GlobalAvgPool + Conv1x1(960,128,bias=False) + Sigmoid;
  x = bilinear(cbr*scale -> low size); out = low_cls(low) + high_cls(x);
  bilinear to input size (align_corners=False everywhere == jax.image
  half-pixel 'linear').
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import conv as C
from . import norm
from .utnet import _fan_in_init


def make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision.models._utils._make_divisible."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# MobileNetV3-Large inverted-residual table, segmentation (dilated) variant:
# (kernel, expanded, out, use_se, activation, stride, dilation)
_LARGE_DILATED: List[Tuple[int, int, int, bool, str, int, int]] = [
    (3, 16, 16, False, "RE", 1, 1),    # features[1]
    (3, 64, 24, False, "RE", 2, 1),    # features[2], C1
    (3, 72, 24, False, "RE", 1, 1),
    (5, 72, 40, True, "RE", 2, 1),     # features[4], C2 -> LR-ASPP "low" tap
    (5, 120, 40, True, "RE", 1, 1),
    (5, 120, 40, True, "RE", 1, 1),
    (3, 240, 80, False, "HS", 2, 1),   # C3
    (3, 200, 80, False, "HS", 1, 1),
    (3, 184, 80, False, "HS", 1, 1),
    (3, 184, 80, False, "HS", 1, 1),
    (3, 480, 112, True, "HS", 1, 1),
    (3, 672, 112, True, "HS", 1, 1),
    (5, 672, 160, True, "HS", 2, 2),   # C4; dilation>1 forces stride=1
    (5, 960, 160, True, "HS", 1, 2),
    (5, 960, 160, True, "HS", 1, 2),
]
_LOW_TAP = 4          # features index whose OUTPUT is the LR-ASPP low input
                      # (stage_indices[-4] in torchvision lraspp: the C2
                      # stride-8, 40-channel stage)
_BN_EPS_BACKBONE = 1e-3   # torchvision norm_layer eps=0.001
_BN_EPS_HEAD = 1e-5       # LRASPPHead uses default BatchNorm2d


def _hs(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def _hsig(x):
    return jax.nn.relu6(x + 3.0) / 6.0


_ACT = {"RE": jax.nn.relu, "HS": _hs}


def _init_cbn(key, k: int, cin: int, cout: int, groups: int = 1):
    wkey, = jax.random.split(key, 1)
    fan_in = (cin // groups) * k * k
    bnp, bns = norm.init(cout)
    return ({"w": _fan_in_init(wkey, (k, k, cin // groups, cout), fan_in),
             "bn": bnp}, bns)


def _init_c(key, k: int, cin: int, cout: int, bias: bool = True):
    wk, bk = jax.random.split(key)
    fan_in = cin * k * k
    p = {"w": _fan_in_init(wk, (k, k, cin, cout), fan_in)}
    if bias:
        p["b"] = _fan_in_init(bk, (cout,), fan_in)
    return p


def _cbn(lay, st, x, stride=1, dilation=1, groups=1, act=None,
         eps=_BN_EPS_BACKBONE):
    y = C.conv2d_torch(x, lay["w"], None, stride=stride, dilation=dilation,
                       groups=groups)
    y, _ = norm.apply(lay["bn"], st, y, train=False, eps=eps)
    return act(y) if act is not None else y


class MobileNetV3:
    """LR-ASPP MobileNetV3-Large with 3-channel classifier heads
    (ThirdPartyNets.py:171-179). Eval-mode (pretrained-inference) forward."""

    name = "MobileNetV3"
    kind = "generator"

    @staticmethod
    def init(key, n_classes: int = 3, **_ignored) -> Tuple[Dict, Dict]:
        keys = iter(jax.random.split(key, 128))
        backbone: List[Dict] = []
        bstate: List[Dict] = []
        lay, st = _init_cbn(next(keys), 3, 3, 16)
        backbone.append(lay)
        bstate.append({"bn": st})
        cin = 16
        for k, exp, cout, use_se, _act, _s, _d in _LARGE_DILATED:
            blk: Dict = {}
            bst: Dict = {}
            if exp != cin:
                blk["expand"], bst["expand"] = _init_cbn(next(keys), 1, cin, exp)
            blk["dw"], bst["dw"] = _init_cbn(next(keys), k, exp, exp, groups=exp)
            if use_se:
                sq = make_divisible(exp // 4, 8)
                blk["se"] = {"fc1": _init_c(next(keys), 1, exp, sq),
                             "fc2": _init_c(next(keys), 1, sq, exp)}
            blk["project"], bst["project"] = _init_cbn(next(keys), 1, exp, cout)
            backbone.append(blk)
            bstate.append(bst)
            cin = cout
        lay, st = _init_cbn(next(keys), 1, cin, 6 * cin)
        backbone.append(lay)
        bstate.append({"bn": st})

        cbr, cbr_st = _init_cbn(next(keys), 1, 960, 128)
        params = {
            "backbone": backbone,
            "classifier": {
                "cbr": cbr,
                "scale": {"w": _fan_in_init(next(keys), (1, 1, 960, 128), 960)},
                "low_classifier": _init_c(next(keys), 1, 40, n_classes),
                "high_classifier": _init_c(next(keys), 1, 128, n_classes),
            },
        }
        state = {"backbone": bstate, "classifier": {"cbr": cbr_st}}
        return params, state

    @staticmethod
    def apply(params: Dict, x: jnp.ndarray, state: Dict, train: bool = False,
              **_ignored) -> Tuple[jnp.ndarray, Dict]:
        if train:
            raise NotImplementedError(
                "MobileNetV3 is ported at upstream's support level: "
                "pretrained-inference only (eval-mode BatchNorm)")
        bb, bs = params["backbone"], state["backbone"]
        t = _cbn(bb[0], bs[0]["bn"], x, stride=2, act=_hs)
        low = None
        for i, (k, exp, cout, use_se, actname, s, d) in enumerate(_LARGE_DILATED):
            blk, bst = bb[i + 1], bs[i + 1]
            act = _ACT[actname]
            stride = 1 if d > 1 else s
            cin = t.shape[-1]
            r = t
            if "expand" in blk:
                t = _cbn(blk["expand"], bst["expand"], t, act=act)
            t = _cbn(blk["dw"], bst["dw"], t, stride=stride, dilation=d,
                     groups=t.shape[-1], act=act)
            if "se" in blk:
                se = blk["se"]
                a = jnp.mean(t, axis=(1, 2), keepdims=True)
                a = jax.nn.relu(C.conv2d(a, se["fc1"]["w"], se["fc1"]["b"], "VALID"))
                a = _hsig(C.conv2d(a, se["fc2"]["w"], se["fc2"]["b"], "VALID"))
                t = t * a
            t = _cbn(blk["project"], bst["project"], t)
            if stride == 1 and cin == cout:
                t = t + r
            if i + 1 == _LOW_TAP:
                low = t
        high = _cbn(bb[-1], bs[-1]["bn"], t, act=_hs)

        cl, cs = params["classifier"], state["classifier"]
        h = _cbn(cl["cbr"], cs["cbr"], high, act=jax.nn.relu, eps=_BN_EPS_HEAD)
        s_ = jnp.mean(high, axis=(1, 2), keepdims=True)
        s_ = jax.nn.sigmoid(C.conv2d(s_, cl["scale"]["w"], None, "VALID"))
        h = h * s_
        h = jax.image.resize(h, (h.shape[0], low.shape[1], low.shape[2],
                                 h.shape[3]), method="linear")
        out = (C.conv2d(low, cl["low_classifier"]["w"],
                        cl["low_classifier"]["b"], "VALID")
               + C.conv2d(h, cl["high_classifier"]["w"],
                          cl["high_classifier"]["b"], "VALID"))
        out = jax.image.resize(out, (out.shape[0], x.shape[1], x.shape[2],
                                     out.shape[3]), method="linear")
        return out, state


class deeplabv3_resnet101:
    """ThirdPartyNets.py:181-187 — DeepLabV3-ResNet101 with
    aux_classifier[4] replaced by Conv2d(256,3,1). Upstream's forward
    literally raises NotImplementedError; this stub mirrors that honestly."""

    name = "deeplabv3_resnet101"
    kind = "generator"

    @classmethod
    def init(cls, key, **_ignored):
        raise NotImplementedError(
            "deeplabv3_resnet101 is unimplemented upstream too "
            "(ThirdPartyNets.py:186-187 raises NotImplementedError); kept as "
            "an honest stub.")

    @classmethod
    def apply(cls, params, x, *a, **k):
        raise NotImplementedError(cls.name)
