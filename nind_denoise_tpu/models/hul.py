"""Hul discriminator family (cGAN critics), functional JAX, NHWC.

Parity with /root/reference/src/nind_denoise/networks/Hul.py:

* ``Hul112Disc`` (Hul.py:254-417) — the default ``d_network``
  (nn_common.py:278): dual standard+dilated conv branches with dense concat
  skips, PReLU(init=0.01) activations *before* BatchNorm, two stride-3
  downsampling convs (112 -> 34 -> 6 receptive plan), and a ``decide`` head
  (2x2 conv -> 1x1 conv -> scalar map), optional final AdaptiveMaxPool.
* ``Hulb112Disc`` (Hul.py:663-802) — identical channel plan without BN.
* ``Hull112Disc`` (Hul.py:806-968) — LeakyReLU instead of PReLU.
* ``Hulf112Disc`` (Hul.py:972-1134) — 6-channel conditional, wider plan.

The architecture is expressed here as a declarative channel-plan table; the
wiring (which is identical across variants) is interpreted by ``_apply``.
Conditional discriminators receive noisy⊕generated / noisy⊕clean 6-channel
inputs (nn_common.py:316-330).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import conv as C
from . import norm

# conv spec: (cin_mult, cout_mult, kernel, dilation, stride, bias, bn)
# cin_mult None means "input_channels" (the raw input).
Spec = Tuple[Optional[int], int, int, int, int, bool, bool]

# Shared wiring: (block_name, source) where source is 'x' (raw input) or
# 'prev'; concat pairs are expressed in _apply.
_STD_PLAN: Dict[str, List[Spec]] = {   # Hul112 / Hulb112 / Hull112
    "enc112to108std": [(None, 2, 3, 1, 1, True, False), (2, 2, 3, 1, 1, True, False)],
    "enc112to108dil": [(None, 2, 3, 2, 1, True, False)],
    "enc108to104std": [(4, 2, 3, 1, 1, False, True), (2, 2, 3, 1, 1, False, True)],
    "enc108to104dil": [(4, 2, 3, 2, 1, False, True)],
    "enc104to102std": [(4, 4, 3, 1, 1, False, True)],
    "enc112to102dil": [(None, 2, 3, 5, 1, False, True)],
    "enc102to34str": [(6, 6, 3, 1, 3, False, True)],
    "enc34to30std": [(6, 4, 3, 1, 1, False, True), (4, 4, 3, 1, 1, False, True)],
    "enc34to30dil": [(6, 4, 3, 2, 1, False, True)],
    "enc30to26std": [(8, 4, 3, 1, 1, False, True), (4, 4, 3, 1, 1, False, True)],
    "enc30to26dil": [(8, 4, 3, 2, 1, False, True)],
    "enc26to22std": [(8, 4, 3, 1, 1, False, True), (4, 4, 3, 1, 1, False, True)],
    "enc26to22dil": [(8, 4, 3, 2, 1, False, True)],
    "enc22to18std": [(8, 4, 3, 1, 1, False, True), (4, 4, 3, 1, 1, False, True)],
    "enc22to18dil": [(8, 4, 3, 2, 1, False, True)],
    "enc18to6str": [(8, 8, 3, 1, 3, False, True)],
    "enc6to2std": [(8, 6, 3, 1, 1, False, True), (6, 3, 3, 1, 1, False, False)],
    "enc6to2dil": [(8, 3, 3, 2, 1, False, False)],
    "decide": [(6, 1, 2, 1, 1, True, False), (1, 0, 1, 1, 1, True, False)],
}

_WIDE_PLAN: Dict[str, List[Spec]] = {  # Hulf112
    "enc112to108std": [(None, 2, 3, 1, 1, True, False), (2, 2, 3, 1, 1, True, False)],
    "enc112to108dil": [(None, 2, 3, 2, 1, True, False)],
    "enc108to104std": [(4, 4, 3, 1, 1, False, True), (4, 4, 3, 1, 1, False, True)],
    "enc108to104dil": [(4, 4, 3, 2, 1, False, True)],
    "enc104to102std": [(8, 8, 3, 1, 1, False, True)],
    "enc112to102dil": [(None, 2, 3, 5, 1, False, True)],
    "enc102to34str": [(10, 10, 3, 1, 3, False, True)],
    "enc34to30std": [(10, 10, 3, 1, 1, False, True), (10, 10, 3, 1, 1, False, True)],
    "enc34to30dil": [(10, 10, 3, 2, 1, False, True)],
    "enc30to26std": [(20, 20, 3, 1, 1, False, True), (20, 10, 3, 1, 1, False, True)],
    "enc30to26dil": [(20, 10, 3, 2, 1, False, True)],
    "enc26to22std": [(20, 20, 3, 1, 1, False, True), (20, 10, 3, 1, 1, False, True)],
    "enc26to22dil": [(20, 10, 3, 2, 1, False, True)],
    "enc22to18std": [(20, 20, 3, 1, 1, False, True), (20, 12, 3, 1, 1, False, True)],
    "enc22to18dil": [(20, 12, 3, 2, 1, False, True)],
    "enc18to6str": [(24, 24, 3, 1, 3, False, True)],
    "enc6to2std": [(24, 24, 3, 1, 1, False, True), (24, 12, 3, 1, 1, False, False)],
    "enc6to2dil": [(24, 12, 3, 2, 1, False, False)],
    "decide": [(24, 6, 2, 1, 1, True, False), (6, 0, 1, 1, 1, True, False)],
}


def _conv_dilated(x, w, b, dilation: int, stride: int):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding="VALID",
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _act(x, name: str, a):
    if name == "PReLU":
        return C.prelu(x, a)
    return jax.nn.leaky_relu(x, 0.01)  # torch LeakyReLU() default slope


class _HulBase:
    plan: Dict[str, List[Spec]] = _STD_PLAN
    use_bn = True
    activation = "PReLU"
    default_in = 3
    kind = "discriminator"

    @classmethod
    def init(cls, key, input_channels: Optional[int] = None, funit: int = 32,
             out_activation: str = "PReLU", **_ignored) -> Tuple[Dict, Dict]:
        cin_raw = cls.default_in if input_channels is None else int(input_channels)
        params: Dict = {}
        state: Dict = {}
        keys = jax.random.split(key, 64)
        ki = iter(keys)
        for bname, specs in cls.plan.items():
            bp, bs = [], []
            for (cin_m, cout_m, k, dil, stride, bias, bn) in specs:
                cin = cin_raw if cin_m is None else cin_m * funit
                cout = max(1, cout_m * funit) if cout_m else 1
                fan_in = cin * k * k
                bound = 1.0 / math.sqrt(fan_in)
                kw, kb = jax.random.split(next(ki))
                layer = {"w": jax.random.uniform(kw, (k, k, cin, cout), jnp.float32,
                                                 -bound, bound)}
                if bias:
                    layer["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
                if cls.activation == "PReLU":
                    layer["a"] = jnp.full((), 0.01, jnp.float32)
                if bn and cls.use_bn:
                    layer["bn"], st = norm.init(cout)
                    bs.append(st)
                else:
                    bs.append(None)
                bp.append(layer)
            params[bname] = bp
            state[bname] = bs
        if out_activation == "PReLU":
            params["_out_a"] = jnp.full((), 0.01, jnp.float32)
        return params, state

    @classmethod
    def _block(cls, params, state, bname, x, train, is_decide=False):
        new_states = []
        n_layers = len(params[bname])
        for li, layer in enumerate(params[bname]):
            dil, stride = 1, 1
            spec = cls.plan[bname][li]
            _, _, k, dil, stride, _, _ = spec
            x = _conv_dilated(x, layer["w"], layer.get("b"), dil, stride)
            last_decide = is_decide and li == n_layers - 1
            if not last_decide:
                x = _act(x, cls.activation, layer.get("a"))
            if layer.get("bn") is not None:
                x, st = norm.apply(layer["bn"], state[bname][li], x, train)
                new_states.append(st)
            else:
                new_states.append(None)
        return x, new_states

    @classmethod
    def apply(cls, params: Dict, x: jnp.ndarray, state: Dict, train: bool = False,
              out_activation: str = "PReLU", **_ignored):
        """x: NHWC (112x112 crops canonically). Returns (pred, new_state).
        ``out_activation`` must match what init was given (static)."""
        ns: Dict = {}
        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        s1, ns["enc112to108std"] = cls._block(params, state, "enc112to108std", x, train)
        d1, ns["enc112to108dil"] = cls._block(params, state, "enc112to108dil", x, train)
        layer = cat(s1, d1)
        s2, ns["enc108to104std"] = cls._block(params, state, "enc108to104std", layer, train)
        d2, ns["enc108to104dil"] = cls._block(params, state, "enc108to104dil", layer, train)
        layer = cat(s2, d2)
        s3, ns["enc104to102std"] = cls._block(params, state, "enc104to102std", layer, train)
        d3, ns["enc112to102dil"] = cls._block(params, state, "enc112to102dil", x, train)
        layer = cat(s3, d3)
        layer, ns["enc102to34str"] = cls._block(params, state, "enc102to34str", layer, train)
        for lvl in ("34to30", "30to26", "26to22", "22to18"):
            s, ns[f"enc{lvl}std"] = cls._block(params, state, f"enc{lvl}std", layer, train)
            d, ns[f"enc{lvl}dil"] = cls._block(params, state, f"enc{lvl}dil", layer, train)
            layer = cat(s, d)
        layer, ns["enc18to6str"] = cls._block(params, state, "enc18to6str", layer, train)
        s, ns["enc6to2std"] = cls._block(params, state, "enc6to2std", layer, train)
        d, ns["enc6to2dil"] = cls._block(params, state, "enc6to2dil", layer, train)
        layer = cat(s, d)
        layer, ns["decide"] = cls._block(params, state, "decide", layer, train, is_decide=True)
        if out_activation == "PReLU":
            layer = C.prelu(layer, params["_out_a"])
        elif out_activation == "Sigmoid":
            layer = jax.nn.sigmoid(layer)
        elif out_activation == "LeakyReLU":
            layer = jax.nn.leaky_relu(layer, 0.01)
        return layer, ns


class Hul112Disc(_HulBase):
    name = "Hul112Disc"


class Hulb112Disc(_HulBase):
    name = "Hulb112Disc"
    use_bn = False


class Hull112Disc(_HulBase):
    name = "Hull112Disc"
    activation = "LeakyReLU"


class Hulf112Disc(_HulBase):
    name = "Hulf112Disc"
    plan = _WIDE_PLAN
    default_in = 6
