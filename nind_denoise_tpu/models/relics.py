"""Legacy relic network zoo (functional JAX, NHWC).

Parity with /root/reference/src/nind_denoise/networks/relics.py — the
historical architecture zoo: RedishCNN (:4-39), HunkyDisc (:43-96),
HunNet (:98-429), HuNet (:432-763), HuDisc (:765-928), Hul144Disc
(:931-1066), Hul128Net (:1070-1334), Hul160Net (:1338-1606, alias
``HulNet`` :1608), HunkyNet (:1610-1759).

NOTE: the reference file only imports ``torch.nn`` (relics.py:1) — every
``forward`` that calls ``torch.cat`` or ``floor`` raises ``NameError`` at
runtime, i.e. the upstream zoo is *non-runnable* dead code. The intended
architectures are nonetheless unambiguous from the module definitions; this
port implements them faithfully (tests build repaired torch twins with the
missing imports fixed and verify numerics layer-for-layer).

All nets are expressed in one declarative block grammar interpreted by
``_block``:

* layer spec ``(op, cin, cout, bias, post)`` where ``op`` encodes the
  primitive (``c3``/``c2``/``c5`` valid convs; ``c3d2``/``c3d5`` dilated;
  ``c3s3``/``c2s2`` strided; ``t3``/``t5`` k-size transposed convs
  pre-lowered to FULL-padded convs; ``t3d2``/``t3s3`` dilated/strided
  tconvs; ``t2s2`` the matmul+pixel-shuffle up-conv; ``pre`` a conv-less
  BN+act prefix), channels are funit multiples (``"in"`` = raw input
  channels, ``("A", n)`` = absolute), and ``post`` orders the tail:
  ``a`` act, ``ab`` act→BN, ``ba`` BN→act, ``sig``/``relu`` head.
* three wiring graphs: ``_hu_apply`` (HunNet/HuNet/Hul160Net 160-px
  dual-branch U, HuDisc = its encoder), ``Hul128Net.apply`` (128-px dense
  U), and explicit Hunky/Redish forwards.

Transposed convolutions are stored pre-lowered to plain-conv kernels
(flipped HWIO / matmul form) so every op is one MXU-friendly
``lax.conv_general_dilated`` — see ops/conv.py and models/torch_import.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops import conv as C
from . import norm

Chan = Union[int, str, Tuple[str, int]]
Spec = Tuple[str, Chan, Chan, bool, str]

_K = {"c3": 3, "c2": 2, "c5": 5, "c3d2": 3, "c3d5": 3, "c3s3": 3, "c2s2": 2,
      "t3": 3, "t5": 5, "t3d2": 3, "t3s3": 3, "t2s2": 2, "pre": 0}

# torch nn.RReLU() eval-mode slope = (lower + upper) / 2 = (1/8 + 1/3) / 2
RRELU_EVAL_SLOPE = (1.0 / 8 + 1.0 / 3) / 2


def _resolve(c: Chan, funit: int, cin_raw: int) -> int:
    if c == "in":
        return cin_raw
    if isinstance(c, tuple):
        return int(c[1])
    return int(c) * funit


def _apply_op(x, op: str, lay: Dict):
    w, b = lay.get("w"), lay.get("b")
    if op in ("c3", "c2", "c5"):
        return C.conv2d(x, w, b)
    if op == "c3d2":
        return C.conv2d_dilated(x, w, b, 2)
    if op == "c3d5":
        return C.conv2d_dilated(x, w, b, 5)
    if op == "c3s3":
        return C.conv2d(x, w, b, stride=3)
    if op == "c2s2":
        return C.conv2d(x, w, b, stride=2)
    if op in ("t3", "t5"):
        return C.conv2d(x, w, b, padding="FULL")
    if op == "t3d2":
        return C.tconv2d_k3s1_dil(x, w, b, 2)
    if op == "t3s3":
        return C.tconv2d_k3s3(x, w, b)
    if op == "t2s2":
        return C.upconv2x(x, w, b)
    raise ValueError(op)


def _act(x, name: str, a):
    if name == "ReLU":
        return jax.nn.relu(x)
    if name == "PReLU":
        return C.prelu(x, a)
    if name == "RReLU":
        return jax.nn.leaky_relu(x, RRELU_EVAL_SLOPE)
    raise ValueError(name)


class _RelicBase:
    """Shared init/block interpreter. Subclasses set ``plan`` (block name ->
    layer specs), ``act`` + ``prelu_init``, ``default_in``, ``funit``."""

    plan: Dict[str, List[Spec]] = {}
    act = "ReLU"
    prelu_init = 0.25
    default_in = 3
    funit = 32
    kind = "generator"

    @classmethod
    def init(cls, key, funit: Optional[int] = None,
             input_channels: Optional[int] = None, **_ignored):
        """Returns (params, state). ``state`` holds BN running stats (may be
        empty for BN-free nets but is always returned for a uniform API)."""
        funit = cls.funit if funit is None else int(funit)
        cin_raw = cls.default_in if input_channels is None else int(input_channels)
        params: Dict = {}
        state: Dict = {}
        nkeys = sum(len(v) for v in cls.plan.values())
        keys = iter(jax.random.split(key, max(nkeys, 1)))
        for bname, specs in cls.plan.items():
            bp, bs = [], []
            for (op, cin_c, cout_c, bias, post) in specs:
                cin = _resolve(cin_c, funit, cin_raw)
                cout = _resolve(cout_c, funit, cin_raw)
                lay: Dict = {}
                k = _K[op]
                if op != "pre":
                    fan_in = cin * k * k
                    bound = 1.0 / math.sqrt(fan_in)
                    kw, kb = jax.random.split(next(keys))
                    if op == "t2s2":
                        lay["w"] = jax.random.uniform(
                            kw, (cin, 4 * cout), jnp.float32, -bound, bound)
                    else:
                        lay["w"] = jax.random.uniform(
                            kw, (k, k, cin, cout), jnp.float32, -bound, bound)
                    if bias:
                        lay["b"] = jax.random.uniform(
                            kb, (cout,), jnp.float32, -bound, bound)
                if cls.act == "PReLU" and ("a" in post):
                    lay["a"] = jnp.full((), cls.prelu_init, jnp.float32)
                if "b" in post and post in ("ab", "ba"):
                    bn_c = cout if op != "pre" else cin
                    lay["bn"], st = norm.init(bn_c)
                    bs.append(st)
                else:
                    bs.append(None)
                bp.append(lay)
            params[bname] = bp
            state[bname] = bs
        return params, state

    @classmethod
    def _block(cls, params, state, bname, x, train):
        """Run one Sequential block. Returns (y, new_bn_state_list)."""
        new_states = []
        for li, lay in enumerate(params[bname]):
            op, _, _, _, post = cls.plan[bname][li]
            if op != "pre":
                x = _apply_op(x, op, lay)
            if post == "a":
                x = _act(x, cls.act, lay.get("a"))
            elif post == "ab":
                x = _act(x, cls.act, lay.get("a"))
                x, st = norm.apply(lay["bn"], state[bname][li], x, train)
                new_states.append(st)
                continue
            elif post == "ba":
                x, st = norm.apply(lay["bn"], state[bname][li], x, train)
                x = _act(x, cls.act, lay.get("a"))
                new_states.append(st)
                continue
            elif post == "sig":
                x = jax.nn.sigmoid(x)
            elif post == "relu":
                x = jax.nn.relu(x)
            new_states.append(None)
        return x, new_states


def _dual(c: str, tail: str, cin1, mid, cin_d=None) -> List[Spec]:
    """std double-conv block: two convs cin1->mid->mid."""
    return [(c, cin1, mid, False, tail), (c, mid, mid, False, tail)]


# ---------------------------------------------------------------------------
# HunNet / HuNet / Hul160Net / HuDisc — the 160-px dual-branch family.
# Identical forward graph (relics.py:337-429, :671-763, :1570-1606; HuDisc
# :878-928 is the encoder alone); they differ only in channel plan,
# activation, and BN placement.
# ---------------------------------------------------------------------------

def _hu_encode(cls, params, state, x, train):
    """Shared encoder. Returns (levels dict for skips, new_state)."""
    ns: Dict = {}
    cat = lambda *t: jnp.concatenate(t, axis=-1)
    B = lambda n, t: cls._block(params, state, n, t, train)

    l158, ns["enc160to158std"] = B("enc160to158std", x)
    s, ns["enc158to154std"] = B("enc158to154std", l158)
    d, ns["enc158to154dil"] = B("enc158to154dil", l158)
    l154 = cat(s, d)
    s, ns["enc154to150std"] = B("enc154to150std", l154)
    d, ns["enc154to150dil"] = B("enc154to150dil", l154)
    d5, ns["enc160to150dil"] = B("enc160to150dil", x)
    l150 = cat(s, d, d5)
    l50, ns["enc150to50str"] = B("enc150to50str", l150)
    s, ns["enc50to46std"] = B("enc50to46std", l50)
    d, ns["enc50to46dil"] = B("enc50to46dil", l50)
    l46 = cat(s, d)
    s, ns["enc46to42std"] = B("enc46to42std", l46)
    d, ns["enc46to42dil"] = B("enc46to42dil", l46)
    l42 = cat(s, d)
    l14, ns["enc42to14str"] = B("enc42to14str", l42)
    s, ns["enc14to10std"] = B("enc14to10std", l14)
    d, ns["enc14to10dil"] = B("enc14to10dil", l14)
    l10 = cat(s, d)
    s, ns["enc10to6std"] = B("enc10to6std", l10)
    d, ns["enc10to6dil"] = B("enc10to6dil", l10)
    l6 = cat(s, d)
    l3, ns["enc6to3str"] = B("enc6to3str", l6)
    levels = {"l158": l158, "l154": l154, "l150": l150, "l50": l50,
              "l46": l46, "l42": l42, "l14": l14, "l10": l10, "l6": l6,
              "l3": l3}
    return levels, ns


def _hu_apply(cls, params, x, state, train):
    """Full generator graph (encoder + skip-concat decoder)."""
    lv, ns = _hu_encode(cls, params, state, x, train)
    cat = lambda *t: jnp.concatenate(t, axis=-1)
    B = lambda n, t: cls._block(params, state, n, t, train)

    l1, ns["enc3to1std"] = B("enc3to1std", lv["l3"])
    u, ns["dec1to3std"] = B("dec1to3std", l1)
    l3 = cat(lv["l3"], u)
    u, ns["dec3to6str"] = B("dec3to6str", l3)
    l6 = cat(lv["l6"], u)
    s, ns["dec6to10std"] = B("dec6to10std", l6)
    d, ns["dec6to10dil"] = B("dec6to10dil", l6)
    l10 = cat(lv["l10"], s, d)
    s, ns["dec10to14std"] = B("dec10to14std", l10)
    d, ns["dec10to14dil"] = B("dec10to14dil", l10)
    l14 = cat(lv["l14"], s, d)
    u, ns["dec14to42str"] = B("dec14to42str", l14)
    l42 = cat(lv["l42"], u)
    s, ns["dec42to46std"] = B("dec42to46std", l42)
    d, ns["dec42to46dil"] = B("dec42to46dil", l42)
    l46 = cat(lv["l46"], s, d)
    s, ns["dec46to50std"] = B("dec46to50std", l46)
    d, ns["dec46to50dil"] = B("dec46to50dil", l46)
    l50 = cat(lv["l50"], s, d)
    u, ns["dec50to150str"] = B("dec50to150str", l50)
    l150 = cat(lv["l150"], u)
    s, ns["dec150to154std"] = B("dec150to154std", l150)
    d, ns["dec150to154dil"] = B("dec150to154dil", l150)
    l154 = cat(lv["l154"], s, d)
    s, ns["dec154to158std"] = B("dec154to158std", l154)
    d, ns["dec154to158dil"] = B("dec154to158dil", l154)
    l158 = cat(lv["l158"], s, d)
    y, ns["dec158to160std"] = B("dec158to160std", l158)
    return y, ns


class HunNet(_RelicBase):
    """relics.py:98-429 — ReLU + Conv->BN->ReLU blocks, Sigmoid head."""

    name = "HunNet"
    act = "ReLU"
    plan: Dict[str, List[Spec]] = {
        "enc160to158std": [("c3", "in", 4, True, "a")],
        "enc158to154std": _dual("c3", "ba", 4, 3),
        "enc154to150std": _dual("c3", "ba", 6, 4),
        "enc158to154dil": [("c3d2", 4, 3, False, "ba")],
        "enc154to150dil": [("c3d2", 6, 4, False, "ba")],
        "enc160to150dil": [("c3d5", "in", 2, False, "ba")],
        "enc150to50str": [("c3s3", 10, 10, False, "ba")],
        "enc50to46std": _dual("c3", "ba", 10, 5),
        "enc46to42std": _dual("c3", "ba", 10, 8),
        "enc50to46dil": [("c3d2", 10, 5, False, "ba")],
        "enc46to42dil": [("c3d2", 10, 8, False, "ba")],
        "enc42to14str": [("c3s3", 16, 16, False, "ba")],
        "enc14to10std": _dual("c3", "ba", 16, 8),
        "enc10to6std": _dual("c3", "ba", 16, 16),
        "enc14to10dil": [("c3d2", 16, 8, False, "ba")],
        "enc10to6dil": [("c3d2", 16, 16, False, "ba")],
        "enc6to3str": [("c2s2", 32, 32, False, "ba")],
        "enc3to1std": [("c3", 32, 32, False, "ba")],
        "dec1to3std": [("t3", 32, 32, False, "ba")],
        "dec3to6str": [("t2s2", 64, 32, False, "ba")],
        "dec6to10std": [("t3", 64, 8, False, "ba"), ("t3", 8, 8, False, "ba")],
        "dec6to10dil": [("t3d2", 64, 8, False, "ba")],
        "dec10to14std": [("t3", 32, 8, False, "ba"), ("t3", 8, 8, False, "ba")],
        "dec10to14dil": [("t3d2", 32, 8, False, "ba")],
        "dec14to42str": [("t3s3", 32, 16, False, "ba")],
        "dec42to46std": [("t3", 32, 5, False, "ba"), ("t3", 5, 5, False, "ba")],
        "dec42to46dil": [("t3d2", 32, 5, False, "ba")],
        "dec46to50std": [("t3", 20, 5, False, "ba"), ("t3", 5, 5, False, "ba")],
        "dec46to50dil": [("t3d2", 20, 5, False, "ba")],
        "dec50to150str": [("t3s3", 20, 10, False, "ba")],
        "dec150to154std": [("t3", 20, 3, False, "ba"), ("t3", 3, 3, False, "ba")],
        "dec150to154dil": [("t3d2", 20, 3, False, "ba")],
        "dec154to158std": [("t3", 12, 2, False, "ba"), ("t3", 2, 2, False, "ba")],
        "dec154to158dil": [("t3d2", 12, 2, False, "ba")],
        "dec158to160std": [("t3", 8, ("A", 3), True, "sig")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        return _hu_apply(cls, params, x, state, train)


class HuNet(_RelicBase):
    """relics.py:432-763 — PReLU (torch default init 0.25), all BN commented
    out upstream, ReLU head."""

    name = "HuNet"
    act = "PReLU"
    prelu_init = 0.25
    plan: Dict[str, List[Spec]] = {
        "enc160to158std": [("c3", "in", 2, True, "a")],
        "enc158to154std": _dual("c3", "a", 2, 2),
        "enc154to150std": _dual("c3", "a", 4, 3),
        "enc158to154dil": [("c3d2", 2, 2, False, "a")],
        "enc154to150dil": [("c3d2", 4, 3, False, "a")],
        "enc160to150dil": [("c3d5", "in", 2, False, "a")],
        "enc150to50str": [("c3s3", 8, 2, False, "a")],
        "enc50to46std": _dual("c3", "a", 2, 2),
        "enc46to42std": _dual("c3", "a", 4, 2),
        "enc50to46dil": [("c3d2", 2, 2, False, "a")],
        "enc46to42dil": [("c3d2", 4, 2, False, "a")],
        "enc42to14str": [("c3s3", 4, 2, False, "a")],
        "enc14to10std": _dual("c3", "a", 2, 2),
        "enc10to6std": _dual("c3", "a", 4, 2),
        "enc14to10dil": [("c3d2", 2, 2, False, "a")],
        "enc10to6dil": [("c3d2", 4, 2, False, "a")],
        "enc6to3str": [("c2s2", 4, 2, False, "a")],
        "enc3to1std": [("c3", 2, 2, False, "a")],
        "dec1to3std": [("t3", 2, 2, False, "a")],
        "dec3to6str": [("t2s2", 4, 2, False, "a")],
        "dec6to10std": [("t3", 6, 2, False, "a"), ("t3", 2, 2, False, "a")],
        "dec6to10dil": [("t3d2", 6, 2, False, "a")],
        "dec10to14std": [("t3", 8, 2, False, "a"), ("t3", 2, 2, False, "a")],
        "dec10to14dil": [("t3d2", 8, 2, False, "a")],
        "dec14to42str": [("t3s3", 6, 2, False, "a")],
        "dec42to46std": [("t3", 6, 2, False, "a"), ("t3", 2, 2, False, "a")],
        "dec42to46dil": [("t3d2", 6, 2, False, "a")],
        "dec46to50std": [("t3", 8, 2, False, "a"), ("t3", 2, 2, False, "a")],
        "dec46to50dil": [("t3d2", 8, 2, False, "a")],
        "dec50to150str": [("t3s3", 6, 4, False, "a")],
        "dec150to154std": [("t3", 12, 3, False, "a"), ("t3", 3, 3, False, "a")],
        "dec150to154dil": [("t3d2", 12, 3, False, "a")],
        "dec154to158std": [("t3", 10, 2, False, "a"), ("t3", 2, 2, False, "a")],
        "dec154to158dil": [("t3d2", 10, 2, False, "a")],
        "dec158to160std": [("t3", 6, ("A", 3), True, "relu")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        return _hu_apply(cls, params, x, state, train)


class Hul160Net(_RelicBase):
    """relics.py:1338-1606 (alias ``HulNet`` :1608) — PReLU(0.01) + BN
    (Conv->PReLU->BN), BN-free stem/tail, ReLU head."""

    name = "Hul160Net"
    act = "PReLU"
    prelu_init = 0.01
    plan: Dict[str, List[Spec]] = {
        "enc160to158std": [("c3", "in", 2, True, "a")],
        "enc158to154std": _dual("c3", "a", 2, 2),
        "enc154to150std": _dual("c3", "ab", 4, 3),
        "enc158to154dil": [("c3d2", 2, 2, False, "ab")],
        "enc154to150dil": [("c3d2", 4, 3, False, "ab")],
        "enc160to150dil": [("c3d5", "in", 2, False, "a")],
        "enc150to50str": [("c3s3", 8, 2, False, "ab")],
        "enc50to46std": _dual("c3", "ab", 2, 2),
        "enc46to42std": _dual("c3", "ab", 4, 2),
        "enc50to46dil": [("c3d2", 2, 2, False, "ab")],
        "enc46to42dil": [("c3d2", 4, 2, False, "ab")],
        "enc42to14str": [("c3s3", 4, 2, False, "ab")],
        "enc14to10std": _dual("c3", "ab", 2, 2),
        "enc10to6std": _dual("c3", "ab", 4, 2),
        "enc14to10dil": [("c3d2", 2, 2, False, "ab")],
        "enc10to6dil": [("c3d2", 4, 2, False, "ab")],
        "enc6to3str": [("c2s2", 4, 2, False, "ab")],
        "enc3to1std": [("c3", 2, 2, False, "ab")],
        "dec1to3std": [("t3", 2, 2, False, "ab")],
        "dec3to6str": [("t2s2", 4, 2, False, "ab")],
        "dec6to10std": [("t3", 6, 2, False, "ab"), ("t3", 2, 2, False, "ab")],
        "dec6to10dil": [("t3d2", 6, 2, False, "ab")],
        "dec10to14std": [("t3", 8, 2, False, "ab"), ("t3", 2, 2, False, "ab")],
        "dec10to14dil": [("t3d2", 8, 2, False, "ab")],
        "dec14to42str": [("t3s3", 6, 2, False, "ab")],
        "dec42to46std": [("t3", 6, 2, False, "ab"), ("t3", 2, 2, False, "ab")],
        "dec42to46dil": [("t3d2", 6, 2, False, "ab")],
        "dec46to50std": [("t3", 8, 2, False, "ab"), ("t3", 2, 2, False, "ab")],
        "dec46to50dil": [("t3d2", 8, 2, False, "ab")],
        "dec50to150str": [("t3s3", 6, 4, False, "ab")],
        "dec150to154std": [("t3", 12, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec150to154dil": [("t3d2", 12, 3, False, "ab")],
        "dec154to158std": [("t3", 10, 2, False, "a"), ("t3", 2, 2, False, "a")],
        "dec154to158dil": [("t3d2", 10, 2, False, "a")],
        "dec158to160std": [("t3", 6, ("A", 3), True, "relu")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        return _hu_apply(cls, params, x, state, train)


class HuDisc(_RelicBase):
    """relics.py:765-928 — ReLU + BN discriminator: the 160-px encoder alone
    with a Sigmoid 1-channel head."""

    name = "HuDisc"
    act = "ReLU"
    kind = "discriminator"
    plan: Dict[str, List[Spec]] = {
        "enc160to158std": [("c3", "in", 2, True, "a")],
        "enc158to154std": _dual("c3", "ba", 2, 2),
        "enc154to150std": _dual("c3", "ba", 4, 3),
        "enc158to154dil": [("c3d2", 2, 2, False, "ba")],
        "enc154to150dil": [("c3d2", 4, 3, False, "ba")],
        "enc160to150dil": [("c3d5", "in", 2, False, "ba")],
        "enc150to50str": [("c3s3", 8, 2, False, "ba")],
        "enc50to46std": _dual("c3", "ba", 2, 2),
        "enc46to42std": _dual("c3", "ba", 4, 2),
        "enc50to46dil": [("c3d2", 2, 2, False, "ba")],
        "enc46to42dil": [("c3d2", 4, 2, False, "ba")],
        "enc42to14str": [("c3s3", 4, 2, False, "ba")],
        "enc14to10std": _dual("c3", "ba", 2, 2),
        "enc10to6std": _dual("c3", "ba", 4, 2),
        "enc14to10dil": [("c3d2", 2, 2, False, "ba")],
        "enc10to6dil": [("c3d2", 4, 2, False, "ba")],
        "enc6to3str": [("c2s2", 4, 2, False, "ba")],
        "enc3to1std": [("c3", 2, ("A", 1), True, "sig")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        lv, ns = _hu_encode(cls, params, state, x, train)
        y, ns["enc3to1std"] = cls._block(params, state, "enc3to1std",
                                         lv["l3"], train)
        return y, ns


class Hul128Net(_RelicBase):
    """relics.py:1070-1334 — 128-px PReLU(0.01)+BN dense-concat generator
    (the BN-ful precursor of Hul.py's Hulb128Net), ReLU head."""

    name = "Hul128Net"
    act = "PReLU"
    prelu_init = 0.01
    plan: Dict[str, List[Spec]] = {
        "enc128to126std": [("c3", "in", 2, True, "a")],
        "enc126to122std": _dual("c3", "a", 2, 2),
        "enc122to118std": _dual("c3", "ab", 4, 2),
        "enc126to122dil": [("c3d2", 2, 2, False, "ab")],
        "enc122to118dil": [("c3d2", 4, 2, False, "ab")],
        "enc128to118dil": [("c3d5", "in", 2, False, "a")],
        "enc118to114std": _dual("c3", "ab", 6, 2),
        "enc118to114dil": [("c3d2", 6, 2, False, "ab")],
        "enc114to38str": [("c3s3", 4, 4, False, "ab")],
        "enc38to34std": _dual("c3", "ab", 4, 2),
        "enc34to30std": _dual("c3", "ab", 4, 2),
        "enc38to34dil": [("c3d2", 4, 2, False, "ab")],
        "enc34to30dil": [("c3d2", 4, 2, False, "ab")],
        "enc30to10str": [("c3s3", 4, 4, False, "ab")],
        "enc10to6std": [("c3", 4, 3, False, "ab"), ("c3", 3, 3, False, "ab")],
        "enc6to2std": _dual("c3", "ab", 6, 6),
        "enc10to6dil": [("c3d2", 4, 3, False, "ab")],
        "enc6to2dil": [("c3d2", 6, 6, False, "ab")],
        "dec2to6std": [("t3", 12, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec6to10std": [("t3", 12, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec2to6dil": [("t3d2", 12, 3, False, "ab")],
        "dec6to10dil": [("t3d2", 12, 3, False, "ab")],
        "dec10to30str": [("t3s3", 10, 5, False, "ab")],
        "dec30to34std": [("t3", 9, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec30to34dil": [("t3d2", 9, 3, False, "ab")],
        "dec34to38std": [("t3", 10, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec34to38dil": [("t3d2", 10, 3, False, "ab")],
        "dec38to114str": [("t3s3", 10, 4, False, "ab")],
        "dec114to118std": [("t3", 8, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec114to118dil": [("t3d2", 8, 3, False, "ab")],
        "dec118to122std": [("t3", 12, 3, False, "ab"), ("t3", 3, 3, False, "ab")],
        "dec118to122dil": [("t3d2", 12, 3, False, "ab")],
        "dec122to126std": [("t3", 10, 3, False, "a"), ("t3", 3, 3, False, "a")],
        "dec122to126dil": [("t3d2", 10, 3, False, "a")],
        "dec126to128std": [("t3", 8, ("A", 3), True, "relu")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        ns: Dict = {}
        cat = lambda *t: jnp.concatenate(t, axis=-1)
        B = lambda n, t: cls._block(params, state, n, t, train)

        l126, ns["enc128to126std"] = B("enc128to126std", x)
        s, ns["enc126to122std"] = B("enc126to122std", l126)
        d, ns["enc126to122dil"] = B("enc126to122dil", l126)
        l122 = cat(s, d)
        s, ns["enc122to118std"] = B("enc122to118std", l122)
        d, ns["enc122to118dil"] = B("enc122to118dil", l122)
        d5, ns["enc128to118dil"] = B("enc128to118dil", x)
        l118 = cat(s, d, d5)
        s, ns["enc118to114std"] = B("enc118to114std", l118)
        d, ns["enc118to114dil"] = B("enc118to114dil", l118)
        l114 = cat(s, d)
        l38, ns["enc114to38str"] = B("enc114to38str", l114)
        s, ns["enc38to34std"] = B("enc38to34std", l38)
        d, ns["enc38to34dil"] = B("enc38to34dil", l38)
        l34 = cat(s, d)
        s, ns["enc34to30std"] = B("enc34to30std", l34)
        d, ns["enc34to30dil"] = B("enc34to30dil", l34)
        l30 = cat(s, d)
        l10, ns["enc30to10str"] = B("enc30to10str", l30)
        s, ns["enc10to6std"] = B("enc10to6std", l10)
        d, ns["enc10to6dil"] = B("enc10to6dil", l10)
        l6 = cat(s, d)
        s, ns["enc6to2std"] = B("enc6to2std", l6)
        d, ns["enc6to2dil"] = B("enc6to2dil", l6)
        l2 = cat(s, d)
        # decoder
        s, ns["dec2to6std"] = B("dec2to6std", l2)
        d, ns["dec2to6dil"] = B("dec2to6dil", l2)
        l6 = cat(l6, s, d)
        s, ns["dec6to10std"] = B("dec6to10std", l6)
        d, ns["dec6to10dil"] = B("dec6to10dil", l6)
        l10 = cat(l10, s, d)
        u, ns["dec10to30str"] = B("dec10to30str", l10)
        l30 = cat(l30, u)
        s, ns["dec30to34std"] = B("dec30to34std", l30)
        d, ns["dec30to34dil"] = B("dec30to34dil", l30)
        l34 = cat(l34, s, d)
        s, ns["dec34to38std"] = B("dec34to38std", l34)
        d, ns["dec34to38dil"] = B("dec34to38dil", l34)
        l38 = cat(l38, s, d)
        u, ns["dec38to114str"] = B("dec38to114str", l38)
        l114 = cat(l114, u)
        s, ns["dec114to118std"] = B("dec114to118std", l114)
        d, ns["dec114to118dil"] = B("dec114to118dil", l114)
        l118 = cat(l118, s, d)
        s, ns["dec118to122std"] = B("dec118to122std", l118)
        d, ns["dec118to122dil"] = B("dec118to122dil", l118)
        l122 = cat(l122, s, d)
        s, ns["dec122to126std"] = B("dec122to126std", l122)
        d, ns["dec122to126dil"] = B("dec122to126dil", l122)
        l126 = cat(l126, s, d)
        y, ns["dec126to128std"] = B("dec126to128std", l126)
        return y, ns


class Hul144Disc(_RelicBase):
    """relics.py:931-1066 — 144-px PReLU(0.01)+BN discriminator; ``decide``
    head is a k2 conv + Sigmoid, or (``finalpool=True``) Sigmoid k3 conv +
    global max-pool."""

    name = "Hul144Disc"
    act = "PReLU"
    prelu_init = 0.01
    kind = "discriminator"
    plan: Dict[str, List[Spec]] = {
        "enc144to142std": [("c3", "in", 2, True, "a")],
        "enc142to138std": _dual("c3", "a", 2, 2),
        "enc138to134std": _dual("c3", "ab", 4, 2),
        "enc142to138dil": [("c3d2", 2, 2, False, "a")],
        "enc138to134dil": [("c3d2", 4, 2, False, "ab")],
        "enc144to134dil": [("c3d5", "in", 2, False, "a")],
        "enc134to132std": [("c3", 6, 6, False, "ab")],
        "enc132to44str": [("c3s3", 6, 6, False, "ab")],
        "enc44to40std": _dual("c3", "ab", 6, 3),
        "enc40to36std": _dual("c3", "ab", 6, 3),
        "enc44to40dil": [("c3d2", 6, 3, False, "ab")],
        "enc40to36dil": [("c3d2", 6, 3, False, "ab")],
        "enc36to12str": [("c3s3", 6, 6, False, "ab")],
        "enc12to8std": _dual("c3", "ab", 6, 6),
        "enc8to4std": _dual("c3", "ab", 12, 6),
        "enc12to8dil": [("c3d2", 6, 6, False, "ab")],
        "enc8to4dil": [("c3d2", 12, 6, False, "ab")],
        # finalpool=False variant (the torch __init__ builds one or the other;
        # both are initialized here and selected at apply time)
        "enc4to2std": [("c3", 12, 4, True, "a")],
        "decide": [("c2", 4, ("A", 1), True, "sig")],
        # finalpool=True variant
        "enc4to2pool": [("c3", 12, ("A", 1), True, "sig")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False,
              finalpool: bool = False, **_ignored):
        ns: Dict = {}
        cat = lambda *t: jnp.concatenate(t, axis=-1)
        B = lambda n, t: cls._block(params, state, n, t, train)

        li, ns["enc144to142std"] = B("enc144to142std", x)
        s, ns["enc142to138std"] = B("enc142to138std", li)
        d, ns["enc142to138dil"] = B("enc142to138dil", li)
        li = cat(s, d)
        s, ns["enc138to134std"] = B("enc138to134std", li)
        d, ns["enc138to134dil"] = B("enc138to134dil", li)
        d5, ns["enc144to134dil"] = B("enc144to134dil", x)
        layer = cat(s, d, d5)
        layer, ns["enc134to132std"] = B("enc134to132std", layer)
        layer, ns["enc132to44str"] = B("enc132to44str", layer)
        s, ns["enc44to40std"] = B("enc44to40std", layer)
        d, ns["enc44to40dil"] = B("enc44to40dil", layer)
        layer = cat(s, d)
        s, ns["enc40to36std"] = B("enc40to36std", layer)
        d, ns["enc40to36dil"] = B("enc40to36dil", layer)
        layer = cat(s, d)
        layer, ns["enc36to12str"] = B("enc36to12str", layer)
        s, ns["enc12to8std"] = B("enc12to8std", layer)
        d, ns["enc12to8dil"] = B("enc12to8dil", layer)
        layer = cat(s, d)
        s, ns["enc8to4std"] = B("enc8to4std", layer)
        d, ns["enc8to4dil"] = B("enc8to4dil", layer)
        layer = cat(s, d)
        if finalpool:
            layer, ns["enc4to2pool"] = B("enc4to2pool", layer)
            y = jnp.max(layer, axis=(1, 2), keepdims=True)  # AdaptiveMaxPool2d(1)
        else:
            layer, ns["enc4to2std"] = B("enc4to2std", layer)
            y, ns["decide"] = B("decide", layer)
        return y, ns


class HunkyDisc(_RelicBase):
    """relics.py:43-96 — plain 256-px Conv->BN->ReLU + MaxPool ladder with a
    Sigmoid head; absolute channel plan (no funit)."""

    name = "HunkyDisc"
    act = "ReLU"
    kind = "discriminator"
    plan: Dict[str, List[Spec]] = {
        "enc1": [("c5", "in", ("A", 64), True, "ba"),
                 ("c5", ("A", 64), ("A", 64), True, "ba")],
        "enc2": [("c3", ("A", 64), ("A", 96), True, "ba"),
                 ("c3", ("A", 96), ("A", 96), True, "ba")],
        "enc3": [("c3", ("A", 96), ("A", 128), True, "ba"),
                 ("c3", ("A", 128), ("A", 128), True, "ba")],
        "enc4": [("c3", ("A", 128), ("A", 256), True, "ba"),
                 ("c3", ("A", 256), ("A", 256), True, "ba")],
        "enc5": [("c3", ("A", 256), ("A", 512), True, "ba"),
                 ("c3", ("A", 512), ("A", 512), True, "ba")],
        "encdec": [("c3", ("A", 512), ("A", 1024), True, "ba"),
                   ("c2", ("A", 1024), ("A", 1), True, "sig")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        ns: Dict = {}
        for bname in ("enc1", "enc2", "enc3", "enc4", "enc5"):
            x, ns[bname] = cls._block(params, state, bname, x, train)
            x = C.maxpool2x(x)
        x, ns["encdec"] = cls._block(params, state, "encdec", x, train)
        return x, ns


class HunkyNet(_RelicBase):
    """relics.py:1610-1759 — 224+16n-px residual U-Net: Conv->BN->ReLU
    encoder with MaxPool downs, k2s2 up-tconvs, residual ADDS (not concats),
    pre-activation (BN->ReLU first) decoder blocks, Sigmoid head."""

    name = "HunkyNet"
    act = "ReLU"
    plan: Dict[str, List[Spec]] = {
        "enc1": [("c5", "in", ("A", 64), True, "ba"),
                 ("c5", ("A", 64), ("A", 64), True, "ba")],
        "enc2": [("c3", ("A", 64), ("A", 96), True, "ba"),
                 ("c3", ("A", 96), ("A", 96), True, "ba")],
        "enc3": [("c3", ("A", 96), ("A", 128), True, "ba"),
                 ("c3", ("A", 128), ("A", 128), True, "ba")],
        "enc4": [("c3", ("A", 128), ("A", 256), True, "ba"),
                 ("c3", ("A", 256), ("A", 256), True, "ba")],
        "enc5": [("c3", ("A", 256), ("A", 512), True, "ba"),
                 ("c3", ("A", 512), ("A", 512), True, "ba")],
        "encdec": [("c3", ("A", 512), ("A", 1024), True, "ba"),
                   ("t3", ("A", 1024), ("A", 1024), True, "ba")],
        "up1": [("t2s2", ("A", 1024), ("A", 512), True, "")],
        "dec2": [("pre", ("A", 512), ("A", 512), False, "ba"),
                 ("t3", ("A", 512), ("A", 512), True, "ba"),
                 ("t3", ("A", 512), ("A", 512), True, "ba")],
        "up2": [("t2s2", ("A", 512), ("A", 256), True, "")],
        "dec3": [("pre", ("A", 256), ("A", 256), False, "ba"),
                 ("t3", ("A", 256), ("A", 256), True, "ba"),
                 ("t3", ("A", 256), ("A", 256), True, "ba")],
        "up3": [("t2s2", ("A", 256), ("A", 128), True, "")],
        "dec4": [("pre", ("A", 128), ("A", 128), False, "ba"),
                 ("t3", ("A", 128), ("A", 128), True, "ba"),
                 ("t3", ("A", 128), ("A", 128), True, "ba")],
        "up4": [("t2s2", ("A", 128), ("A", 96), True, "")],
        "dec5": [("pre", ("A", 96), ("A", 96), False, "ba"),
                 ("t3", ("A", 96), ("A", 96), True, "ba"),
                 ("t3", ("A", 96), ("A", 96), True, "ba")],
        "up5": [("t2s2", ("A", 96), ("A", 64), True, "")],
        "dec6": [("pre", ("A", 64), ("A", 64), False, "ba"),
                 ("t5", ("A", 64), ("A", 64), True, "ba"),
                 ("t5", ("A", 64), ("A", 3), True, "sig")],
    }

    @classmethod
    def apply(cls, params, x, state, train: bool = False, **_ignored):
        ns: Dict = {}
        B = lambda n, t: cls._block(params, state, n, t, train)
        residuals = []
        for bname in ("enc1", "enc2", "enc3", "enc4", "enc5"):
            x, ns[bname] = B(bname, x)
            residuals.append(x)
            x = C.maxpool2x(x)
        x, ns["encdec"] = B("encdec", x)
        for up, dec in (("up1", "dec2"), ("up2", "dec3"), ("up3", "dec4"),
                        ("up4", "dec5"), ("up5", "dec6")):
            x, ns[up] = B(up, x)
            x = x + residuals.pop()
            x, ns[dec] = B(dec, x)
        return x, ns


class RedishCNN:
    """relics.py:4-39 — pre-activation residual CNN with *shared* modules
    (one conv, one deconv, one BN reused at every depth) and RReLU.

    ``depth`` controls the residual ladder: ``(depth-6)//2`` down/up levels
    (the reference's ``int(floor(depth-6)/2)``; ``floor`` is one of the
    unimported names that make the upstream forward non-runnable).
    nn.RReLU is implemented with its eval-mode fixed slope
    ``(lower+upper)/2 = 55/240`` (training-mode randomized slopes are not
    reproducible and the relic was never trained in the repo).
    BatchNorm running stats thread through every shared-BN application in
    definition order, matching sequential torch semantics.
    """

    name = "RedishCNN"
    kind = "generator"

    @classmethod
    def init(cls, key, n_channels: int = 128, image_channels: int = 3,
             kernel_size: int = 5, **_ignored):
        ks = jax.random.split(key, 4)

        def conv(k, cin, cout):
            bound = 1.0 / math.sqrt(cin * kernel_size * kernel_size)
            kw, kb = jax.random.split(k)
            return {"w": jax.random.uniform(
                        kw, (kernel_size, kernel_size, cin, cout),
                        jnp.float32, -bound, bound),
                    "b": jax.random.uniform(kb, (cout,), jnp.float32,
                                            -bound, bound)}

        params = {
            "conv_first": conv(ks[0], image_channels, n_channels),
            "conv": conv(ks[1], n_channels, n_channels),
            "deconv": conv(ks[2], n_channels, n_channels),
            "deconv_last": conv(ks[3], n_channels, image_channels),
        }
        bnp, bns = norm.init(n_channels)
        params["bn"] = bnp
        return params, {"bn": bns}

    @classmethod
    def apply(cls, params, x, state, train: bool = False, depth: int = 30,
              find_noise: bool = False, **_ignored):
        rr = lambda t: jax.nn.leaky_relu(t, RRELU_EVAL_SLOPE)
        cv = lambda t, p: C.conv2d(t, p["w"], p["b"])
        dc = lambda t, p: C.conv2d(t, p["w"], p["b"], padding="FULL")
        bn_state = state["bn"]
        it = (depth - 6) // 2

        layer = rr(cv(x, params["conv_first"]))
        residuals = [layer]
        for _ in range(it):
            for _ in range(2):
                layer, bn_state = norm.apply(params["bn"], bn_state, layer, train)
                layer = cv(rr(layer), params["conv"])
            residuals.append(layer)
        layer = rr(cv(layer, params["conv"]))
        layer = rr(dc(layer, params["deconv"]))
        layer = rr(layer + residuals.pop())
        for _ in range(it):
            for _ in range(2):
                layer, bn_state = norm.apply(params["bn"], bn_state, layer, train)
                layer = dc(rr(layer), params["deconv"])
            layer = rr(layer + residuals.pop())
        layer = rr(dc(layer, params["deconv_last"]))
        if find_noise:
            layer = x - layer
        return layer, {"bn": bn_state}


HulNet = Hul160Net  # relics.py:1608 compatibility alias
