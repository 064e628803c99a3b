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
from ..ops import fastconv as F

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

    # -- int8 quantized forward (inference only; see ops/qconv.py) -------------

    @staticmethod
    def precompute_int8(params: Params) -> Params:
        """Derive the quantized kernel tree for ``apply_int8`` once (engine
        build time): every heavy MXU conv gets per-output-channel int8
        weights + scales (ops/qconv.quant_kernel); the quality-sensitive
        ends of the network — the width-folded encoder level 1 (also
        bandwidth- not MXU-bound, PERF.md) and the final 1x1 to RGB — keep
        their bf16 fast-path kernels."""
        from ..ops import qconv as Q

        fast = UtNet.precompute_fast(params)
        d: Params = {"enc1_c0": fast["enc1_c0"], "enc1_c1": fast["enc1_c1"],
                     "final": fast["final"], "w3a4": fast["w3a4"]}
        qk = lambda w: dict(zip(("w", "s"), Q.quant_kernel(w)))
        # static mode also quantizes enc1's SECOND conv (c1, the costliest
        # single fragment of the forward): with a calibrated scale the
        # quantize fuses into c0's epilogue, halving the biggest bf16
        # tensor's write+read on top of the 2x MXU rate. c0 itself and the
        # final 1x1 stay bf16 (first-conv quality + bandwidth-bound).
        d["enc1_c1fq"] = qk(fast["enc1_c1"])
        for lvl in range(3):
            d[f"K{lvl}q"] = qk(fast[f"K{lvl}"])
        d["K3fq"] = qk(fast["K3f"])
        d["w3b4q"] = qk(fast["w3b4"])
        d["dec4_c1q"] = qk(fast["dec4_c1"])
        for name in ("convs2", "convs3", "convs4", "bottom"):
            for ck in ("c0", "c1"):
                d[f"{name}_{ck}q"] = qk(params[name][ck]["w"])
        for lvl, (up, tc) in enumerate((("up1", "tconvs1"), ("up2", "tconvs2"),
                                        ("up3", "tconvs3"))):
            cmid = params[up]["w"].shape[1] // 4
            d[f"skip{lvl}q"] = qk(params[tc]["c0"]["w"][:, :, cmid:])
            d[f"dec{lvl}_c1q"] = qk(params[tc]["c1"]["w"])
        return d

    @staticmethod
    def calibrate_int8(params: Params, derived: Params, calib: jnp.ndarray,
                       activation: str = "PReLU",
                       headroom: float = 1.3) -> Params:
        """Derive STATIC activation scales for ``apply_int8`` from a
        calibration batch (one observed forward): scale_site =
        max|input_site| over the batch * headroom / 127. With static
        scales the quantize needs no max-reduce, so XLA fuses it into the
        producer's epilogue and the int8 path carries strictly less HBM
        traffic than bf16 (PERF.md "int8 engine mode"). Out-of-range
        values saturate at +-127 — ``headroom`` buys margin for content
        hotter than the calibration set (the engine's default set is the
        synthetic extremal tiles of ops/qconv.calib_tiles)."""
        import jax as _jax

        h, w = int(calib.shape[1]), int(calib.shape[2])
        if h % 2 or w % 2:
            raise ValueError(
                f"calibrate_int8 needs an even-sized calibration batch (got "
                f"{h}x{w}): apply_int8 falls back to the exact forward on odd "
                f"sizes and cannot observe activation scales there")
        fn = _jax.jit(lambda p, xb: UtNet.apply_int8(
            p, xb, activation, derived=derived, observe=True))
        _, rec = fn(params, calib)
        d = dict(derived)
        d["acts"] = {k: (v.astype(jnp.float32) * headroom + 1e-12) / 127.0
                     for k, v in rec.items()}
        return d

    @staticmethod
    def apply_int8(params: Params, x: jnp.ndarray, activation: str = "PReLU",
                   derived: Optional[Params] = None, observe: bool = False):
        """int8-quantized variant of ``apply_fast``: the same composed/folded
        graph, with every interior conv running int8 x int8 -> int32 on the
        MXU (~2x the bf16 rate on v5e, half the activation HBM bytes).
        Activation scales are dynamic per-sample by default, or static when
        ``derived`` carries calibrated scales (``calibrate_int8`` — the
        fast mode: quantizes fuse into producer epilogues). NOT numerically
        exact — quantization noise is pinned by tests/test_qconv.py (PSNR
        floor vs the fp32 forward) and the mode is opt-in
        (``compute_dtype='int8'`` / ``'int8_static'``).
        Falls back to ``apply`` on odd sizes like ``apply_fast``.
        ``observe=True`` (calibration) returns ``(y, {site: max|input|})``."""
        from ..ops import qconv as Q

        n, H, W, _ = x.shape
        if W % 2 or H % 2:
            return UtNet.apply(params, x, activation)
        if derived is None:
            derived = UtNet.precompute_int8(params)
        acts = derived.get("acts")
        rec: Optional[dict] = {} if observe else None
        act = lambda t, p: C.apply_activation(t, activation, p.get("a"))
        f32 = jnp.float32

        work = x.dtype

        def qc(t, key, b, pad, **kw):
            if rec is not None:
                rec[key] = jnp.max(jnp.abs(t.astype(f32)))
            sx = None if acts is None else acts[key]
            return Q.qconv(t, derived[key]["w"], derived[key]["s"], b, pad,
                           sx=sx, out_dtype=work, **kw)

        def pool_q(t, key):
            """Static mode: quantize BEFORE the 2x2 maxpool. round/clip/
            divide-by-positive-scale is monotone non-decreasing, and a
            monotone map commutes with max EXACTLY (saturation included),
            so this is bit-identical to pooling first — but the quantize
            fuses into the producer conv's epilogue and the pool moves
            int8 bytes instead of bf16 (the l1f pool input alone is ~4 GB
            at batch 64)."""
            if acts is None:
                return C.maxpool2x(t)
            tq, _ = Q.quant_act_static(t, acts[key])
            return C.maxpool2x(tq)

        def qr(t, key, pad, **kw):
            if rec is not None:
                rec[key] = jnp.max(jnp.abs(t.astype(f32)))
            sx = None if acts is None else acts[key]
            return Q.qconv_raw(t, derived[key]["w"], derived[key]["s"], pad,
                               sx=sx, **kw)

        # encoder level 1: bf16 fast path unchanged (bandwidth-bound +
        # first-layer quality; see precompute_int8)
        xf = F.fold_w(C.reflect_pad(x, 2))
        wb1 = xf.shape[2]
        p = params["convs1"]["c0"]
        t = F.folded_conv3(xf, derived["enc1_c0"], p["b"], (0, 0))
        t = act(t, p) * F.col_mask(wb1, t.shape[3], 1, W + 3, t.dtype)
        if rec is not None:
            rec["enc1_c1fq"] = jnp.max(jnp.abs(t.astype(f32)))
        p = params["convs1"]["c1"]
        if acts is not None and "enc1_c1fq" in acts:
            # int8 c1 (precompute_int8 note): quantize fuses into c0's
            # act/mask epilogue; folded geometry = h_pad (0,0) + W SAME
            tq, _ = Q.quant_act_static(t, acts["enc1_c1fq"])
            t = Q.qconv(tq, derived["enc1_c1fq"]["w"],
                        derived["enc1_c1fq"]["s"], p["b"],
                        ((0, 0), (1, 1)), tile_bias=True,
                        sx=acts["enc1_c1fq"], out_dtype=work)
        else:
            t = F.folded_conv3(t, derived["enc1_c1"], p["b"], (0, 0))
        l1f = act(t, p) * F.col_mask(wb1, t.shape[3], 2, W + 2, t.dtype)
        fu = l1f.shape[3] // 2
        l1p = l1f if acts is None else \
            Q.quant_act_static(l1f, acts["convs2_c0q"])[0]
        pooled = jnp.maximum(l1p[..., :fu], l1p[..., fu:])
        pooled = pooled.reshape(n, H // 2, 2, wb1, fu).max(axis=2)
        l2_in = pooled[:, :, 1:1 + W // 2, :]

        def double_q(name, t):
            p0, p1 = params[name]["c0"], params[name]["c1"]
            t = act(qc(t, f"{name}_c0q", p0["b"], "VALID"), p0)
            t = act(qc(t, f"{name}_c1q", p1["b"], "VALID"), p1)
            return t

        l2 = double_q("convs2", l2_in)
        l3 = double_q("convs3", pool_q(l2, "convs3_c0q"))
        l4 = double_q("convs4", pool_q(l3, "convs4_c0q"))
        b_ = params["bottom"]
        t = act(qc(pool_q(l4, "bottom_c0q"), "bottom_c0q", b_["c0"]["b"],
                   "VALID"), b_["c0"])
        t = act(qc(t, "bottom_c1q", b_["c1"]["b"], "FULL"), b_["c1"])

        # decoder levels 1-3: composed up+conv, both branches int8.
        # (A phase-layout merge of zA+zB into one plain 2x2 int8 conv was
        # built and measured in round 4 — exact to 75 dB but SLOWER: the
        # depth-to-space relayout costs as much as a whole conv on this
        # chip, the same failure mode as round 3's polyphase attempt. See
        # PERF.md "int8 engine mode", negative results.)
        for lvl, (skip, up, tc) in enumerate(((l4, "up1", "tconvs1"),
                                              (l3, "up2", "tconvs2"),
                                              (l2, "up3", "tconvs3"))):
            up_p, tc_p = params[up], params[tc]
            cmid = up_p["w"].shape[1] // 4
            w3 = tc_p["c0"]["w"]
            bmap = F.up_bias_map(skip.shape[1], skip.shape[2], up_p["b"],
                                 w3[:, :, :cmid], f32)
            zA = qr(t, f"K{lvl}q", ((3, 3), (3, 3)), lhs_dilation=(2, 2))
            zB = qr(skip, f"skip{lvl}q", "FULL")
            y = (zA + zB + bmap
                 + tc_p["c0"]["b"].astype(f32)).astype(t.dtype)
            y = act(y, tc_p["c0"])
            t = act(qc(y, f"dec{lvl}_c1q", tc_p["c1"]["b"], "FULL"),
                    tc_p["c1"])

        # decoder level 4 + final 1x1, width-folded (final stays bf16)
        up4, tc4 = params["up4"], params["tconvs4"]
        cmid = up4["w"].shape[1] // 4
        zA = qr(t, "K3fq", ((3, 3), (2, 2)), lhs_dilation=(2, 1))
        zB = qr(l1f, "w3b4q", ((2, 2), (1, 1)))
        planef = (F.col_mask(wb1, 2 * cmid, 2, W + 2, f32)
                  * jnp.tile(up4["b"], 2).astype(f32))
        bmapf = F.folded_conv3(jnp.broadcast_to(planef, (1, H, wb1, 2 * cmid)),
                               derived["w3a4"], None, (2, 2)).astype(f32)
        y = (zA + zB + bmapf
             + jnp.tile(tc4["c0"]["b"], 2).astype(f32)).astype(t.dtype)
        y = act(y, tc4["c0"]) * F.col_mask(wb1, y.shape[3], 1, W + 3, y.dtype)
        y = qc(y, "dec4_c1q", tc4["c1"]["b"], ((2, 2), (1, 1)), tile_bias=True)
        y = act(y, tc4["c1"])
        y = F.folded_conv1x1(y, derived["final"], tc4["c2"]["b"])
        y = y[:, 2:2 + H, 1:1 + W // 2, :]
        y = F.unfold_w(y)
        return (y, rec) if observe else y

    # -- MXU-shaped fast forward (exact rewrite; see ops/fastconv.py) ----------

    @staticmethod
    def precompute_fast(params: Params) -> Params:
        """Derive the composed/folded kernels once (host or device), so
        ``apply_fast`` skips per-call kernel composition. Returns a dict to
        pass as ``derived=``."""
        d: Params = {}
        for lvl, (up, tc) in enumerate((("up1", "tconvs1"), ("up2", "tconvs2"),
                                        ("up3", "tconvs3"))):
            cmid = params[up]["w"].shape[1] // 4
            w3 = params[tc]["c0"]["w"]
            d[f"K{lvl}"] = F.compose_up3(params[up]["w"], w3[:, :, :cmid])
        cmid = params["up4"]["w"].shape[1] // 4
        w3 = params["tconvs4"]["c0"]["w"]
        d["K3f"] = F.compose_up3_folded_w(params["up4"]["w"], w3[:, :, :cmid])
        d["w3b4"] = F.fold_kernel(w3[:, :, cmid:])
        d["w3a4"] = F.fold_kernel(w3[:, :, :cmid])
        for name in ("c0", "c1"):
            d[f"enc1_{name}"] = F.fold_kernel(params["convs1"][name]["w"])
        d["dec4_c1"] = F.fold_kernel(params["tconvs4"]["c1"]["w"])
        d["final"] = F.fold_kernel_1x1(params["tconvs4"]["c2"]["w"])
        return d

    @staticmethod
    def apply_fast(params: Params, x: jnp.ndarray, activation: str = "PReLU",
                   derived: Optional[Params] = None,
                   enc1_impl: str = "xla") -> jnp.ndarray:
        """Numerically-equivalent forward reformulated for the TPU MXU:
        composed up-convs (no pixel-shuffle/concat) and width-folded
        level-1 convs (ops/fastconv.py). Requires even H and W; falls back
        to ``apply`` otherwise. Parity: tests/test_utnet_fast.py (~1e-6
        rel fp32 vs ``apply``, which is itself golden-tested against the
        reference UtNet, networks/UtNet.py:13-109).

        ``enc1_impl``: 'xla' (default — differentiable, the trainer's
        path), 'pallas' (the fused VMEM enc1 kernel, inference-only: no
        custom VJP), or 'auto' ('pallas' when tracing for a TPU backend,
        PReLU, and the geometry fits; engines use this)."""
        n, H, W, _ = x.shape
        if W % 2 or H % 2:
            return UtNet.apply(params, x, activation)
        if derived is None:
            derived = UtNet.precompute_fast(params)
        act = lambda t, p: C.apply_activation(t, activation, p.get("a"))
        f32 = jnp.float32

        def double_conv(p, t):
            t = act(C.conv2d(t, p["c0"]["w"], p["c0"]["b"], "VALID"), p["c0"])
            t = act(C.conv2d(t, p["c1"]["w"], p["c1"]["b"], "VALID"), p["c1"])
            return t

        # encoder level 1, width-folded (64-ch convs run as 128-ch)
        xf = F.fold_w(C.reflect_pad(x, 2))          # (N, H+4, W/2+2, 6)
        wb1 = xf.shape[2]
        c2 = derived["enc1_c1"].shape[3]
        if enc1_impl == "auto":
            import jax as _jax

            from ..ops.pallas_enc1 import enc1_fits

            enc1_impl = ("pallas" if activation == "PReLU"
                         and _jax.default_backend() == "tpu"
                         and enc1_fits(H, W, c2=c2,
                                       itemsize=jnp.dtype(x.dtype).itemsize)
                         else "xla")
        if enc1_impl == "pallas":
            from ..ops.pallas_enc1 import enc1_pallas

            p0, p1 = params["convs1"]["c0"], params["convs1"]["c1"]
            l1f, l2_in = enc1_pallas(xf, derived["enc1_c0"], p0["b"],
                                     p0["a"], derived["enc1_c1"], p1["b"],
                                     p1["a"])
        else:
            p = params["convs1"]["c0"]
            t = F.folded_conv3(xf, derived["enc1_c0"], p["b"], (0, 0))
            t = act(t, p) * F.col_mask(wb1, t.shape[3], 1, W + 3, t.dtype)
            p = params["convs1"]["c1"]
            t = F.folded_conv3(t, derived["enc1_c1"], p["b"], (0, 0))
            l1f = act(t, p) * F.col_mask(wb1, t.shape[3], 2, W + 2, t.dtype)
            fu = l1f.shape[3] // 2
            pooled = jnp.maximum(l1f[..., :fu], l1f[..., fu:])
            pooled = pooled.reshape(n, H // 2, 2, wb1, fu).max(axis=2)
            l2_in = pooled[:, :, 1:1 + W // 2, :]   # == maxpool2x(l1)

        l2 = double_conv(params["convs2"], l2_in)
        l3 = double_conv(params["convs3"], C.maxpool2x(l2))
        l4 = double_conv(params["convs4"], C.maxpool2x(l3))
        b_ = params["bottom"]
        t = act(C.conv2d(C.maxpool2x(l4), b_["c0"]["w"], b_["c0"]["b"], "VALID"), b_["c0"])
        t = act(C.tconv2d_k3s1(t, b_["c1"]["w"], b_["c1"]["b"]), b_["c1"])

        # decoder levels 1-3: composed up+conv (no shuffle, no concat)
        for lvl, (skip, up, tc) in enumerate(((l4, "up1", "tconvs1"),
                                              (l3, "up2", "tconvs2"),
                                              (l2, "up3", "tconvs3"))):
            up_p, tc_p = params[up], params[tc]
            cmid = up_p["w"].shape[1] // 4
            w3 = tc_p["c0"]["w"]
            zA = F.up_conv3_composed(t, derived[f"K{lvl}"])
            zB = C.conv2d(skip, w3[:, :, cmid:], None, "FULL")
            bmap = F.up_bias_map(skip.shape[1], skip.shape[2], up_p["b"],
                                 w3[:, :, :cmid], f32)
            y = (zA.astype(f32) + zB.astype(f32) + bmap
                 + tc_p["c0"]["b"].astype(f32)).astype(t.dtype)
            y = act(y, tc_p["c0"])
            t = act(C.tconv2d_k3s1(y, tc_p["c1"]["w"], tc_p["c1"]["b"]), tc_p["c1"])

        # decoder level 4 + final 1x1, width-folded
        up4, tc4 = params["up4"], params["tconvs4"]
        cmid = up4["w"].shape[1] // 4
        zA = F.up_conv3_composed_folded(t, derived["K3f"])   # (N, H+2, wb1, 2f)
        # the pallas enc1 emits l1f with 8-aligned zero pad columns; they
        # reproduce the folded conv's SAME-padding zeros exactly, so the
        # output slice back to wb1 is a fused no-copy (no-op on the XLA
        # path, where l1f is already wb1 wide)
        zB = F.folded_conv3(l1f, derived["w3b4"], None, (2, 2))[:, :, :wb1, :]
        planef = (F.col_mask(wb1, 2 * cmid, 2, W + 2, f32)
                  * jnp.tile(up4["b"], 2).astype(f32))
        bmapf = F.folded_conv3(jnp.broadcast_to(planef, (1, H, wb1, 2 * cmid)),
                               derived["w3a4"], None, (2, 2)).astype(f32)
        y = (zA.astype(f32) + zB.astype(f32) + bmapf
             + jnp.tile(tc4["c0"]["b"], 2).astype(f32)).astype(t.dtype)
        y = act(y, tc4["c0"]) * F.col_mask(wb1, y.shape[3], 1, W + 3, y.dtype)
        y = F.folded_conv3(y, derived["dec4_c1"], tc4["c1"]["b"], (2, 2))
        y = act(y, tc4["c1"])
        y = F.folded_conv1x1(y, derived["final"], tc4["c2"]["b"])
        y = y[:, 2:2 + H, 1:1 + W // 2, :]
        return F.unfold_w(y)
