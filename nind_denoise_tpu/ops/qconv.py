"""int8 quantized convolution primitives for the inference fast path.

The v5e MXU runs int8xint8->int32 at ~2x its bf16 rate (measured on the
target chip: 437 TOP/s vs 207 TF/s matmul chains, 294 vs 122 on 3x3 conv
chains — see PERF.md "int8 engine mode"), and int8 activations halve the
HBM bytes of every conv input. This module provides the three pieces the
quantized UtNet forward (models/utnet.UtNet.apply_int8) composes:

* ``quant_kernel``  — per-output-channel symmetric weight quantization,
  done ONCE at engine build (models/utnet.UtNet.precompute_int8).
* ``quant_act``     — dynamic per-sample symmetric activation quantization
  (a max-reduce + round per conv input; per-SAMPLE, not per-tensor, so the
  engine's zero-weight dummy tiles and heterogeneous tile content cannot
  couple scales across the batch).
* ``qconv``         — int8 conv with int32 accumulation and a fused
  dequant epilogue ``y = conv_i32 * (s_act * s_out) + b``.

Scheme notes. Symmetric (zero-point-free) quantization keeps the conv a
plain integer dot — no zero-point correction terms — at the cost of one
wasted code (-128). int32 accumulators cannot overflow for any layer in
this codebase: the worst case (16*funit input channels, 4x4 composed
kernel) is 1024*16*127*127 = 2.6e8 << 2^31. Quality is a measured
property, not a promise: tests/test_qconv.py pins the int8-vs-fp32 PSNR
floor, and the engine only uses this path for the opt-in
``compute_dtype='int8'``.

This is an inference-only path (no custom VJPs); training stays bf16/fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


def quant_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO (or any (..., cout)) kernel -> (int8 kernel, (cout,) f32 scales).

    Per-output-channel symmetric: s_o = max|w[..., o]| / 127, so each
    output channel uses the full int8 range regardless of the others'
    magnitudes (per-tensor weight scales measurably hurt the first/last
    decoder levels, whose channel norms span ~2 orders of magnitude)."""
    w = w.astype(jnp.float32)
    axes = tuple(range(w.ndim - 1))
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), _EPS) / 127.0
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def quant_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W, C) activations -> (int8, (N,1,1,1) f32 per-sample scales)."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True)
    s = jnp.maximum(m, _EPS) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    return xq, s


def quant_act_static(x: jnp.ndarray, s: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize with a pre-calibrated scalar scale (UtNet.calibrate_int8).

    Unlike ``quant_act`` this needs no max-reduce over ``x``, so XLA fuses
    the round/clip/cast into the PRODUCER's epilogue — the activation
    writes int8 directly (1 byte) instead of bf16 (2), and the quantized
    path carries strictly less HBM traffic than bf16 (PERF.md "int8
    engine mode"). Values beyond the calibrated range saturate at +-127
    (bounded, graceful; quality floors in tests/test_qconv.py)."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    return xq, s


def calib_tiles(size: int = 136, seed: int = 0):
    """Deterministic synthetic calibration batch for static activation
    scales (UtNet.calibrate_int8) when no real data is at hand (engine
    build time): extremal inputs for a conv net over [0,1] images —
    flat fields at 0/0.5/1 (maximize low-frequency responses: the sum of
    a kernel's positive taps), H/V gradients, a 1-px checkerboard
    (maximizes high-frequency taps), uniform noise, and noise+gradient
    (natural-image-ish). Deeper layers' extrema are not guaranteed by
    first-layer extrema — `calibrate_int8`'s headroom plus the clip's
    graceful saturation cover the residual, and quality floors in
    tests/test_qconv.py are the regression net."""
    import numpy as np

    rng = np.random.default_rng(seed)
    g = np.linspace(0.0, 1.0, size, dtype=np.float32)
    hgrad = np.broadcast_to(g[None, :, None], (size, size, 3))
    vgrad = np.broadcast_to(g[:, None, None], (size, size, 3))
    ii, jj = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    checker = np.broadcast_to((((ii + jj) % 2).astype(np.float32))[..., None],
                              (size, size, 3))
    noise = rng.random((size, size, 3), dtype=np.float32)
    tiles = np.stack([
        np.zeros((size, size, 3), np.float32),
        np.full((size, size, 3), 0.5, np.float32),
        np.ones((size, size, 3), np.float32),
        hgrad, vgrad, checker, noise,
        np.clip(0.75 * vgrad + 0.25 * rng.random(
            (size, size, 3), dtype=np.float32), 0.0, 1.0),
    ])
    return jnp.asarray(tiles)


def calib_from_image(img01, size: int = 136, scale: float = 1.0):
    """Calibration batch drawn from the ACTUAL image being denoised
    (denoise_image_cli does this for ``--compute_dtype int8_static``):
    the four corner crops, the center crop, and the crop centered on the
    brightest pixel (so the first-layer extremes of THIS image are in
    range; deeper-layer residual is covered by calibrate_int8's
    headroom). Content-matched scales digitize the image's real dynamic
    range — synthetic extremal tiles overestimate scales on dim content
    and waste int8 codes (tests/test_qconv.py measures the win).

    ``img01``: (H, W, 3) array in [0, 1] — or a storage-dtype raw with
    ``scale`` to divide by (only the six CROPS are normalized, so callers
    on the raw-dtype fast path skip the full-image fp32 divide).
    Reflect-padded up to ``size`` when smaller. Returns (6, size, size, 3)
    f32."""
    import numpy as np

    img01 = np.asarray(img01)
    h, w = img01.shape[:2]
    if h < size or w < size:
        img01 = np.pad(img01, ((0, max(0, size - h)), (0, max(0, size - w)),
                               (0, 0)), mode="reflect")
        h, w = img01.shape[:2]
    ys = [0, h - size, 0, h - size, (h - size) // 2]
    xs = [0, 0, w - size, w - size, (w - size) // 2]
    # EXACT brightest-pixel probe in bounded memory: a whole-image argmax
    # temporary (uint16 sums promote to uint64 — ~190 MB at 24 MP) is too
    # big to pay PER REQUEST under int8_static auto-recalibration, but a
    # strided subsample can MISS a narrow specular highlight entirely
    # (review r3) — and clipped highlights are precisely what this crop
    # exists to put in the calibration range. Row-strip reduction keeps
    # the temporary at ~8 MB float32 while staying exact.
    strip = max(1, 2_000_000 // max(w, 1))
    best, iy, ix = -np.inf, 0, 0
    for y0 in range(0, h, strip):
        lum = img01[y0:y0 + strip].sum(axis=2, dtype=np.float32)
        j = int(np.argmax(lum))
        v = float(lum.flat[j])
        if v > best:
            best = v
            iy, ix = y0 + j // lum.shape[1], j % lum.shape[1]
    ys.append(int(np.clip(iy - size // 2, 0, h - size)))
    xs.append(int(np.clip(ix - size // 2, 0, w - size)))
    crops = [img01[y:y + size, x:x + size].astype(np.float32) / scale
             for y, x in zip(ys, xs)]
    return jnp.asarray(np.stack(crops))


# NOTE (round 4 negative result, measured on chip — do not re-attempt
# without new hardware facts): merging each decoder level's input-dilated
# composed conv + skip conv into ONE plain 2x2 int8 conv in space-to-depth
# phase layout (scale ratio folded into weight columns) was implemented,
# exact to 75 dB, and REGRESSED the full static forward 132 -> 148 ms at
# batch 64. The phase relayout (depth-to-space of the int8 output) costs
# ~as much as a whole level conv (13 ms standalone at lvl2 shapes), a
# phase-layout dec_c1 is no faster than the spatial 3x3 (14.8-17.4 vs
# 12.9-13.3 ms), and a selection-kernel dilated conv performing d2s on the
# MXU is no faster than the transpose (13.3-16.8 vs 13.3-14.1 ms). Same
# failure mode as round 3's polyphase rewrite: on this chip, interleave
# relayouts beat any int8 MXU-rate gain they unlock. PERF.md has the full
# table.
#
# ROUND-5 FOLLOW-UP — the backlog's last named idea, CHANNEL-SPACE
# composition, is also a measured negative. The full phase-CHAIN (the
# combination r4 never timed end-to-end: merged 2x2 int8 conv over
# [t | s2d(skip)] producing 4*cout phase-stacked channels, a phase-native
# 2x2/4C dec_c1, ZERO interleave relayouts between levels, ONE d2s
# deferred to the chain end) was built as a structural A/B at the real
# decoder shapes (batch 16, cs=504 forward, all three levels chained) and
# ran 1.27-1.91x SLOWER than the shipping dilated-int8 chain
# (8.9-13.8 ms baseline vs 15.6-17.5 ms phase, 3 interleaved reps on
# chip, 2026-08-20). The phase-stacked convs gain no MXU-rate advantage
# over XLA's zero-skipping dilated lowering at these shapes, and the 4x
# channel widths push past the 128-lane sweet spot. The int8 decoder
# stays dilated; the backlog on this question is now EMPTY.


def qconv(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
          b: Optional[jnp.ndarray] = None,
          padding="VALID",
          lhs_dilation: Optional[Tuple[int, int]] = None,
          tile_bias: bool = False,
          sx: Optional[jnp.ndarray] = None,
          out_dtype=None) -> jnp.ndarray:
    """Quantized NHWC conv: quantize ``x`` (dynamically, or with the
    pre-calibrated static scale ``sx``; an already-int8 ``x`` is used
    as-is with ``sx`` as its scale), integer conv against the
    pre-quantized kernel ``(wq, sw)``, dequant + bias in f32, return in
    ``out_dtype`` (default ``x.dtype``; REQUIRED for int8 inputs).
    ``padding``: 'VALID'/'SAME'/'FULL' or explicit pairs; ``tile_bias``
    doubles the bias vector for width-folded layers (the folded channel
    layout v*C+c of ops/fastconv.py)."""
    if out_dtype is None:
        assert x.dtype != jnp.int8, "int8 input requires explicit out_dtype"
        out_dtype = x.dtype
    y = qconv_raw(x, wq, sw, padding, lhs_dilation=lhs_dilation, sx=sx)
    if b is not None:
        bb = jnp.tile(b, 2) if tile_bias else b
        y = y + bb.astype(jnp.float32)
    return y.astype(out_dtype)


def qconv_raw(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
              padding, lhs_dilation: Optional[Tuple[int, int]] = None,
              sx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Like ``qconv`` but returns the dequantized f32 tensor WITHOUT bias
    or output cast — for callers summing several conv branches in f32
    before one shared bias/activation (the composed decoder levels)."""
    if padding == "FULL":
        kh, kw = wq.shape[0], wq.shape[1]
        padding = ((kh - 1, kh - 1), (kw - 1, kw - 1))
    if x.dtype == jnp.int8:  # pre-quantized by the caller (sx = its scale)
        assert sx is not None, "int8 input requires its scale"
        xq = x
    else:
        xq, sx = quant_act(x) if sx is None else quant_act_static(x, sx)
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    y32 = lax.conv_general_dilated(
        xq, wq, window_strides=(1, 1), padding=padding,
        lhs_dilation=lhs_dilation, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return y32.astype(jnp.float32) * (sx * sw.astype(jnp.float32))
