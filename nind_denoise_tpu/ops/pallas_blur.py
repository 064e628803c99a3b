"""Pallas TPU kernel: separable Gaussian blur (the RL-deblur hot op).

The lax path (ops/rl_deblur._blur) runs two tap-unrolled slice-FMA sweeps
per blur; each materializes full-image intermediates in HBM. This kernel
fuses the vertical and horizontal passes in VMEM over row bands: one HBM
read + one write per blur.

Sublane-major layout (round-2 rewrite; the round-1 channel-interleaved lane
rolls compiled pathologically — PERF.md): channels are planar (the image is
(C, H, W) with W on the lane axis), and EVERY shifted access is a static
sublane-offset slice:

* vertical pass: ``x[off+k : off+k+band_h, :]`` slices of the halo'd band;
* horizontal pass: transpose the band in VMEM, slice along the (now
  sublane) W axis, transpose back.

No ``pltpu.roll``, no lane-offset slices, all lane dims 128-aligned.

* Grid over (channel, row band); each program DMAs its band plus a
  sublane-aligned row halo from ANY memory (bands overlap, which BlockSpec
  index maps cannot express), computes, writes its (band_h, W) block.
* The host wrapper pads with edge-replication (neumann, matching gmic/lax
  path), rounds H up to a band multiple and W up to lane multiples.

Falls back to interpret mode off-TPU (tests run it on CPU).

STATUS (measured on the target v5e chip, 6 MP, RL sigma=1 x10 iterations):
compiles cleanly (the round-1 pathology is gone), numerics match the lax
path to 5e-7 (blur) / 8e-6 (RL), and RL throughput is 94.8 MP/s at
band_h=128 vs 79.5 MP/s for the XLA path (+19%; band_h=256 exceeds the
16 MB scoped-VMEM limit). First compile through the remote service is
~60 s vs seconds for XLA, so the XLA path remains the product default;
select this kernel with ``rl_deblur(..., impl='pallas')`` or the CLI's
``--rl-impl pallas``. Remaining headroom is per-block overhead (~60 us x
48 blocks/blur), not bandwidth — a multi-band inner loop with
double-buffered DMA is the next step if RL ever matters to the pipeline
bound.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _taps(sigma: float) -> Tuple[float, ...]:
    r = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return tuple(float(t) for t in (k / k.sum()).astype(np.float32))


def _blur_band(scratch, taps: Tuple[float, ...], band_h: int, halo: int,
               w_out: int):
    """Separable blur of one halo'd VMEM band -> (band_h, w_out)."""
    x = scratch[:]                       # (band_h + 2*halo, Win)
    r = (len(taps) - 1) // 2
    # vertical: static sublane-offset slices of the halo'd band
    off = halo - r
    v = taps[0] * x[off:off + band_h, :]
    for k in range(1, len(taps)):
        v = v + taps[k] * x[off + k:off + k + band_h, :]
    # horizontal: transpose so the W axis is sublanes, slice, transpose back
    vt = v.T                             # (Win, band_h)
    o = taps[0] * vt[0:w_out, :]
    for k in range(1, len(taps)):
        o = o + taps[k] * vt[k:k + w_out, :]
    return o.T                           # (band_h, w_out)


def _start_dma(x_hbm, scratch, sem, band_h, halo):
    c = pl.program_id(0)
    i = pl.program_id(1)
    return pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(i * band_h, band_h + 2 * halo), :], scratch, sem)


def _kernel(x_hbm, o_ref, scratch, sem, *, taps: Tuple[float, ...],
            band_h: int, halo: int, w_out: int):
    """Plain blur. x_hbm: (C, Hb + 2*halo, Win) in ANY; o_ref:
    (1, band_h, w_out) VMEM. Win = w_out + 128 so horizontal slices stay in
    range."""
    dma = _start_dma(x_hbm, scratch, sem, band_h, halo)
    dma.start()
    dma.wait()
    o_ref[0, :, :] = _blur_band(scratch, taps, band_h, halo, w_out)




@functools.partial(jax.jit, static_argnames=("sigma", "band_h", "interpret"))
def _gauss_blur_planar(img_chw: jnp.ndarray, sigma: float = 1.0,
                       band_h: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(C, H, W) float32 -> same shape, Gaussian-blurred, edge-replicate
    boundary. Kernel radius = ceil(3*sigma) (matches ops/rl_deblur)."""
    c, h, w = img_chw.shape
    # Mosaic kernels only compile for TPU; run interpreted elsewhere so the
    # impl='pallas' path stays usable on CPU (tests, dev boxes).
    interpret = interpret or jax.default_backend() != "tpu"
    taps = _taps(sigma)
    r = (len(taps) - 1) // 2
    halo = _round_up(r, 8)               # row halo on the sublane tiling
    hb = _round_up(h, band_h)
    w_out = _round_up(w, 128)
    w_in = w_out + 128                   # room for the 2r horizontal slack

    x = jnp.pad(img_chw.astype(jnp.float32),
                ((0, 0), (halo, halo + hb - h), (r, r)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, w_in - (w + 2 * r))))

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, band_h=band_h, halo=halo,
                          w_out=w_out),
        out_shape=jax.ShapeDtypeStruct((c, hb, w_out), jnp.float32),
        grid=(c, hb // band_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, band_h, w_out), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band_h + 2 * halo, w_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out[:, :h, :w]


def gauss_blur_pallas(img_hwc: jnp.ndarray, sigma: float = 1.0,
                      band_h: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(H, W, C) float32 -> same shape. HWC wrapper over the planar kernel."""
    chw = jnp.transpose(img_hwc, (2, 0, 1))
    out = _gauss_blur_planar(chw, sigma=sigma, band_h=band_h,
                             interpret=interpret)
    return jnp.transpose(out, (1, 2, 0))


@functools.partial(jax.jit,
                   static_argnames=("sigma", "iterations", "band_h", "interpret"))
def rl_deblur_pallas(img_hwc: jnp.ndarray, sigma: float = 1.0,
                     iterations: int = 10, band_h: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """Richardson-Lucy deconvolution with the pallas blur as the inner op
    (semantics of ops/rl_deblur.rl_deblur, dt=1). Runs planar internally:
    one HWC<->CHW transpose pair total, not per blur."""
    d = jnp.maximum(jnp.transpose(img_hwc, (2, 0, 1)).astype(jnp.float32), 0.0)
    eps = 1e-8
    blur = functools.partial(_gauss_blur_planar, sigma=sigma, band_h=band_h,
                             interpret=interpret)

    def body(_, u):
        est = blur(u)
        corr = blur(d / jnp.maximum(est, eps))
        return u * corr

    out = jax.lax.fori_loop(0, iterations, body, d)
    return jnp.transpose(out, (1, 2, 0))
