"""Pallas TPU kernel: separable Gaussian blur (the RL-deblur hot op).

The lax path (ops/rl_deblur._blur) runs two depthwise convolutions per blur;
on TPU each is an HBM sweep. This kernel fuses the vertical and horizontal
passes in VMEM over row bands, one HBM read + one write per blur:

* Layout trick: channels are flattened into the lane dimension —
  the image (H, W, C) becomes (H, W*C); a horizontal shift by k pixels is a
  lane shift by k*C, so both passes are static-offset slice-adds over a 2D
  block (taps unrolled; the Gaussian kernel weights are compile-time
  constants).
* Grid over row bands of ``band_h`` rows; each program reads its band plus
  a 2*radius halo (overlapping input blocks), computes, and writes the band.
* The host wrapper pads with edge-replication (neumann, matching gmic/lax
  path) and rounds H up to a band multiple.

Falls back to interpret mode off-TPU (tests run it on CPU).

STATUS: numerically validated (interpret mode + exact fp32 arithmetic; the
lax conv path uses the TPU's default bf16-multiply precision and differs by
~3e-3). On the current deployment runtime the channel-interleaved lane
shifts compile pathologically slowly through the remote-compile service, so
``ops/rl_deblur`` (XLA convs, ~266 ms for 10 iterations at 6 MP) remains the
production path; this kernel is the precision-reference / future-perf
implementation. A layout with W on the sublane axis is the planned fix.
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


def _kernel(x_hbm, o_ref, scratch, sem, *, taps: Tuple[float, ...], c: int,
            band_h: int, w_out_c: int):
    """x_hbm: full (Hb + 2r, (W + 2r) * C) in HBM/ANY; o_ref: (band_h, W*C)
    VMEM block. The band + 2r halo rows are DMA'd into VMEM scratch (row
    bands overlap, which BlockSpec index maps cannot express)."""
    i = pl.program_id(0)
    r = (len(taps) - 1) // 2
    halo = -(-r // 8) * 8  # row halo rounded to the sublane tiling (8)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * band_h, band_h + 2 * halo), :], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]

    def shift_up(arr, d, axis):
        # arr'[j] = arr[j + d]: roll takes non-negative shifts only
        n = arr.shape[axis]
        return arr if d % n == 0 else pltpu.roll(arr, (n - d) % n, axis)

    # vertical pass (sublane rolls) -> rows [0, band_h) hold the sums
    off = halo - r
    v = taps[0] * shift_up(x, off, 0)
    for k in range(1, len(taps)):
        v = v + taps[k] * shift_up(x, off + k, 0)
    # horizontal pass (lane rolls; pixel shift k == lane shift k*C)
    o = taps[0] * v
    for k in range(1, len(taps)):
        o = o + taps[k] * shift_up(v, k * c, 1)
    o_ref[:] = o[0:band_h, 0:w_out_c]  # w_out_c is the 128-padded out width


@functools.partial(jax.jit, static_argnames=("sigma", "band_h", "interpret"))
def gauss_blur_pallas(img_hwc: jnp.ndarray, sigma: float = 1.0,
                      band_h: int = 32, interpret: bool = False) -> jnp.ndarray:
    """(H, W, C) float32 -> same shape, Gaussian-blurred, edge-replicate
    boundary. Kernel radius = ceil(3*sigma) (matches ops/rl_deblur)."""
    h, w, c = img_hwc.shape
    r = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    taps = tuple(float(t) for t in (k / k.sum()).astype(np.float32))

    hb = ((h + band_h - 1) // band_h) * band_h
    halo = -(-r // 8) * 8  # must match the kernel's row halo
    xpad = jnp.pad(img_hwc.astype(jnp.float32),
                   ((halo, halo + hb - h), (r, r), (0, 0)), mode="edge")
    x2d = xpad.reshape(hb + 2 * halo, (w + 2 * r) * c)
    # lane dim of the DMA'd block must be 128-aligned
    wpc = -(-(w + 2 * r) * c // 128) * 128
    x2d = jnp.pad(x2d, ((0, 0), (0, wpc - x2d.shape[1])))

    wopc = -(-w * c // 128) * 128
    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, c=c, band_h=band_h,
                          w_out_c=wopc),
        out_shape=jax.ShapeDtypeStruct((hb, wopc), jnp.float32),
        grid=(hb // band_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((band_h, wopc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band_h + 2 * halo, wpc), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2d)
    return out[:h, :w * c].reshape(h, w, c)


def rl_deblur_pallas(img_hwc: jnp.ndarray, sigma: float = 1.0,
                     iterations: int = 10, band_h: int = 32,
                     interpret: bool = False) -> jnp.ndarray:
    """Richardson-Lucy deconvolution with the pallas blur as the inner op
    (semantics of ops/rl_deblur.rl_deblur, dt=1)."""
    d = jnp.maximum(img_hwc.astype(jnp.float32), 0.0)
    eps = 1e-8
    blur = functools.partial(gauss_blur_pallas, sigma=sigma, band_h=band_h,
                             interpret=interpret)

    def body(_, u):
        est = blur(u)
        corr = blur(d / jnp.maximum(est, eps))
        return u * corr

    return jax.lax.fori_loop(0, iterations, body, d)
