"""Tiled inference engine: fixed-shape XLA programs + on-device stitching.

This replaces the reference's per-tile host loop
(/root/reference/src/nind_denoise/denoise_image.py:240-267, which crosses the
host<->device boundary twice per tile and accumulates on a host canvas) with
a TPU-native design:

* ONE compiled program per (batch, cs) shape: model forward over a tile
  batch, feather-weight multiply, and scatter-add into an HBM-resident fp32
  canvas, all inside jit (donated canvas -> in-place update).
* Host work is only decode + symmetric pad + tile gather; dispatch is async,
  so gather of batch k+1 overlaps device compute of batch k. The canvas
  crosses back to the host once, at the end.
* Partial final batches are padded with zero-weight dummy tiles instead of
  recompiling.
* ``compute_dtype`` bfloat16 (default) halves HBM traffic; convs accumulate
  fp32 (ops/conv.py). ``precision='float32'`` runs fp32 activations with
  highest matmul precision for PSNR-parity work.

Output semantics match the reference: NO clipping of network outputs before
the fp32 write (denoise_image.py:246,267-270); 8/16-bit writers clip at
encode time (core/imgio.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import tiles as tiles_mod
from ..core.tiles import TilePlan, default_cs_ucs


class TileEngine:
    """Denoise arbitrarily-sized images through a fixed-shape tile program.

    ``apply_fn(params, x_nhwc) -> y_nhwc`` is the generator forward (e.g.
    ``UtNet.apply`` closed over its activation).
    """

    def __init__(self, apply_fn: Callable, params, cs: int, ucs: int,
                 ol: int = tiles_mod.DEFAULT_OVERLAP, batch_size: int = 4,
                 compute_dtype: str = "bfloat16", precision: str = "default",
                 max_subpixels: Optional[int] = None):
        self.apply_fn = apply_fn
        self.cs, self.ucs, self.ol = cs, ucs, ol
        self.pad = (cs - ucs) // 2
        self.batch_size = batch_size
        self.compute_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.precision = precision
        self.max_subpixels = max_subpixels
        self.params = jax.device_put(params)
        self._step = jax.jit(self._make_step(), donate_argnums=(1,))
        self._whole = None  # lazily jitted whole-image program per shape

    # -- compiled programs ----------------------------------------------------

    def _make_step(self):
        pad, ucs = self.pad, self.ucs
        cdt = self.compute_dtype
        prec = self.precision

        def step(params, canvas, tile_batch, coords, wmasks):
            """canvas: (Hg, Wg, C) fp32 (donated). tile_batch: (B, cs, cs, C).
            coords: (B, 2) int32 [y0, x0]. wmasks: (B, ucs, ucs, 1) fp32."""
            x = tile_batch.astype(cdt)
            if prec == "float32":
                with jax.default_matmul_precision("highest"):
                    y = self.apply_fn(params, x)
            else:
                y = self.apply_fn(params, x)
            slab = y[:, pad:pad + ucs, pad:pad + ucs, :].astype(jnp.float32) * wmasks

            def body(i, cv):
                y0 = coords[i, 0]
                x0 = coords[i, 1]
                cur = lax.dynamic_slice(cv, (y0, x0, 0), (ucs, ucs, cv.shape[2]))
                return lax.dynamic_update_slice(cv, cur + slab[i], (y0, x0, 0))

            return lax.fori_loop(0, tile_batch.shape[0], body, canvas)

        return step

    # -- public API -----------------------------------------------------------

    def plan_for(self, height: int, width: int) -> TilePlan:
        return TilePlan(height, width, self.cs, self.ucs, self.ol)

    def denoise_chw(self, img_chw: np.ndarray, progress: bool = False) -> np.ndarray:
        """(3, H, W) float32 -> (3, H, W) float32 (unclipped)."""
        out = self.denoise_hwc(np.ascontiguousarray(img_chw.transpose(1, 2, 0)),
                               progress=progress)
        return out.transpose(2, 0, 1)

    def denoise_hwc(self, img_hwc: np.ndarray, progress: bool = False) -> np.ndarray:
        h, w, c = img_hwc.shape
        plan = self.plan_for(h, w)
        padded = plan.pad_image(img_hwc)
        canvas = jnp.zeros((plan.grid_h, plan.grid_w, c), jnp.float32)
        bsz = self.batch_size
        nb = math.ceil(plan.ntiles / bsz)
        for k, batch in enumerate(plan.batches(bsz)):
            tb = plan.gather(padded, batch)
            if self.max_subpixels is not None and tb.size > self.max_subpixels:
                raise RuntimeError(
                    f"TileEngine: batch of {tb.size} subpixels exceeds "
                    f"max_subpixels={self.max_subpixels}")
            wm = plan.weight_masks(batch)
            coords = np.array([[plan.spec(i).abs_y0, plan.spec(i).abs_x0]
                               for i in batch], dtype=np.int32)
            npad = bsz - len(batch)
            if npad:  # zero-weight dummy tiles keep the compiled shape fixed
                tb = np.concatenate([tb, np.zeros((npad, *tb.shape[1:]), tb.dtype)])
                wm = np.concatenate([wm, np.zeros((npad, *wm.shape[1:]), wm.dtype)])
                coords = np.concatenate([coords, np.zeros((npad, 2), np.int32)])
            canvas = self._step(self.params, canvas, jnp.asarray(tb),
                                jnp.asarray(coords), jnp.asarray(wm))
            if progress:
                print(f"{k}/{nb}")
        return np.asarray(jax.block_until_ready(canvas))[:h, :w]

    def denoise_whole(self, img_chw: np.ndarray, pad: int = 0) -> np.ndarray:
        """Whole-image mode (reference --whole_image --pad,
        denoise_image.py:196-197): one forward at full size, side-mirror
        padding with zero corners, crop back."""
        padded = tiles_mod.whole_image_pad(img_chw, pad) if pad else img_chw.astype(np.float32)
        x = jnp.asarray(padded.transpose(1, 2, 0))[None].astype(self.compute_dtype)
        y = jax.jit(self.apply_fn)(self.params, x)
        y = np.asarray(y[0]).astype(np.float32).transpose(2, 0, 1)
        if pad:
            y = y[:, pad:-pad, pad:-pad]
        return y


def make_engine(network: str, params, cs: Optional[int] = None,
                ucs: Optional[int] = None, activation: str = "PReLU",
                **kwargs) -> TileEngine:
    """Convenience constructor resolving per-arch tile defaults
    (autodetect_network_cs_ucs parity, denoise_image.py:59-79)."""
    from ..models import get_network

    net = get_network(network)
    if cs is None or ucs is None:
        cs, ucs = default_cs_ucs(network)
    if hasattr(net, "check_cs"):
        net.check_cs(cs)

    if network == "UtNet":
        apply_fn = partial(net.apply, activation=activation)
    elif network == "UNet":
        # eval-mode UNet: thread the BN state, discard updates
        params, state = params if isinstance(params, tuple) else (params, None)
        if state is None:
            raise ValueError("UNet engine requires (params, state) with BN stats")
        apply_fn = lambda p, x: net.apply(p, x, state, train=False)[0]
    else:
        raise ValueError(f"make_engine: unsupported generator {network}")
    return TileEngine(apply_fn, params, cs, ucs, **kwargs)
