"""Device-side tile gather / feather-mask / scatter-add primitives.

The on-device formulation of core/tiles.py's stitch semantics
(make_seamless_edges + useful-region crop, reference
/root/reference/src/nind_denoise/denoise_image.py:204-213,267), shared by
the single-chip TileEngine, the row-band ShardedTileDenoiser, and the
image-per-device DeviceBatchDenoiser so the three engines cannot drift.

Masks are built from six per-tile int32 scalars (broadcasted_iota compares —
zero wire cost): ``[useful_h, useful_w, left, top, right, bottom]``, where a
zero row denotes a dummy tile (mask all-zero, contributes nothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gather_tile(padded_hwc, yx, cs: int):
    """cs x cs tile at padded coords (y, x)."""
    return lax.dynamic_slice(padded_hwc, (yx[0], yx[1], 0),
                             (cs, cs, padded_hwc.shape[2]))


def feather_mask(spec, ucs: int, ol: int):
    """(6,) int32 -> (ucs, ucs, 1) fp32 feather/validity mask
    (core/tiles.py weight_mask semantics, built on device)."""
    h, w, left, top, right, bottom = (spec[i] for i in range(6))
    r = lax.broadcasted_iota(jnp.int32, (ucs, ucs), 0)
    c = lax.broadcasted_iota(jnp.int32, (ucs, ucs), 1)
    m = ((r < h) & (c < w)).astype(jnp.float32)
    half, one = jnp.float32(0.5), jnp.float32(1.0)
    m = m * jnp.where((left == 1) & (c < ol), half, one)
    m = m * jnp.where((top == 1) & (r < ol), half, one)
    m = m * jnp.where((right == 1) & (c >= w - ol) & (c < w), half, one)
    m = m * jnp.where((bottom == 1) & (r >= h - ol) & (r < h), half, one)
    return m[..., None]


def scatter_add_slabs(canvas, slabs, coords, ucs: int):
    """Accumulate (B, ucs, ucs, C) pre-masked slabs into the canvas at
    per-tile (y, x) origins (sequential: slabs may overlap in the feather
    strips, so a vectorized scatter would race)."""

    def body(i, cv):
        y0, x0 = coords[i, 0], coords[i, 1]
        cur = lax.dynamic_slice(cv, (y0, x0, 0), (ucs, ucs, cv.shape[2]))
        return lax.dynamic_update_slice(cv, cur + slabs[i], (y0, x0, 0))

    return lax.fori_loop(0, coords.shape[0], body, canvas)


def forward_round(apply_fn, params, padded_hwc, coords, specs, *,
                  cs: int, ucs: int, pad: int, ol: int, compute_dtype):
    """Gather a tile batch at ``coords``, forward, crop to the useful slab,
    apply feather masks -> (B, ucs, ucs, C) fp32 slabs ready to scatter."""
    tiles = jax.vmap(lambda yx: gather_tile(padded_hwc, yx, cs))(coords)
    y = apply_fn(params, tiles.astype(compute_dtype))
    masks = jax.vmap(lambda s: feather_mask(s, ucs, ol))(specs)
    return y[:, pad:pad + ucs, pad:pad + ucs, :].astype(jnp.float32) * masks
