"""Multi-chip tile-parallel inference over a jax.sharding.Mesh.

The image analog of sequence/context parallelism (SURVEY.md §5.7): the
padded source image is replicated (halos are read-only, so no inter-chip
exchange is ever needed); each chip gathers and denoises a disjoint subset
of tiles into its own local canvas; one ``psum`` over the mesh merges the
canvases. XLA inserts the all-reduce over ICI from the shard_map out-spec.

For directory workloads (``--nightmode`` batch: embarrassingly parallel
across images) the same program runs per image; multi-host pods would
additionally split the image list across processes.

Tested on the virtual 8-device CPU mesh; runs unchanged on real multi-chip
slices.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
try:
    from jax import shard_map  # jax >= 0.7 location
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.tiles import TilePlan


class ShardedTileDenoiser:
    """Denoise one image with tiles split across all mesh devices.

    ``apply_fn(params, tiles_nhwc) -> tiles_nhwc`` as in engine.TileEngine.
    """

    def __init__(self, apply_fn: Callable, params, cs: int, ucs: int,
                 ol: int = 6, tiles_per_device: int = 2,
                 compute_dtype: str = "float32", mesh: Optional[Mesh] = None,
                 axis: str = "data"):
        from . import mesh as pmesh

        self.apply_fn = apply_fn
        self.cs, self.ucs, self.ol = cs, ucs, ol
        self.pad = (cs - ucs) // 2
        self.tpd = tiles_per_device
        self.cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.axis = axis
        self.ndev = self.mesh.devices.size
        self.params = pmesh.replicate_tree(self.mesh, params)
        self._step_cache = {}

    def _step(self, canvas_shape):
        key = canvas_shape
        if key in self._step_cache:
            return self._step_cache[key]
        pad, ucs, cs = self.pad, self.ucs, self.cs
        axis = self.axis

        def local_step(params, padded, canvas, coords, specs):
            """Per-device: gather + forward + weighted scatter into the LOCAL
            canvas. coords/specs carry this device's tiles (leading axis)."""
            coords = coords[0]
            specs = specs[0]
            # the replicated canvas becomes device-varying once local tiles
            # are added; mark it so the fori_loop carry types agree
            if hasattr(lax, "pcast"):
                canvas = lax.pcast(canvas, (axis,), to="varying")

            def gather_one(yx):
                return lax.dynamic_slice(padded, (yx[0], yx[1], 0),
                                         (cs, cs, padded.shape[2]))

            tiles = jax.vmap(gather_one)(coords)
            y = self.apply_fn(params, tiles.astype(self.cdt))

            def mask_one(spec):
                h, w, left, top, right, bottom = (spec[i] for i in range(6))
                r = lax.broadcasted_iota(jnp.int32, (ucs, ucs), 0)
                c = lax.broadcasted_iota(jnp.int32, (ucs, ucs), 1)
                m = ((r < h) & (c < w)).astype(jnp.float32)
                half, one = jnp.float32(0.5), jnp.float32(1.0)
                m = m * jnp.where((left == 1) & (c < self.ol), half, one)
                m = m * jnp.where((top == 1) & (r < self.ol), half, one)
                m = m * jnp.where((right == 1) & (c >= w - self.ol) & (c < w), half, one)
                m = m * jnp.where((bottom == 1) & (r >= h - self.ol) & (r < h), half, one)
                return m[..., None]

            masks = jax.vmap(mask_one)(specs)
            slab = y[:, pad:pad + ucs, pad:pad + ucs, :].astype(jnp.float32) * masks

            def body(i, cv):
                y0, x0 = coords[i, 0], coords[i, 1]
                cur = lax.dynamic_slice(cv, (y0, x0, 0), (ucs, ucs, cv.shape[2]))
                return lax.dynamic_update_slice(cv, cur + slab[i], (y0, x0, 0))

            canvas = lax.fori_loop(0, coords.shape[0], body, canvas)
            return lax.psum(canvas, axis)

        fn = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(self.axis), P(self.axis)),
            out_specs=P(),
        )
        jitted = jax.jit(fn)
        self._step_cache[key] = jitted
        return jitted

    def denoise_hwc(self, img_hwc: np.ndarray) -> np.ndarray:
        h, w, c = img_hwc.shape
        plan = TilePlan(h, w, self.cs, self.ucs, self.ol)
        padded_np = plan.pad_image(np.ascontiguousarray(img_hwc, np.float32))
        padded = jax.device_put(padded_np,
                                NamedSharding(self.mesh, P()))
        per_round = self.ndev * self.tpd
        canvas = jnp.zeros((plan.grid_h, plan.grid_w, c), jnp.float32)
        canvas = jax.device_put(canvas, NamedSharding(self.mesh, P()))
        step = self._step((plan.grid_h, plan.grid_w))

        out = np.zeros((plan.grid_h, plan.grid_w, c), np.float32)
        for r0 in range(0, plan.ntiles, per_round):
            batch = list(range(r0, min(r0 + per_round, plan.ntiles)))
            coords, specs = plan.tile_specs_arrays(batch)
            npad = per_round - len(batch)
            if npad:  # zero-weight dummies keep shapes fixed
                coords = np.concatenate([coords, np.zeros((npad, 2), np.int32)])
                specs = np.concatenate([specs, np.zeros((npad, 6), np.int32)])
            # (ndev, tpd, ...) leading axis shards over the mesh
            coords = coords.reshape(self.ndev, self.tpd, 2)
            specs = specs.reshape(self.ndev, self.tpd, 6)
            sh = NamedSharding(self.mesh, P(self.axis))
            result = step(self.params, padded, canvas,
                          jax.device_put(coords, sh), jax.device_put(specs, sh))
            out += np.asarray(result)
        return out[:h, :w]
