"""Image-per-device batch inference: the directory/nightmode scale-out.

SURVEY.md §2.9 calls the ``--nightmode`` directory batch "embarrassingly
parallel across images"; this engine is that statement made executable. A
batch of same-shaped images shards one-image-per-device over a 1-D mesh
(``shard_map``); every device runs the identical tile loop over ITS image
(same grid, so coords/specs are closed-over constants — pure SPMD, zero
collectives), accumulates its own canvas, and the host gets back the
batch with the image axis still sharded.

Compared with row-band tile parallelism (sharded_engine.py) this moves no
overlap rows at all and needs no host-side band merge; it is the better
scale-out whenever the workload has >= ndev images of one shape (the
directory case). The denoise output stays device-resident and sharded, so
downstream batched post-ops (RL-deblur, quantize) run data-parallel on the
same mesh without any resharding.

The reference processes directories strictly serially
(/root/reference/src/denoise.py:491-500); it has no multi-device analog.
"""

from __future__ import annotations

import math
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
from ..engine import device_stitch
from ..engine.tile_engine import _bucket as _shared_bucket


class DeviceBatchDenoiser:
    """Denoise a batch of same-shaped images, one image per mesh device.

    ``apply_fn(params, tiles_nhwc) -> tiles_nhwc`` as in engine.TileEngine.
    ``tiles_per_dispatch`` is the model batch dimension inside each device's
    compiled tile loop.
    """

    def __init__(self, apply_fn: Callable, params, cs: int, ucs: int,
                 ol: int = 6, tiles_per_dispatch: int = 4,
                 compute_dtype: str = "float32", mesh: Optional[Mesh] = None,
                 axis: str = "data"):
        from . import mesh as pmesh

        self.apply_fn = apply_fn
        self.cs, self.ucs, self.ol = cs, ucs, ol
        self.pad = (cs - ucs) // 2
        self.tpd = tiles_per_dispatch
        # int8 quantizes inside the forward; the band/canvas boundary stays bf16
        self.cdt = (jnp.float32 if compute_dtype == "float32"
                    else jnp.bfloat16)
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.axis = axis
        self.ndev = self.mesh.devices.size
        self.params = pmesh.replicate_tree(self.mesh, params)
        self._step_cache = {}

    def _step(self, hp_b: int, wp_b: int, grid_hb: int, grid_wb: int,
              ntb: int, channels: int, dtype):
        """One compiled program per BUCKETED shape tuple (the CLAUDE.md
        invariant: programs keyed by bucketed extents, shapes padded with
        zero-weight dummy tiles), with coords/specs as runtime arguments —
        a directory of mixed image sizes reuses programs instead of paying
        a 30s-15min remote compile per exact shape."""
        key = (hp_b, wp_b, grid_hb, grid_wb, ntb, channels, str(dtype))
        if key in self._step_cache:
            return self._step_cache[key]
        tpd, cs, ucs, pad, ol, axis = (self.tpd, self.cs, self.ucs, self.pad,
                                       self.ol, self.axis)

        def local_step(params, padded, inv_scale, coords, specs, nrounds):
            """One device: the full tile loop over its own image. coords
            (ntb, 2) / specs (ntb, 6) arrive replicated (P() in_specs →
            full arrays locally; zero spec row = dummy tile). ``nrounds``
            is a TRACED scalar (like sharded_engine): the bucketed tile
            capacity ntb sizes the arrays, but only ceil(ntiles/tpd) rounds
            actually run — a 4-tile image on tpd=1 runs 4 forwards, not the
            8 the bucket would imply."""
            padded = padded[0]   # (hp_b, wp_b, C) storage dtype
            canvas = jnp.zeros((grid_hb, grid_wb, channels), jnp.float32)
            if hasattr(lax, "pcast"):  # fresh canvas is device-invariant
                canvas = lax.pcast(canvas, (axis,), to="varying")

            def round_body(rr, cv):
                c = lax.dynamic_slice(coords, (rr * tpd, 0), (tpd, 2))
                s = lax.dynamic_slice(specs, (rr * tpd, 0), (tpd, 6))
                norm = lambda p, t: self.apply_fn(
                    p, t * inv_scale.astype(self.cdt))
                slabs = device_stitch.forward_round(
                    norm, params, padded, c, s, cs=cs, ucs=ucs, pad=pad,
                    ol=ol, compute_dtype=self.cdt)
                return device_stitch.scatter_add_slabs(cv, slabs, c, ucs)

            canvas = lax.fori_loop(0, nrounds, round_body, canvas)
            return canvas[None]

        fn = shard_map(local_step, mesh=self.mesh,
                       in_specs=(P(), P(self.axis), P(), P(), P(), P()),
                       out_specs=P(self.axis))
        jitted = jax.jit(fn)
        self._step_cache[key] = jitted
        return jitted

    # the single-device engine's bucketing, so the two program-reuse
    # granularities can never desynchronize
    _bucket = staticmethod(_shared_bucket)

    def denoise_batch(self, imgs: np.ndarray, scale: float = 1.0,
                      keep_padded: bool = False):
        """(B, H, W, C) storage-dtype images -> (B, H, W, C) fp32 device
        array with the image axis sharded over the mesh. ``scale`` divides
        to [0, 1] on device (255 / 65535 / 1.0). B must be <= ndev; short
        batches pad with dummy images (cropped off in the result).

        ``keep_padded=True`` returns ``(full_ndev_array, B)`` instead of
        slicing the batch axis, so downstream shard_map post-ops (e.g.
        ``rl_deblur_sharded``) keep the mesh-divisible image axis; the
        spatial dims are already cropped to (H, W) either way.
        """
        b, h, w, c = imgs.shape
        if b > self.ndev:
            raise ValueError(f"batch {b} exceeds mesh size {self.ndev}; "
                             f"chunk the batch (see denoise_many)")
        plan = TilePlan(h, w, self.cs, self.ucs, self.ol)
        padded = np.stack([plan.pad_image(imgs[i]) for i in range(b)])
        if b < self.ndev:  # pad the batch so the image axis divides the mesh
            # zero dummies compress on the wire. NOTE the network output on a
            # zero image is NOT zero (biases/PReLU) and any post-op (RL) does
            # full work on it per-device; correctness relies solely on the
            # final out[:b] crop discarding the dummy devices' results.
            padded = np.concatenate(
                [padded, np.zeros((self.ndev - b,) + padded.shape[1:],
                                  padded.dtype)])
        # bucket spatial extents + tile count so programs are shared
        hp_b, wp_b = self._bucket(padded.shape[1]), self._bucket(padded.shape[2])
        padded = np.pad(padded, ((0, 0), (0, hp_b - padded.shape[1]),
                                 (0, wp_b - padded.shape[2]), (0, 0)))
        ntb = math.ceil(plan.ntiles / (8 * self.tpd)) * 8 * self.tpd
        coords_np = np.zeros((ntb, 2), np.int32)
        specs_np = np.zeros((ntb, 6), np.int32)
        cds, sps = plan.tile_specs_arrays(range(plan.ntiles))
        # gather coords are in the padded-image frame: tile (y, x) origin
        # equals its canvas origin there (pad_top == pad == receptive pad)
        coords_np[:plan.ntiles] = cds
        specs_np[:plan.ntiles] = sps
        grid_hb, grid_wb = self._bucket(plan.grid_h), self._bucket(plan.grid_w)

        sh = NamedSharding(self.mesh, P(self.axis))
        repl = NamedSharding(self.mesh, P())
        padded_dev = jax.device_put(padded, sh)
        coords_dev = jax.device_put(coords_np, repl)
        specs_dev = jax.device_put(specs_np, repl)
        step = self._step(hp_b, wp_b, grid_hb, grid_wb, ntb, c, padded.dtype)
        nrounds = -(-plan.ntiles // self.tpd)  # real rounds, not ntb // tpd
        out = step(self.params, padded_dev, jnp.asarray(1.0 / scale, self.cdt),
                   coords_dev, specs_dev, jnp.asarray(nrounds, jnp.int32))
        out = out[:, :h, :w]  # trivial slice program; the tile loop is shared
        return (out, b) if keep_padded else out[:b]

    def denoise_many(self, imgs: np.ndarray, scale: float = 1.0) -> np.ndarray:
        """Arbitrary-length same-shape batch: chunks of ndev images through
        ``denoise_batch``, fetched to host fp32."""
        outs = []
        for i0 in range(0, imgs.shape[0], self.ndev):
            outs.append(np.asarray(
                self.denoise_batch(imgs[i0:i0 + self.ndev], scale)))
        return np.concatenate(outs)


_RL_SHARDED_CACHE: dict = {}


def rl_deblur_sharded(imgs_dev, sigma: float, iterations: int, mesh: Mesh,
                      axis: str = "data", impl: str = "auto",
                      psf: str = "gaussian"):
    """RL-deblur a (ndev, H, W, C) image-axis-sharded batch: each device
    runs the SINGLE-image RL path on its local image — on TPU, ``auto``
    resolves to the fused per-iteration Pallas kernel (2.26x the XLA path)
    PER DEVICE, which the plain batched 4-D call cannot use (it is
    HWC-only). Zero collectives; output keeps the sharding."""
    from ..ops import rl_deblur

    # Mesh is hashable: keying on the object (not id()) avoids silent
    # id-reuse if entries are ever evicted/weakened
    key = (mesh, imgs_dev.shape, float(sigma), int(iterations), impl, psf)
    fn = _RL_SHARDED_CACHE.get(key)
    if fn is None:
        def local(x):  # (1, H, W, C) per device
            return rl_deblur.rl_deblur(x[0], float(sigma), int(iterations),
                                       impl=impl, psf=psf)[None]

        fn = jax.jit(shard_map(local, mesh=mesh, in_specs=P(axis),
                               out_specs=P(axis)))
        _RL_SHARDED_CACHE[key] = fn
    return fn(imgs_dev)
