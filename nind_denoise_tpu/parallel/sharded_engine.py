"""Multi-chip tile-parallel inference over a jax.sharding.Mesh.

The image analog of sequence/context parallelism (SURVEY.md §5.7), laid out
for real scale-out:

* **Row-band ownership.** Tiles are split row-major into equal contiguous
  chunks, one per device (±1 tile). Each device receives ONLY the padded
  input rows its tiles read (a band of height ``(rows_span-1)*stride + cs``)
  and accumulates into a LOCAL canvas band of height
  ``(rows_span-1)*stride + ucs`` — never the full canvas.
* **Zero collectives.** Tiles are disjoint and halos are read-only from the
  source band, so no inter-chip exchange happens at all; adjacent bands
  overlap by the ``ol``-row feather strip, merged once on the host after the
  single download.
* **One dispatch per image.** Each device loops over its tiles in rounds of
  ``tiles_per_device`` inside one compiled program (``lax.fori_loop``), so
  the host does exactly one upload, one step call, one download.

Communication moved per image is therefore proportional to the canvas, not
canvas x rounds: uploads = padded image + (ndev-1) band overlaps of
``cs - stride`` rows; downloads = canvas + (ndev-1) overlaps of ``ol`` rows.
``last_bytes_uploaded``/``last_bytes_downloaded`` record the actual totals
(excluding the one-time replicated parameters).

Per-chip HBM for a 24 MP canvas (4000x6000, UtNet cs=504/ucs=480/ol=6,
8 chips): input band ~ (2*474+504) x 6024 x 3 fp32 ~ 105 MB, output band
~ (474+480) x 6000 x 3 fp32 ~ 69 MB, params 124 MB -> ~0.3 GB/chip vs the
previous design's full padded image + full canvas + psum buffers per chip
(~0.9 GB) and an all-reduce per round.

For directory workloads (``--nightmode`` batch: embarrassingly parallel
across images) the same program runs per image; multi-host pods would
additionally split the image list across processes.

Tested on the virtual 8-device CPU mesh; runs unchanged on real multi-chip
slices.
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
from ..engine.tile_engine import _bucket  # shared round-up-to-multiple

# program-reuse granularity (CLAUDE.md invariant: compiled programs are
# keyed by bucketed shapes so a mixed-resolution directory or serving
# workload shares programs instead of paying a fresh 30s-15min remote
# compile per unique image size). Finer than the single-device engine's
# 512 because band zero-padding is uploaded over the (wire-bound) link:
# <= 255 extra columns + <= 63 extra band rows per image.
W_BUCKET = 256
H_BUCKET = 64


class ShardedTileDenoiser:
    """Denoise one image with tiles split across all mesh devices.

    ``apply_fn(params, tiles_nhwc) -> tiles_nhwc`` as in engine.TileEngine.
    ``tiles_per_device`` is the per-round dispatch width on each device
    (the model batch dimension inside the compiled loop).
    """

    def __init__(self, apply_fn: Callable, params, cs: int, ucs: int,
                 ol: int = 6, tiles_per_device: int = 2,
                 compute_dtype: str = "float32", mesh: Optional[Mesh] = None,
                 axis: str = "data", max_subpixels: Optional[int] = None):
        from . import mesh as pmesh

        self.apply_fn = apply_fn
        self.cs, self.ucs, self.ol = cs, ucs, ol
        self.pad = (cs - ucs) // 2
        self.tpd = tiles_per_device
        self.max_subpixels = max_subpixels
        # int8 quantizes inside the forward; the band/canvas boundary stays bf16
        self.cdt = (jnp.float32 if compute_dtype == "float32"
                    else jnp.bfloat16)
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.axis = axis
        self.ndev = self.mesh.devices.size
        self.params = pmesh.replicate_tree(self.mesh, params)
        self._step_cache = {}
        self.last_bytes_uploaded = 0
        self.last_bytes_downloaded = 0

    def _step(self, band_h_in, band_h_out, w_in, w_out, channels, ntiles_dev):
        """All shape arguments arrive BUCKETED (denoise_hwc); the round
        count is a runtime argument, so the compiled program is shared by
        every image whose bucketed shapes match."""
        key = (band_h_in, band_h_out, w_in, w_out, channels, ntiles_dev)
        if key in self._step_cache:
            return self._step_cache[key]
        pad, ucs, cs, ol, tpd = self.pad, self.ucs, self.cs, self.ol, self.tpd
        axis = self.axis

        def local_step(params, band_in, coords, specs, nrounds):
            """Per-device: loop over this device's tiles in rounds of tpd,
            gather + forward + weighted scatter into the LOCAL canvas band.
            coords are (y, x) offsets valid for BOTH the input band (padded
            coords) and the output band (canvas coords) — the band starts
            line up by construction (see denoise_hwc). ``nrounds`` is
            traced (dynamic trip count): descriptor slots past the real
            tile count are never executed."""
            band_in = band_in[0]      # (band_h_in, w_in, C)
            coords = coords[0]        # (ntiles_dev, 2)
            specs = specs[0]          # (ntiles_dev, 6)
            canvas = jnp.zeros((band_h_out, w_out, channels), jnp.float32)
            # the fresh canvas is device-invariant until local tiles land in
            # it; mark it varying so the fori_loop carry types agree
            if hasattr(lax, "pcast"):
                canvas = lax.pcast(canvas, (axis,), to="varying")

            def round_body(rr, cv):
                c = lax.dynamic_slice(coords, (rr * tpd, 0), (tpd, 2))
                s = lax.dynamic_slice(specs, (rr * tpd, 0), (tpd, 6))
                slabs = device_stitch.forward_round(
                    self.apply_fn, params, band_in, c, s, cs=cs, ucs=ucs,
                    pad=pad, ol=ol, compute_dtype=self.cdt)
                return device_stitch.scatter_add_slabs(cv, slabs, c, ucs)

            canvas = lax.fori_loop(0, nrounds, round_body, canvas)
            return canvas[None]

        fn = shard_map(
            local_step, mesh=self.mesh,
            in_specs=(P(), P(self.axis), P(self.axis), P(self.axis), P()),
            out_specs=P(self.axis),
        )
        jitted = jax.jit(fn)
        self._step_cache[key] = jitted
        return jitted

    def denoise_hwc(self, img_hwc: np.ndarray) -> np.ndarray:
        h, w, c = img_hwc.shape
        if self.max_subpixels is not None and \
                self.tpd * self.cs * self.cs * c > self.max_subpixels:
            raise RuntimeError(
                f"ShardedTileDenoiser: per-device batch of "
                f"{self.tpd * self.cs * self.cs * c} subpixels exceeds "
                f"max_subpixels={self.max_subpixels}")
        plan = TilePlan(h, w, self.cs, self.ucs, self.ol)
        padded = plan.pad_image(np.ascontiguousarray(img_hwc, np.float32))
        ndev, stride, ucs, cs = self.ndev, plan.stride, self.ucs, self.cs
        row_w = plan.iperhl + 1

        # equal row-major tile chunks per device (±1 tile balance)
        per_dev = math.ceil(plan.ntiles / ndev)
        per_dev = math.ceil(per_dev / self.tpd) * self.tpd  # whole rounds
        chunks = [list(range(d * per_dev, min((d + 1) * per_dev, plan.ntiles)))
                  for d in range(ndev)]
        # band height covers the widest row span any device's chunk needs
        spans = [(ch[-1] // row_w) - (ch[0] // row_w) + 1 for ch in chunks if ch]
        span_max = max(spans)
        band_h_in = (span_max - 1) * stride + cs
        band_h_out = band_h_in - 2 * self.pad   # == (span_max-1)*stride + ucs
        # padded height = grid_h + 2*pad, so the clamp below keeps the input
        # and output bands aligned: both start at `start` in their own coords
        assert padded.shape[0] == plan.grid_h + 2 * self.pad

        # bucketed program shapes: zero-padding past the real extents is
        # never read (gathers stay within the real band) nor written
        # (scatter coords stay within the real canvas span)
        bh_in_b = _bucket(band_h_in, H_BUCKET)
        bh_out_b = bh_in_b - 2 * self.pad
        w_in_b = _bucket(padded.shape[1], W_BUCKET)
        w_out_b = _bucket(plan.grid_w, W_BUCKET)
        slots = _bucket(per_dev, self.tpd * 4)  # descriptor-array capacity

        starts = np.zeros(ndev, np.int32)
        bands_in = np.zeros((ndev, bh_in_b, w_in_b, c), np.float32)
        coords = np.zeros((ndev, slots, 2), np.int32)
        specs = np.zeros((ndev, slots, 6), np.int32)
        for d, ch in enumerate(chunks):
            if not ch:
                continue  # all-dummy device: zero band, zero-weight specs
            r_first = ch[0] // row_w
            start = min(stride * r_first, plan.grid_h - band_h_out)
            starts[d] = start
            bands_in[d, :band_h_in, :padded.shape[1]] = \
                padded[start:start + band_h_in]
            cds, sps = plan.tile_specs_arrays(ch)
            cds[:, 0] -= start  # band-local y for gather AND scatter
            coords[d, :len(ch)] = cds
            specs[d, :len(ch)] = sps

        sh = NamedSharding(self.mesh, P(self.axis))
        bands_dev = jax.device_put(bands_in, sh)
        coords_dev = jax.device_put(coords, sh)
        specs_dev = jax.device_put(specs, sh)
        self.last_bytes_uploaded = bands_in.nbytes + coords.nbytes + specs.nbytes

        step = self._step(bh_in_b, bh_out_b, w_in_b, w_out_b, c, slots)
        bands_out = np.asarray(step(self.params, bands_dev, coords_dev,
                                    specs_dev,
                                    jnp.int32(per_dev // self.tpd)))
        self.last_bytes_downloaded = bands_out.nbytes

        out = np.zeros((plan.grid_h, plan.grid_w, c), np.float32)
        for d, ch in enumerate(chunks):
            if not ch:
                continue
            # adjacent bands overlap only in the ol-row feather strips; the
            # += merges them (each strip was pre-halved by the masks)
            out[starts[d]:starts[d] + band_h_out] += \
                bands_out[d, :band_h_out, :plan.grid_w]
        return out[:h, :w]
