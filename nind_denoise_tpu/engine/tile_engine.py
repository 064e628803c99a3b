"""Tiled inference engine: fixed-shape XLA programs, wire-minimal transfers.

This replaces the reference's per-tile host loop
(/root/reference/src/nind_denoise/denoise_image.py:240-267, host<->device
twice per tile, fp32 both ways, host canvas) with a TPU-native design shaped
by two measured constraints of the target deployment: device compute runs at
tens of MP/s while the host<->device link moves ~0.05-0.15 GB/s, and each
compiled shape costs tens of seconds.

* **Upload once, in storage dtype.** The source image crosses the wire one
  time as uint8/uint16 (or fp16 for fp32 TIFF stages); normalization,
  symmetric mirror padding and tile gather all happen on device.
* **All stitching on device.** The fp32 accumulation canvas lives in HBM;
  each step program gathers a tile batch from the padded image
  (vmapped dynamic_slice), runs the generator, builds the feather/useful-
  region weight masks from six per-tile scalars (broadcasted_iota compares —
  zero wire cost), and scatter-adds. The canvas is donated, so XLA updates
  it in place.
* **Download once, quantized.** The finished canvas is cropped and quantized
  on device to the target encoding (uint16 for .png/.tif, uint8 for .jpg,
  fp16/fp32 for .tiff stages) before the single readback.
* **Shape bucketing.** Padded-image and canvas shapes round up to multiples
  of 512 so one compiled step program serves a whole range of image sizes;
  partial final batches pad with zero-weight dummy tiles.

Output semantics match the reference: NO clipping before fp32 writes
(denoise_image.py:246,267-270); integer encodings clip at quantize time like
``tensor_to_imgfile`` (pt_helpers.py:22-40).
"""

from __future__ import annotations

import contextlib
import math
import os
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import tiles as tiles_mod
from ..core.tiles import TilePlan, default_cs_ucs
from . import device_stitch, transfer

BUCKET = 512


def _bucket(n: int, m: int = BUCKET) -> int:
    return ((n + m - 1) // m) * m


class TileEngine:
    """Denoise arbitrarily-sized images through fixed-shape tile programs.

    ``apply_fn(params, x_nhwc) -> y_nhwc`` is the generator forward (e.g.
    ``UtNet.apply`` closed over its activation).
    """

    def __init__(self, apply_fn: Callable, params, cs: int, ucs: int,
                 ol: int = tiles_mod.DEFAULT_OVERLAP, batch_size: int = 4,
                 compute_dtype: str = "bfloat16", precision: str = "default",
                 max_subpixels: Optional[int] = None,
                 debug_dir: Optional[str] = None,
                 size_check=None, device=None):
        self.apply_fn = apply_fn
        # device: optional jax.Device this engine is pinned to. Params are
        # COMMITTED there and every public denoise entry point runs under a
        # thread-local jax.default_device scope, so uploads, canvases, and
        # jit dispatch all stay on that chip. This is how the request-level
        # device pool (parallel/engine_pool) runs one independent engine
        # replica per device with zero cross-device traffic. None (the
        # default) keeps ordinary default-device behavior.
        self._device = device
        self.cs, self.ucs, self.ol = cs, ucs, ol
        self.size_check = size_check  # arch size validator (denoise_tiny)
        self.pad = (cs - ucs) // 2
        self.batch_size = batch_size
        # 'int8' quantizes inside the forward (ops/qconv.py); the tile
        # I/O boundary (normalization, feather masks, canvas) stays bf16
        self.compute_dtype = (jnp.float32 if compute_dtype == "float32"
                              else jnp.bfloat16)
        self.precision = precision
        self.max_subpixels = max_subpixels
        self.debug_dir = debug_dir  # dump noisy/denoised tiles per row (slow)
        # INVARIANT: params are fixed for the engine's lifetime. make_engine
        # pre-composes derived kernels (fastconv) from these params into
        # apply_fn's closure; swapping self._params afterwards would leave
        # those silently stale (ADVICE r2). Build a new engine per checkpoint.
        self._params = jax.device_put(params, device)
        self._step = jax.jit(self._make_step(), donate_argnums=(1,),
                             static_argnames=())
        self._finish = jax.jit(self._finish_fn,
                               static_argnames=("h", "w", "out_dtype"))
        self._band = jax.jit(self._band_fn,
                             static_argnames=("height", "w", "out_dtype"))
        # device-side band assembly: shift the previous input band up by
        # ``stride`` rows and append the freshly-uploaded rows, so each band
        # after the first uploads only stride (not cs) rows — the cs-stride
        # halo (~6% of upload bytes) never crosses the wire
        self._assemble = jax.jit(
            lambda prev, new, stride: jnp.concatenate(
                [prev[stride:], new], axis=0),
            static_argnames=("stride",), donate_argnums=(0,))


    @property
    def params(self):
        """Read-only: see the immutability invariant in __init__."""
        return self._params

    def recalibrate_int8(self, img_hwc, scale: float = 1.0) -> bool:
        """int8_static engines only: re-derive the static activation scales
        on crops of THIS image (ops/qconv.calib_from_image) and swap them
        into the device-resident params bundle — content-matched scales are
        worth +12 dB on dim content vs the synthetic calibration set
        (PERF.md 'int8 engine mode'), and this lets a directory-memoized
        engine deliver that per file.

        This does NOT violate the immutability invariant in __init__: the
        weights and the derived closure stay fixed; the activation scales
        ride as traced leaves of the bundle precisely so they can change
        per image without touching any compiled program (HLO byte-stability
        pinned by tests/test_qconv.py). Returns False (no-op) when the
        engine's apply_fn is not int8_static-resolved."""
        recal = getattr(self.apply_fn, "recalibrate", None)
        if recal is None:
            return False
        from ..ops.qconv import calib_from_image

        # storage-dtype input + scale: only the calibration crops pay the
        # fp32 normalize, not the whole image (raw-dtype fast-path rule)
        bundle = recal(calib_from_image(np.asarray(img_hwc), scale=scale))
        with self._placement():
            self._params = jax.device_put(bundle, self._device)
        return True

    def _placement(self):
        """Thread-local placement scope for this engine's device (see
        ``device`` in __init__); a no-op when unpinned. Must wrap every
        code path that creates device arrays (jnp.zeros/asarray and the
        lazy device_put inside transfer._PutFuture.result all run on the
        calling thread)."""
        return (jax.default_device(self._device) if self._device is not None
                else contextlib.nullcontext())

    # -- compiled programs ----------------------------------------------------

    def _make_step(self):
        pad, ucs, cs, ol = self.pad, self.ucs, self.cs, self.ol
        prec = self.precision
        cdt = self.compute_dtype

        def step(params, canvas, band, inv_scale, gcoords, scoords, specs):
            """canvas (Hg, Wg, C) fp32, donated. band (bh, Wb, C) storage
            dtype (a padded row band; normalization is fused here). gcoords
            (B, 2) int32 gather origins in the band frame; scoords (B, 2)
            int32 scatter origins in the canvas frame. specs (B, 6) int32
            mask descriptors (zero row = dummy tile). Gather/mask/scatter
            primitives are shared with the parallel engines
            (engine/device_stitch.py) so the three cannot drift."""
            norm = lambda p, t: self.apply_fn(p, t * inv_scale.astype(cdt))
            if prec == "float32":
                base = norm

                def norm(p, t):
                    with jax.default_matmul_precision("highest"):
                        return base(p, t)

            slabs = device_stitch.forward_round(
                norm, params, band, gcoords, specs, cs=cs, ucs=ucs, pad=pad,
                ol=ol, compute_dtype=cdt)
            return device_stitch.scatter_add_slabs(canvas, slabs, scoords, ucs)

        return step

    @staticmethod
    def _quantize(out, out_dtype):
        if out_dtype == "uint16":
            return jnp.round(jnp.clip(out, 0, 1) * 65535).astype(jnp.uint16)
        if out_dtype == "uint8":
            return jnp.round(jnp.clip(out, 0, 1) * 255).astype(jnp.uint8)
        if out_dtype == "float16":
            return out.astype(jnp.float16)
        return out

    @staticmethod
    def _band_fn(canvas, start, height, w, out_dtype):
        """Quantize one finished row band (static height/width, dynamic
        start) so its fetch can overlap remaining compute."""
        band = lax.dynamic_slice(canvas, (start, 0, 0),
                                 (height, w, canvas.shape[2]))
        return TileEngine._quantize(band, out_dtype)

    @staticmethod
    def _finish_fn(canvas, h, w, out_dtype):
        return TileEngine._quantize(canvas[:h, :w], out_dtype)

    # -- public API -----------------------------------------------------------

    def plan_for(self, height: int, width: int) -> TilePlan:
        return TilePlan(height, width, self.cs, self.ucs, self.ol)

    @staticmethod
    def _reflect_rows(j0: int, n: int, height: int) -> np.ndarray:
        """Symmetric (edge-duplicating) row indices [j0, j0+n) into [0, H)."""
        j = np.arange(j0, j0 + n)
        m = np.mod(j, 2 * height)
        return np.where(m < height, m, 2 * height - 1 - m)

    def _build_band(self, raw_hwc: np.ndarray, plan: TilePlan, r: int,
                    wb: int) -> np.ndarray:
        """Host: padded input band for tile row ``r`` -> (cs, wb, C) in the
        storage dtype. Vertical symmetric reflection via an index gather;
        horizontal symmetric pad + zero pad to the bucket width."""
        rows = self._reflect_rows(r * plan.stride - plan.pad, self.cs, plan.H)
        band = raw_hwc[rows]
        return self._pad_rows(band, plan, wb)

    @staticmethod
    def _pad_rows(band: np.ndarray, plan: TilePlan, wb: int) -> np.ndarray:
        band = np.pad(band, ((0, 0), (plan.pad_left, plan.pad_right), (0, 0)),
                      mode="symmetric")
        if band.shape[1] < wb:
            band = np.pad(band, ((0, 0), (0, wb - band.shape[1]), (0, 0)))
        return np.ascontiguousarray(band)

    def _build_band_tail(self, raw_hwc: np.ndarray, plan: TilePlan, r: int,
                         wb: int) -> np.ndarray:
        """Host: only the ``stride`` rows of band ``r`` that band ``r-1``
        does not already hold on device -> (stride, wb, C)."""
        top = r * plan.stride - plan.pad  # band r covers [top, top+cs)
        rows = self._reflect_rows(top + self.cs - plan.stride, plan.stride,
                                  plan.H)
        return self._pad_rows(raw_hwc[rows], plan, wb)

    def denoise_raw(self, raw_hwc: np.ndarray, scale: float,
                    out_dtype: str = "float32", progress: bool = False) -> np.ndarray:
        with self._placement():
            return self._denoise_raw_impl(raw_hwc, scale, out_dtype, progress)

    def _denoise_raw_impl(self, raw_hwc: np.ndarray, scale: float,
                          out_dtype: str = "float32",
                          progress: bool = False) -> np.ndarray:
        """Denoise from storage-dtype pixels, fully streamed.

        raw_hwc: (H, W, C) uint8/uint16/float; ``scale`` divides to [0, 1]
        (255, 65535, or 1.0 for already-float data). ``out_dtype``:
        'float32' (unclipped), 'float16', 'uint16', 'uint8' (clipped+scaled).

        The image streams through the chip one tile row at a time: input
        bands upload ahead on transfer threads while earlier rows compute;
        normalization is fused into the tile program; finished canvas rows
        quantize on device and download after all dispatches (device-order
        execution overlaps them with the remaining compute).
        """
        h, w, c = raw_hwc.shape
        plan = self.plan_for(h, w)
        if self.max_subpixels is not None and self.batch_size * self.cs * self.cs * c \
                > self.max_subpixels:
            raise RuntimeError(
                f"TileEngine: batch of {self.batch_size * self.cs * self.cs * c} "
                f"subpixels exceeds max_subpixels={self.max_subpixels}")
        # 'device': skip banded downloads entirely and hand back the cropped
        # fp32 canvas as a device array (for on-device post-ops like RL)
        return_device = out_dtype == "device"
        if return_device:
            out_dtype = "float32"
        if raw_hwc.dtype == np.float32 and self.compute_dtype == jnp.bfloat16 \
                and self.precision != "float32":
            raw_hwc = raw_hwc.astype(np.float16)  # halve wire bytes; <= 5e-4 rel err
        wb = _bucket(w + plan.pad_left + plan.pad_right)
        inv_scale = jnp.float32(1.0 / scale)
        canvas = jnp.zeros((_bucket(plan.grid_h), _bucket(plan.grid_w), c),
                           jnp.float32)

        bsz = self.batch_size
        n_rows = plan.ipervl + 1
        tiles_per_row = plan.iperhl + 1
        out_np = {"uint16": np.uint16, "uint8": np.uint8,
                  "float16": np.float16, "float32": np.float32}[out_dtype]
        if not return_device:  # 'device' never touches a host buffer
            result = np.empty((h, w, c), out_np)
            fetcher = transfer.AsyncFetcher(out=result)
        fetched_rows = 0

        def flush_final_rows(final_rows: int):
            """Dispatch quantize ops for canvas rows no future tile touches
            and hand them to the fetch pool immediately — downloads ride the
            (full-duplex) tunnel concurrently with later uploads/compute."""
            nonlocal fetched_rows
            band_h = plan.stride
            while final_rows - fetched_rows >= band_h and fetched_rows + band_h <= h:
                fetcher.submit(self._band(canvas, jnp.int32(fetched_rows),
                                          height=band_h, w=w,
                                          out_dtype=out_dtype),
                               row0=fetched_rows)
                fetched_rows += band_h

        # upload pipeline: keep a few input bands in flight ahead of compute
        AHEAD = 3
        futures: Dict[int, object] = {}

        def submit(r: int):
            # band 0 uploads in full; later bands upload only their stride-row
            # tail (assembled on device against the previous band)
            if r < n_rows and r not in futures:
                build = (self._build_band if r == 0
                         else self._build_band_tail)
                futures[r] = transfer.submit_put(
                    lambda r=r, build=build: build(raw_hwc, plan, r, wb))

        for r in range(min(AHEAD, n_rows)):
            submit(r)

        band_dev = None
        for r in range(n_rows):
            new_dev = futures.pop(r).result()
            band_dev = new_dev if r == 0 else \
                self._assemble(band_dev, new_dev, stride=plan.stride)
            submit(r + AHEAD)
            for b0 in range(0, tiles_per_row, bsz):
                idxs = range(r * tiles_per_row + b0,
                             r * tiles_per_row + min(b0 + bsz, tiles_per_row))
                scoords = np.zeros((bsz, 2), np.int32)
                specs = np.zeros((bsz, 6), np.int32)
                # the one seam-flag encoding (shared with the native stitcher
                # and the multi-device engines) — do not re-derive it here
                cds, sps = plan.tile_specs_arrays(idxs)
                scoords[:len(cds)] = cds
                specs[:len(sps)] = sps
                gcoords = scoords.copy()
                gcoords[:, 0] = 0  # gather frame: y is 0 within the row band
                canvas = self._step(self._params, canvas, band_dev, inv_scale,
                                    jnp.asarray(gcoords), jnp.asarray(scoords),
                                    jnp.asarray(specs))
            if self.debug_dir:
                self._dump_debug_tiles(raw_hwc, plan, r, wb, scale)
            if not return_device:
                flush_final_rows((r + 1) * plan.stride)
            if progress:
                print(f"{r}/{n_rows}")
        if return_device:
            return canvas[:h, :w]
        if fetched_rows < h:
            fetcher.submit(self._finish(canvas[fetched_rows:],
                                        h=h - fetched_rows, w=w,
                                        out_dtype=out_dtype),
                           row0=fetched_rows)
        fetcher.collect()  # waits; threads wrote into `result` directly
        return result

    # -- cross-image coalescing (continuous batching) -------------------------

    # stacked-band budget for denoise_many: beyond this the group's padded
    # input stack stops fitting comfortably next to the canvas + programs in
    # HBM, and the per-image streamed path is the right tool anyway (the
    # coalescing win is for images whose tile count UNDERFILLS a batch)
    MAX_GROUP_SUBPIXELS = 64 << 20

    def group_fits(self, n: int, height: int, width: int,
                   channels: int = 3) -> bool:
        """Whether a coalesced group of ``n`` (height, width) images fits
        the stacked-band budget — the same arithmetic denoise_many guards
        with, exposed so policy layers (AdaptiveEngine) can decide the
        per-image fallback WITHOUT exception-driven control flow."""
        plan = self.plan_for(height, width)
        ph = plan.ipervl * plan.stride + self.cs
        wb = _bucket(width + plan.pad_left + plan.pad_right)
        nb = 1 << (n - 1).bit_length()
        return nb * ph * wb * channels <= self.MAX_GROUP_SUBPIXELS

    def denoise_many(self, raws, scale: float, out_dtype: str = "float32"):
        with self._placement():
            return self._denoise_many_impl(list(raws), scale, out_dtype)

    def _denoise_many_impl(self, raws, scale: float,
                           out_dtype: str = "float32"):
        """Denoise N same-shape images as ONE coalesced tile stream.

        The MXU wants full batches, but a small image yields few tiles — a
        504/480 request of one tile runs a batch-8 program 7/8 empty, and
        every request pays its own dispatch round-trips. Here the images
        stack along the row axis of a single padded input band and a single
        accumulation canvas (image ``i`` gathers at ``y + i*PH`` and
        scatters at ``y + i*GHb``), so the EXISTING jitted step program
        (same tile batch shape — only the band/canvas heights differ)
        consumes tiles from all images back-to-back: batches fill across
        image boundaries and the whole group is one dispatch stream. This
        is continuous batching for tiled image requests; the reference
        (one process per image, denoise.py __main__) has no analog.

        Exactness: per-image tile order, band values (same reflect-index /
        symmetric-pad build as ``denoise_raw``), feather specs, and the
        sequential scatter-add order are all identical to ``denoise_raw``,
        and the tile batches fed to the network have the same shape — the
        outputs match the per-image path bit-for-bit
        (tests/test_denoise_many.py).

        Group sizes bucket to powers of two (dummy slots are zero rows that
        dispatch NO tiles) so at most log2(max group) step programs exist
        per tile-shape bucket. Raises ValueError when shapes/dtypes differ
        or the stacked band exceeds ``MAX_GROUP_SUBPIXELS`` — callers
        (AdaptiveEngine.denoise_many) fall back to the per-image path.

        ``out_dtype``: host dtypes return one (N, H, W, C) array; 'device'
        returns a list of N cropped fp32 canvas views for on-device
        post-ops (serve's RL stage).
        """
        n = len(raws)
        if n == 0:
            return []
        h, w, c = raws[0].shape
        if any(r.shape != (h, w, c) or r.dtype != raws[0].dtype
               for r in raws[1:]):
            raise ValueError("denoise_many: images must share shape + dtype")
        plan = self.plan_for(h, w)
        if self.max_subpixels is not None and self.batch_size * self.cs \
                * self.cs * c > self.max_subpixels:
            raise RuntimeError(
                f"TileEngine: batch of "
                f"{self.batch_size * self.cs * self.cs * c} subpixels "
                f"exceeds max_subpixels={self.max_subpixels}")
        if raws[0].dtype == np.float32 and self.compute_dtype == jnp.bfloat16 \
                and self.precision != "float32":
            raws = [r.astype(np.float16) for r in raws]  # as denoise_raw
        ph = plan.ipervl * plan.stride + self.cs  # full padded height
        wb = _bucket(w + plan.pad_left + plan.pad_right)
        nb = 1 << (n - 1).bit_length()  # group-size bucket
        if nb * ph * wb * c > self.MAX_GROUP_SUBPIXELS:
            raise ValueError(
                f"denoise_many: stacked band of {nb * ph * wb * c} "
                f"subpixels exceeds MAX_GROUP_SUBPIXELS")
        ghb = _bucket(plan.grid_h)
        canvas = jnp.zeros((nb * ghb, _bucket(plan.grid_w), c), jnp.float32)
        inv_scale = jnp.float32(1.0 / scale)

        def build_stack() -> np.ndarray:
            # one padded band holding every image: the same reflect-index +
            # symmetric-pad build as the streamed path's bands, so values
            # (and therefore outputs) are bit-identical to denoise_raw
            stack = np.zeros((nb * ph, wb, c), raws[0].dtype)
            rows = self._reflect_rows(-plan.pad, ph, plan.H)
            for i, r in enumerate(raws):
                stack[i * ph:(i + 1) * ph] = self._pad_rows(r[rows], plan, wb)
            return stack

        band_fut = transfer.submit_put(build_stack)

        # flat coalesced stream: image-major, per-image row-major tile order
        # (the scatter-add order inside each image matches denoise_raw)
        flat = [(i, t) for i in range(n) for t in range(plan.ntiles)]
        bsz = self.batch_size
        band_dev = band_fut.result()
        for b0 in range(0, len(flat), bsz):
            chunk = flat[b0:b0 + bsz]
            gcoords = np.zeros((bsz, 2), np.int32)
            scoords = np.zeros((bsz, 2), np.int32)
            specs = np.zeros((bsz, 6), np.int32)
            cds, sps = plan.tile_specs_arrays([t for _, t in chunk])
            imgs = np.fromiter((i for i, _ in chunk), np.int32, len(chunk))
            gcoords[:len(cds), 0] = cds[:, 0] + imgs * ph
            gcoords[:len(cds), 1] = cds[:, 1]
            scoords[:len(cds), 0] = cds[:, 0] + imgs * ghb
            scoords[:len(cds), 1] = cds[:, 1]
            specs[:len(sps)] = sps
            canvas = self._step(self._params, canvas, band_dev, inv_scale,
                                jnp.asarray(gcoords), jnp.asarray(scoords),
                                jnp.asarray(specs))
        if out_dtype == "device":
            return [canvas[i * ghb:i * ghb + h, :w] for i in range(n)]
        out_np = {"uint16": np.uint16, "uint8": np.uint8,
                  "float16": np.float16, "float32": np.float32}[out_dtype]
        result = np.empty((n * h, w, c), out_np)
        fetcher = transfer.AsyncFetcher(out=result)
        for i in range(n):
            fetcher.submit(self._finish(canvas[i * ghb:i * ghb + plan.grid_h],
                                        h=h, w=w, out_dtype=out_dtype),
                           row0=i * h)
        fetcher.collect()
        return result.reshape(n, h, w, c)

    def _dump_debug_tiles(self, raw_hwc, plan, r, wb, scale):
        """--debug parity (denoise_image.py:260-266): write each tile's noisy
        input and denoised output as JPEGs into the debug dir (slow path)."""
        import cv2

        os.makedirs(self.debug_dir, exist_ok=True)
        band = self._build_band(raw_hwc, plan, r, wb).astype(np.float32) / scale
        if not hasattr(self, "_dbg_fwd"):
            self._dbg_fwd = jax.jit(lambda p, t: self.apply_fn(
                p, t.astype(self.compute_dtype)))
        for xi in range(plan.iperhl + 1):
            s = plan.spec(r * (plan.iperhl + 1) + xi)
            tile = band[:, s.abs_x0:s.abs_x0 + self.cs]
            out = np.asarray(self._dbg_fwd(self._params, jnp.asarray(tile)[None]))[0]
            for tag, arr in (("noisy", tile), ("denoised", out.astype(np.float32))):
                u8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(os.path.join(self.debug_dir,
                                         f"crop{r}_{xi}_{tag}.jpg"),
                            cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))

    def denoise_hwc(self, img_hwc: np.ndarray, progress: bool = False) -> np.ndarray:
        """(H, W, C) float32 in [0,1]-ish -> float32, unclipped."""
        return self.denoise_raw(np.ascontiguousarray(img_hwc), 1.0,
                                out_dtype="float32", progress=progress)

    def denoise_chw(self, img_chw: np.ndarray, progress: bool = False) -> np.ndarray:
        out = self.denoise_hwc(np.ascontiguousarray(img_chw.transpose(1, 2, 0)),
                               progress=progress)
        return out.transpose(2, 0, 1)

    def _get_whole_jit(self):
        """ONE jitted whole-image forward shared by denoise_whole and
        denoise_tiny, with the same float32-precision semantics as the
        tiled step (_make_step): before this helper, whichever of the two
        ran first memoized _whole_jit and denoise_whole's version skipped
        the default_matmul_precision("highest") wrapper."""
        if not hasattr(self, "_whole_jit"):
            fwd = self.apply_fn
            if self.precision == "float32":
                base = fwd

                def fwd(p, t):
                    with jax.default_matmul_precision("highest"):
                        return base(p, t)
            self._whole_jit = jax.jit(fwd)
        return self._whole_jit

    def denoise_whole(self, img_chw: np.ndarray, pad: int = 0) -> np.ndarray:
        with self._placement():
            return self._denoise_whole_impl(img_chw, pad)

    def _denoise_whole_impl(self, img_chw: np.ndarray, pad: int = 0) -> np.ndarray:
        """Whole-image mode (reference --whole_image --pad,
        denoise_image.py:196-197): one forward at full size, side-mirror
        padding with zero corners, crop back.

        Sizes violating the architecture's validity formula (UtNet's
        (((cs/2-4)/2-4)/2-4)/2-2 integrality — most real photo dims)
        additionally mirror-pad bottom/right to the next valid extents
        and crop back, like ``denoise_tiny``; the reference CRASHES on
        such sizes (networks/UtNet.py:6-7 documents the constraint, the
        forward just throws a concat shape error).

        Compiles once per image size (memoized here; the persistent cache
        makes cold sizes one-time per host). Bucketing is deliberately NOT
        applied: replicate-padding to a bucket would enter the receptive
        field of real border pixels and change the output. For bounded
        per-chip memory at large sizes use the spatially-sharded forward
        (parallel/spatial.py; --devices N on the CLI)."""
        whole_jit = self._get_whole_jit()
        padded = tiles_mod.whole_image_pad(img_chw, pad) if pad else img_chw.astype(np.float32)
        hwc = padded.transpose(1, 2, 0)
        h, w = hwc.shape[:2]
        th = tiles_mod.next_valid_dim(h, self.size_check)
        tw = tiles_mod.next_valid_dim(w, self.size_check)
        if (th, tw) != (h, w):
            hwc = tiles_mod.pad_to_size(hwc, th, tw)
        x = jnp.asarray(hwc)[None].astype(self.compute_dtype)
        y = whole_jit(self._params, x)[:, :h, :w]
        y = np.asarray(y[0]).astype(np.float32).transpose(2, 0, 1)
        if pad:
            y = y[:, pad:-pad, pad:-pad]
        return y

    def denoise_tiny(self, raw_hwc: np.ndarray, scale: float,
                     out_dtype: str = "uint16"):
        with self._placement():
            return self._denoise_tiny_impl(raw_hwc, scale, out_dtype)

    def _denoise_tiny_impl(self, raw_hwc: np.ndarray, scale: float,
                           out_dtype: str = "uint16"):
        """Images below the minimum tiling (adapt_cs_ucs ValueError): the
        reference aborts on these — its per-tile mirror pad needs
        pad <= image size (denoise_image.py:151-170). Here: mirror-pad
        bottom/right to the smallest arch-valid extents
        (tiles.next_valid_dim per dimension), one whole forward, crop back.

        Host-side fp32 normalize (images this small make wire layout
        irrelevant). out_dtype: 'uint8'/'uint16' (clipped quantize),
        'float16'/'float32' (unclipped), or 'device' (float32 HWC
        DeviceArray for on-device post-ops, e.g. the RL stage). The whole
        jit retraces per padded size; tiny compiles are cheap and the
        persistent cache keeps them one-time per host."""
        h, w = raw_hwc.shape[:2]
        th = tiles_mod.next_valid_dim(h, self.size_check)
        tw = tiles_mod.next_valid_dim(w, self.size_check)
        c = raw_hwc.shape[2]
        # same guard rail as denoise_raw: this path engages automatically
        # (thin strips can be arbitrarily long in the other dimension), so
        # --max_subpixels must bound the single forward it dispatches too
        if self.max_subpixels is not None and th * tw * c > self.max_subpixels:
            raise RuntimeError(
                f"TileEngine: tiny-image forward of {th * tw * c} subpixels "
                f"exceeds max_subpixels={self.max_subpixels}")
        img = raw_hwc.astype(np.float32)
        if scale != 1.0:
            img = img / np.float32(scale)
        padded = tiles_mod.pad_to_size(img, th, tw)
        x = jnp.asarray(padded)[None].astype(self.compute_dtype)
        y = self._get_whole_jit()(self._params, x)[0, :h, :w].astype(jnp.float32)
        if out_dtype == "device":
            return y
        if out_dtype == "uint8":
            return np.asarray(jnp.round(jnp.clip(y, 0, 1) * 255)
                              .astype(jnp.uint8))
        if out_dtype == "uint16":
            return np.asarray(jnp.round(jnp.clip(y, 0, 1) * 65535)
                              .astype(jnp.uint16))
        return np.asarray(y).astype(out_dtype)  # fp formats: unclipped


def resolve_apply_fn(network: str, params, activation: str = "PReLU",
                     compute_dtype: str = "bfloat16", calib=None):
    """(apply_fn, params) for an inference engine — shared by the
    single-chip TileEngine, the row-band ShardedTileDenoiser, and the
    image-per-device DeviceBatchDenoiser so all product surfaces run the
    same forward.

    ``compute_dtype='int8'`` (UtNet only) selects the quantized forward
    (UtNet.apply_int8 / ops/qconv.py): interior convs run int8 on the MXU
    at ~2x the bf16 rate; quantization noise is pinned by
    tests/test_qconv.py and the mode is opt-in from the CLIs.
    ``'int8_static'`` additionally bakes static activation scales
    calibrated here — on ``calib`` (an (N, s, s, 3) [0,1] batch; the
    image CLI passes crops of the actual input, qconv.calib_from_image)
    or, absent one, the synthetic extremal set (qconv.calib_tiles).
    With static scales the quantizes fuse into producer epilogues,
    which is where the int8 speed actually comes from (PERF.md "int8
    engine mode").

    NOTE the same params-immutability invariant as TileEngine: for UtNet the
    derived fast-forward kernels are pre-composed from ``params`` here and
    close over the returned apply_fn as constants."""
    from ..models import get_network

    net = get_network(network)
    if compute_dtype.startswith("int8") and network != "UtNet":
        raise ValueError(f"compute_dtype={compute_dtype!r} is only "
                         "supported for UtNet")
    if network == "UtNet" and compute_dtype.startswith("int8"):
        derived = jax.jit(net.precompute_int8)(params)
        if compute_dtype == "int8_static":
            if calib is None:
                from ..ops.qconv import calib_tiles

                calib = calib_tiles()
            raw_p = params
            d_cal = net.calibrate_int8(params, derived, calib,
                                       activation=activation)
            acts = d_cal.pop("acts")
            # the calibrated scales ride INSIDE the params pytree as traced
            # leaves (not closure constants): per-image calibration
            # (calib_from_image) must not change the HLO, or every image
            # would recompile the tile programs (30s-15min on the tunnel)
            params = {"params": raw_p, "acts": acts}
            apply_fn = lambda pb, x: net.apply_int8(
                pb["params"], x, activation=activation,
                derived={**d_cal, "acts": pb["acts"]})

            def _recalibrate(calib_batch, _p=raw_p):
                """Fresh params bundle with scales calibrated on
                ``calib_batch`` — same weights, same HLO (the scales are
                traced leaves). TileEngine.recalibrate_int8 uses this to
                content-match a memoized engine to each image."""
                d2 = net.calibrate_int8(_p, derived, calib_batch,
                                        activation=activation)
                return {"params": _p, "acts": d2["acts"]}

            apply_fn.recalibrate = _recalibrate
        else:
            apply_fn = lambda p, x: net.apply_int8(
                p, x, activation=activation, derived=derived)
    elif network == "UtNet":
        # MXU-shaped exact rewrite (composed up-convs + width-folded L1,
        # ops/fastconv.py): +~50% single-chip throughput, parity-tested in
        # tests/test_utnet_fast.py. Kernels are pre-composed once here and
        # close over the jitted step as constants. enc1_impl='auto' adds
        # the fused VMEM enc1 Mosaic kernel (ops/pallas_enc1.py, +3.5-4%
        # measured) when tracing for a real TPU; inference-only engines
        # never differentiate, so the kernel's missing VJP is moot.
        derived = jax.jit(net.precompute_fast)(params)
        apply_fn = lambda p, x: net.apply_fast(p, x, activation=activation,
                                               derived=derived,
                                               enc1_impl="auto")
    elif network == "UNet":
        # eval-mode UNet: thread the BN state, discard updates
        params, state = params if isinstance(params, tuple) else (params, None)
        if state is None:
            raise ValueError("UNet engine requires (params, state) with BN stats")
        apply_fn = lambda p, x: net.apply(p, x, state, train=False)[0]
    else:
        raise ValueError(f"resolve_apply_fn: unsupported generator {network}")
    return apply_fn, params


def _resolve_tiles(network: str, cs: Optional[int], ucs: Optional[int]):
    """Per-arch tile defaults + arch size-formula validation (shared by the
    single-device and multi-device constructors so they cannot drift).
    Returns (cs, ucs, size_check) — size_check is the arch validator (or
    None), which TileEngine keeps for the tiny-image fallback."""
    from ..models import get_network

    net = get_network(network)
    if cs is None or ucs is None:
        cs, ucs = default_cs_ucs(network)
    check = getattr(net, "check_cs", None)
    if check is not None:
        check(cs)
    return cs, ucs, check


def make_sharded_denoiser(network: str, params, ndev: int,
                          cs: Optional[int] = None,
                          ucs: Optional[int] = None,
                          activation: str = "PReLU",
                          ol: int = tiles_mod.DEFAULT_OVERLAP,
                          batch_size: int = 8,
                          compute_dtype: str = "bfloat16",
                          precision: str = "default",
                          max_subpixels: Optional[int] = None,
                          resolved=None):
    """The multi-device engagement recipe, in ONE place (used by
    denoise_image_cli, denoise_cli's dir batch, eval/denoise_dir, and the
    serving daemon): resolve the forward, per-arch tile defaults, the
    tiles-per-device split of the batch, and the reference guard rails
    (--max_subpixels, precision) that the single-device engine honors.

    ``resolved``: optional pre-resolved ``(apply_fn, params)`` from
    resolve_apply_fn — callers building several denoisers (per tile size)
    from one checkpoint pass it to avoid re-deriving the fastconv kernel
    tree on device each time."""
    from ..parallel import mesh as pmesh
    from ..parallel.sharded_engine import ShardedTileDenoiser

    cs, ucs, _ = _resolve_tiles(network, cs, ucs)
    apply_fn, params = (resolved if resolved is not None
                        else resolve_apply_fn(network, params, activation,
                                              compute_dtype=compute_dtype))
    if precision == "float32":
        base_fn = apply_fn

        def apply_fn(p, x):
            with jax.default_matmul_precision("highest"):
                return base_fn(p, x)

    return ShardedTileDenoiser(
        apply_fn, params, cs=cs, ucs=ucs, ol=ol,
        tiles_per_device=max(1, batch_size // ndev),
        compute_dtype=compute_dtype, mesh=pmesh.make_mesh(ndev, local=True),
        max_subpixels=max_subpixels)


def make_engine(network: str, params, cs: Optional[int] = None,
                ucs: Optional[int] = None, activation: str = "PReLU",
                resolved=None, **kwargs) -> TileEngine:
    """Convenience constructor resolving per-arch tile defaults
    (autodetect_network_cs_ucs parity, denoise_image.py:59-79).

    ``resolved``: optional pre-resolved ``(apply_fn, params)`` from
    resolve_apply_fn — same contract as make_sharded_denoiser, for callers
    building several engines (per tile size) from one checkpoint."""
    cs, ucs, check = _resolve_tiles(network, cs, ucs)
    apply_fn, params = (resolved if resolved is not None
                        else resolve_apply_fn(
                            network, params, activation,
                            compute_dtype=kwargs.get("compute_dtype",
                                                     "bfloat16")))
    return TileEngine(apply_fn, params, cs, ucs, size_check=check, **kwargs)


class AdaptiveEngine:
    """Per-request denoise recipe: engine-per-tile-size cache + small-image
    tiling adaptation + tiny-image fallback, optionally pinned to ONE
    device.

    This is the shape-agnostic wrapper the serving daemon uses for every
    request (request sizes differ, engines are keyed by adapted (cs, ucs))
    and the unit of replication for the request-level device pool
    (parallel/engine_pool.EnginePool): with ``device`` set, the forward is
    resolved and params are committed on that device, and every engine the
    cache builds inherits the pin — a pool of these serves concurrent
    requests with zero cross-device traffic.

    The reference has no analog (fresh process per image,
    /root/reference/src/denoise.py __main__); tiling adaptation extends
    its fixed autodetected tile sizes (denoise_image.py:59-79) down to
    arbitrarily small inputs.
    """

    def __init__(self, network: str, params, cs: Optional[int] = None,
                 ucs: Optional[int] = None, activation: str = "PReLU",
                 batch_size: int = 8, compute_dtype: str = "bfloat16",
                 precision: str = "default",
                 max_subpixels: Optional[int] = None,
                 device=None, resolved=None):
        self._network = network
        self._device = device
        self.cs, self.ucs, self._check = _resolve_tiles(network, cs, ucs)
        self._kw = dict(activation=activation, batch_size=batch_size,
                        compute_dtype=compute_dtype, precision=precision,
                        max_subpixels=max_subpixels, device=device)
        with self._placement():
            if device is not None:
                # per-device resolve: the UtNet fast path pre-composes
                # derived kernel trees as jit closure constants, which must
                # colocate with the committed params (a shared `resolved`
                # would pin every replica's constants to one chip)
                params = jax.device_put(params, device)
                resolved = None
            self._resolved = (resolved if resolved is not None
                              else resolve_apply_fn(
                                  network, params, activation,
                                  compute_dtype=compute_dtype))
        self._engines: Dict = {}

    def _placement(self):
        return (jax.default_device(self._device) if self._device is not None
                else contextlib.nullcontext())

    @property
    def device(self):
        return self._device

    def _engine_for(self, cs: int, ucs: int) -> TileEngine:
        key = (cs, ucs)
        if key not in self._engines:
            with self._placement():
                self._engines[key] = make_engine(
                    self._network, None, cs=cs, ucs=ucs,
                    resolved=self._resolved, **self._kw)
        return self._engines[key]

    def _tiny_engine(self) -> TileEngine:
        if "tiny" not in self._engines:
            with self._placement():
                self._engines["tiny"] = make_engine(
                    self._network, None, resolved=self._resolved, **self._kw)
        return self._engines["tiny"]

    def denoise_raw(self, raw_hwc: np.ndarray, scale: float,
                    out_dtype: str = "float32"):
        """Tiling-adaptive denoise from storage-dtype pixels; out_dtype as
        TileEngine.denoise_raw (incl. 'device' for on-device post-ops)."""
        try:
            cs, ucs = tiles_mod.adapt_cs_ucs(raw_hwc.shape[0],
                                             raw_hwc.shape[1],
                                             self.cs, self.ucs,
                                             check=self._check)
            eng, method = self._engine_for(cs, ucs), "denoise_raw"
        except tiles_mod.TilingError:
            # below the minimum tiling: pad-to-valid single forward
            eng, method = self._tiny_engine(), "denoise_tiny"
        if self._kw.get("compute_dtype") == "int8_static":
            # content-match the static scales to THIS request (traced
            # leaves — no recompile): every surface riding AdaptiveEngine
            # (serve single + pool replicas, the dir straggler pool) gets
            # the per-image calibration win automatically
            eng.recalibrate_int8(raw_hwc, scale)
        return getattr(eng, method)(raw_hwc, scale, out_dtype=out_dtype)

    def denoise_many(self, raws, scale: float, out_dtype: str = "float32"):
        """Coalesced same-shape group denoise (TileEngine.denoise_many)
        with every fallback handled as POLICY, not exceptions: mixed
        shapes, tiny images, groups over the stacked-band budget,
        int8_static (whose per-image scale calibration is worth more than
        batch fill), and images whose tile count already FILLS the batch
        (no fill win, and the per-image streamed path overlaps
        uploads/compute where the stacked band cannot — review r3) all
        take the per-image path. Always returns per-image results in
        input order — one (N, H, W, C) array for same-shape host dtypes,
        a list for 'device' or mixed shapes."""
        raws = list(raws)
        same = (len(raws) >= 2
                and all(r.shape == raws[0].shape and r.dtype == raws[0].dtype
                        for r in raws[1:]))
        if same and self._kw.get("compute_dtype") != "int8_static":
            h, w = raws[0].shape[:2]
            try:
                cs, ucs = tiles_mod.adapt_cs_ucs(h, w, self.cs, self.ucs,
                                                 check=self._check)
            except tiles_mod.TilingError:
                cs = None  # below the minimum tiling: per-image tiny path
            if cs is not None:
                eng = self._engine_for(cs, ucs)
                if (eng.plan_for(h, w).ntiles < eng.batch_size
                        and eng.group_fits(len(raws), h, w,
                                           raws[0].shape[2])):
                    return eng.denoise_many(raws, scale, out_dtype=out_dtype)
        outs = [self.denoise_raw(r, scale, out_dtype=out_dtype)
                for r in raws]
        if out_dtype == "device":
            return outs
        if all(o.shape == outs[0].shape for o in outs[1:]):
            return np.stack(outs)
        return outs  # mixed shapes cannot stack
