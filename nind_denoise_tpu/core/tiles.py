"""Overlap-tile decomposition geometry (host side, pure numpy).

This reproduces the reference's tile grid, mirror padding, useful-region and
seam-feathering semantics exactly (OneImageDS,
/root/reference/src/nind_denoise/denoise_image.py:81-177 and
make_seamless_edges, denoise_image.py:204-213), but reformulated for a
fixed-shape XLA engine:

* The per-tile ad-hoc mirror copies of the reference are equivalent to ONE
  global ``np.pad(mode='symmetric')`` of the source image (the reference
  duplicates the edge pixel, which is numpy's 'symmetric', not 'reflect'),
  padded by ``pad=(cs-ucs)//2`` on top/left and by the (possibly much larger)
  residual grid overhang on bottom/right.
* Seam feathering (halving ``overlap``-wide strips on interior edges so the
  overlap-add averages neighbouring tiles) + the useful-region crop become a
  per-tile multiplicative weight mask over a fixed ``ucs x ucs`` slab, so
  stitching is a static-shape multiply + scatter-add — TPU friendly.

Grid math (denoise_image.py:100-104): tiles of ``cs`` on stride ``ucs-ol``;
``iperhl = ceil((W-ucs)/(ucs-ol))`` horizontal steps, analogous vertical;
tile (xi, yi) covers padded coords starting at ``(ucs-ol)*xi`` with receptive
pad ``(cs-ucs)/2`` on each side.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class TileSpec:
    """One tile of the grid."""
    index: int
    xi: int
    yi: int
    abs_x0: int          # top-left of the useful region in image coords
    abs_y0: int
    useful_w: int        # useful region extent (== ucs except at right/bottom edges)
    useful_h: int


# per-architecture tile-size defaults (denoise_image.py:40-42)
CS_UNET, UCS_UNET = 440, 320
CS_UTNET, UCS_UTNET = 504, 480
CS_UNK, UCS_UNK = 512, 448
DEFAULT_OVERLAP = 6  # denoise_image.py:186


def default_cs_ucs(network: Optional[str]) -> Tuple[int, int]:
    if network == "UNet":
        return CS_UNET, UCS_UNET
    if network == "UtNet":
        return CS_UTNET, UCS_UTNET
    return CS_UNK, UCS_UNK


class TilePlan:
    """Static description of an overlap-tile run over one image size.

    Parameters mirror the reference: ``cs`` crop size fed to the network,
    ``ucs`` useful crop size (stitching stride + ol), ``ol`` feather overlap.
    """

    def __init__(self, height: int, width: int, cs: int, ucs: int, ol: int = DEFAULT_OVERLAP):
        if not (0 < ucs <= cs):
            raise ValueError(f"TilePlan: need 0 < ucs <= cs, got cs={cs} ucs={ucs}")
        if (cs - ucs) % 2:
            raise ValueError(f"TilePlan: cs-ucs must be even, got cs={cs} ucs={ucs}")
        if ol >= ucs:
            raise ValueError(f"TilePlan: overlap {ol} must be < ucs {ucs}")
        if ol > 0 and 2 * ol > ucs:
            # stride = ucs - ol < ol would let a third tile into a feather
            # strip: adjacent-tile overlap is exactly ol by construction, so
            # the 0.5+0.5 seam weights sum to 1 iff 2*ol <= ucs; beyond that
            # pixels accumulate 1.25-1.5x (found by hypothesis,
            # tests/test_tiles_property.py — the reference's
            # make_seamless_edges carries the same latent assumption)
            raise ValueError(
                f"TilePlan: need 2*overlap <= ucs for the seam feathers to "
                f"partition unity, got ol={ol} ucs={ucs}")
        self.H, self.W = int(height), int(width)
        self.cs, self.ucs, self.ol = int(cs), int(ucs), int(ol)
        self.pad = (cs - ucs) // 2
        stride = ucs - ol
        self.stride = stride
        # number of extra steps needed to cover each axis
        self.iperhl = max(0, math.ceil((self.W - ucs) / stride))
        self.ipervl = max(0, math.ceil((self.H - ucs) / stride))
        self.ntiles = (self.iperhl + 1) * (self.ipervl + 1)
        # grid canvas extent (>= image, covers the last tile's useful slab)
        self.grid_w = self.iperhl * stride + ucs
        self.grid_h = self.ipervl * stride + ucs
        # global symmetric padding extents for gather
        self.pad_left = self.pad_top = self.pad
        self.pad_right = self.iperhl * stride + cs - self.pad - self.W
        self.pad_bottom = self.ipervl * stride + cs - self.pad - self.H
        if self.pad_right > self.W or self.pad_bottom > self.H:
            raise ValueError(
                f"TilePlan: image {self.H}x{self.W} too small for cs={cs} ucs={ucs} "
                f"(mirror pad {self.pad_bottom}x{self.pad_right} exceeds image)")
        self._mask_cache: Dict[tuple, np.ndarray] = {}

    # -- grid ---------------------------------------------------------------

    def spec(self, i: int) -> TileSpec:
        yi = i // (self.iperhl + 1)
        xi = i % (self.iperhl + 1)
        abs_x0 = self.stride * xi
        abs_y0 = self.stride * yi
        return TileSpec(
            index=i, xi=xi, yi=yi, abs_x0=abs_x0, abs_y0=abs_y0,
            useful_w=min(self.ucs, self.W - abs_x0),
            useful_h=min(self.ucs, self.H - abs_y0),
        )

    def specs(self) -> List[TileSpec]:
        return [self.spec(i) for i in range(self.ntiles)]

    # -- gather -------------------------------------------------------------

    def pad_image(self, img_hwc: np.ndarray) -> np.ndarray:
        """Symmetric-pad an (H, W, C) image once for all tile gathers."""
        assert img_hwc.shape[:2] == (self.H, self.W), (img_hwc.shape, self.H, self.W)
        from . import native

        if native.available() and img_hwc.dtype == np.float32:
            return native.symmetric_pad(img_hwc, self.pad_top, self.pad_bottom,
                                        self.pad_left, self.pad_right)
        return np.pad(
            img_hwc,
            ((self.pad_top, self.pad_bottom), (self.pad_left, self.pad_right), (0, 0)),
            mode="symmetric",
        )

    def gather(self, padded_hwc: np.ndarray, indices) -> np.ndarray:
        """Slice tiles out of the padded image -> (B, cs, cs, C)."""
        cs = self.cs
        out = np.empty((len(indices), cs, cs, padded_hwc.shape[2]), dtype=padded_hwc.dtype)
        for j, i in enumerate(indices):
            s = self.spec(i)
            out[j] = padded_hwc[s.abs_y0:s.abs_y0 + cs, s.abs_x0:s.abs_x0 + cs]
        return out

    def gather_from_source(self, img_hwc: np.ndarray, indices) -> np.ndarray:
        """Gather tiles straight from the UNPADDED image (native fast path —
        no padded intermediate copy; numpy fallback pads then slices)."""
        from . import native

        if native.available() and img_hwc.dtype == np.float32:
            coords = np.array([[self.spec(i).abs_y0, self.spec(i).abs_x0]
                               for i in indices], np.int32)
            return native.gather_tiles(img_hwc, coords, self.cs, self.pad)
        return self.gather(self.pad_image(img_hwc), indices)

    def tile_specs_arrays(self, indices) -> "tuple[np.ndarray, np.ndarray]":
        """(coords n x 2 [y0, x0], specs n x 6) int32 arrays for a batch —
        the same descriptors the device engine and native stitcher consume."""
        coords = np.zeros((len(indices), 2), np.int32)
        specs = np.zeros((len(indices), 6), np.int32)
        for j, i in enumerate(indices):
            s = self.spec(i)
            coords[j] = (s.abs_y0, s.abs_x0)
            specs[j] = (s.useful_h, s.useful_w, s.abs_x0 != 0, s.abs_y0 != 0,
                        s.abs_x0 + self.ucs < self.W and self.ol > 0,
                        s.abs_y0 + self.ucs < self.H and self.ol > 0)
        return coords, specs

    def batches(self, batch_size: int) -> Iterator[List[int]]:
        """Tile indices in stitch order, grouped into batches."""
        for b0 in range(0, self.ntiles, batch_size):
            yield list(range(b0, min(b0 + batch_size, self.ntiles)))

    # -- stitch -------------------------------------------------------------

    def weight_mask(self, i: int) -> np.ndarray:
        """(ucs, ucs) float32 multiplicative stitch mask for tile ``i``.

        0 outside the useful region; 0.5 factors on each ``ol``-wide strip
        that abuts a neighbouring tile (edges interior to the image), matching
        make_seamless_edges (denoise_image.py:204-213). Factors compound
        (corner overlap = 0.25) so the overlap-add averages contributions.
        """
        s = self.spec(i)
        left = s.abs_x0 != 0
        top = s.abs_y0 != 0
        right = s.abs_x0 + self.ucs < self.W and self.ol > 0
        bottom = s.abs_y0 + self.ucs < self.H and self.ol > 0
        key = (s.useful_h, s.useful_w, left, top, right, bottom)
        mask = self._mask_cache.get(key)
        if mask is None:
            mask = np.zeros((self.ucs, self.ucs), dtype=np.float32)
            mask[:s.useful_h, :s.useful_w] = 1.0
            if left:
                mask[:, :self.ol] *= 0.5
            if top:
                mask[:self.ol, :] *= 0.5
            if right:
                mask[:, s.useful_w - self.ol:s.useful_w] *= 0.5
            if bottom:
                mask[s.useful_h - self.ol:s.useful_h, :] *= 0.5
            self._mask_cache[key] = mask
        return mask

    def weight_masks(self, indices) -> np.ndarray:
        """(B, ucs, ucs, 1) stacked masks for a batch."""
        return np.stack([self.weight_mask(i) for i in indices])[..., None]

    def new_canvas(self, channels: int = 3, dtype=np.float32) -> np.ndarray:
        """Grid-extent accumulation canvas (crop to H, W when done)."""
        return np.zeros((self.grid_h, self.grid_w, channels), dtype=dtype)

    def scatter_add(self, canvas: np.ndarray, tiles_out: np.ndarray, indices) -> None:
        """Accumulate denoised tiles into the canvas (host reference path).

        ``tiles_out``: (B, cs, cs, C) network outputs; the useful ucs x ucs
        slab is weighted and added at each tile's absolute origin.
        """
        from . import native

        if native.available() and canvas.dtype == np.float32 \
                and canvas.flags.c_contiguous:
            coords, specs = self.tile_specs_arrays(indices)
            native.scatter_add(canvas, tiles_out, coords, specs,
                               self.pad, self.ucs, self.ol)
            return
        p, u = self.pad, self.ucs
        for j, i in enumerate(indices):
            s = self.spec(i)
            slab = tiles_out[j, p:p + u, p:p + u] * self.weight_mask(i)[..., None]
            canvas[s.abs_y0:s.abs_y0 + u, s.abs_x0:s.abs_x0 + u] += slab

    def finalize(self, canvas: np.ndarray) -> np.ndarray:
        return canvas[:self.H, :self.W]


class TilingError(ValueError):
    """No tiling fits the image (adapt_cs_ucs): callers fall back to the
    tiny-image padded forward (TileEngine.denoise_tiny)."""


def adapt_cs_ucs(height: int, width: int, cs: int, ucs: int,
                 ol: int = DEFAULT_OVERLAP, check=None) -> Tuple[int, int]:
    """(cs, ucs) that actually fit the image.

    TilePlan's one-shot symmetric pad cannot exceed the image
    (pad_bottom/right <= H/W), so the per-arch default tiling (UtNet
    504/480) rejects images below ~246 px — the reference would crash the
    same way (its per-tile ``np.flip`` mirror needs pad <= size,
    denoise_image.py:151-170). Returns the configured pair when valid,
    else the largest smaller tile with the same receptive pad that both
    fits and passes the arch's size formula (``check``, e.g.
    ``UtNet.check_cs``). Raises ValueError when nothing fits."""
    pad2 = cs - ucs  # preserve the receptive pad
    def fits(c):
        try:
            TilePlan(height, width, c, c - pad2, ol)
            return True
        except ValueError:
            return False

    def arch_ok(c):
        if check is None:
            return True
        try:
            check(c)
            return True
        except ValueError:
            return False

    if arch_ok(cs) and fits(cs):
        return cs, ucs
    for c in range(cs - 8, pad2 + ol, -8):
        if c - pad2 < max(2 * ol, ol + 1):
            break  # ucs below 2*ol can't feather correctly (TilePlan raises)
        if arch_ok(c) and fits(c):
            return c, c - pad2
    raise TilingError(
        f"adapt_cs_ucs: image {height}x{width} too small for any tiling "
        f"derived from cs={cs}/ucs={ucs}")


def next_valid_dim(n: int, check=None, span: int = 1024) -> int:
    """Smallest spatial extent >= n the architecture accepts.

    ``check`` is the arch's size validator (e.g. ``UtNet.check_cs``) —
    pooling constrains H and W independently, so it applies per dimension.
    Without one, rounds up to a multiple of 64, the reference's whole-image
    convention (``crop_to_multiple(..., 64)``, dataset_torch_3.py:394).
    Used by the tiny-image path (TileEngine.denoise_tiny) for inputs below
    the minimum tiling, which abort the reference outright
    (denoise_image.py:151-170 needs mirror pad <= image size)."""
    n = max(int(n), 1)
    if check is None:
        return ((n + 63) // 64) * 64
    for d in range(n, n + span):
        try:
            check(d)
            return d
        except ValueError:
            continue
    raise ValueError(f"next_valid_dim: no valid size in [{n}, {n + span})")


def pad_to_size(img_hwc: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Mirror-pad an HWC image on the bottom/right to exactly (th, tw).

    Iterates np.pad(mode='symmetric') so extents may more than double —
    a single symmetric pad is capped at the current size per axis. The
    caller crops the output back with ``[:h, :w]``."""
    out = img_hwc
    while out.shape[0] < th or out.shape[1] < tw:
        ph = min(th - out.shape[0], out.shape[0])
        pw = min(tw - out.shape[1], out.shape[1])
        out = np.pad(out, ((0, ph), (0, pw), (0, 0)), mode="symmetric")
    return out


def whole_image_pad(img_chw: np.ndarray, pad: int) -> np.ndarray:
    """Whole-image mode padding (OneImageDS whole_image branch,
    denoise_image.py:110-128): mirror the four sides, leave corners zero."""
    c, h, w = img_chw.shape
    ret = np.zeros((c, h + 2 * pad, w + 2 * pad), dtype=np.float32)
    ret[:, pad:h + pad, pad:w + pad] = img_chw
    if pad:
        ret[:, pad:-pad, :pad] = np.flip(img_chw[:, :, :pad], axis=2)
        ret[:, pad:-pad, w + pad:] = np.flip(img_chw[:, :, w - pad:], axis=2)
        ret[:, :pad, pad:-pad] = np.flip(img_chw[:, :pad, :], axis=1)
        ret[:, h + pad:, pad:-pad] = np.flip(img_chw[:, h - pad:, :], axis=1)
    return ret
