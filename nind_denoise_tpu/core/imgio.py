"""Host-side image decode/encode (pure numpy, no JAX dependency).

Behavioral parity with the reference:

* ``load_img`` follows ``np_imgops.img_path_to_np_flt``
  (/root/reference/src/nind_denoise/common/libs/np_imgops.py:12-29):
  RGB float32 CHW; uint8 / 255, uint16 / 65535, float32 passthrough
  (the fp32 path preserves >1.0 highlight-reconstruction values, see
  /root/reference/src/denoise.py:417-418).
* ``save_img`` follows ``pt_helpers.tensor_to_imgfile``
  (/root/reference/src/nind_denoise/common/libs/pt_helpers.py:22-40) and its
  deliberate extension convention: .jpg = 8-bit, .png/.tif = 16-bit,
  .tiff = float32 (no clipping!).
* pad/crop pair helpers follow np_imgops.np_pad_img_pair/np_crop_img_pair
  (np_imgops.py:31-50).
"""

from __future__ import annotations

import os
import random
from enum import Enum, auto
from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in this image
    cv2 = None


class CropMethod(Enum):
    RAND = auto()
    CENTER = auto()


def load_img(fpath: str) -> np.ndarray:
    """Image file -> float32 RGB array of shape (3, H, W).

    8-bit -> /255, 16-bit -> /65535, float32 TIFF passthrough (values may
    exceed 1.0: highlight reconstruction data must survive).
    """
    if not os.path.isfile(fpath):
        raise FileNotFoundError(fpath)
    if cv2 is None:
        raise RuntimeError("imgio.load_img requires opencv")
    bgr = cv2.imread(fpath, flags=cv2.IMREAD_COLOR + cv2.IMREAD_ANYDEPTH)
    if bgr is None:
        raise ValueError(f"imgio.load_img: could not decode {fpath}")
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).transpose(2, 0, 1)
    if rgb.dtype == np.float32:
        return rgb
    if rgb.dtype == np.uint8:
        return rgb.astype(np.float32) / 255
    if rgb.dtype == np.uint16:
        return rgb.astype(np.float32) / 65535
    raise TypeError(f"imgio.load_img: {fpath} has unsupported dtype {rgb.dtype}")


def load_img_raw(fpath: str) -> Tuple[np.ndarray, float]:
    """Image file -> (HWC array in its STORAGE dtype, scale-to-[0,1]).

    The streaming engine (TileEngine.denoise_raw) normalizes on device, so
    callers that feed it should skip load_img's host-side fp32 divide +
    CHW transpose (~1 s/6 MP on a 1-core host) and pass storage pixels
    straight through — same wire bytes (uint16), zero host prep."""
    if not os.path.isfile(fpath):
        raise FileNotFoundError(fpath)
    if cv2 is None:
        raise RuntimeError("imgio.load_img_raw requires opencv")
    bgr = cv2.imread(fpath, flags=cv2.IMREAD_COLOR + cv2.IMREAD_ANYDEPTH)
    if bgr is None:
        raise ValueError(f"imgio.load_img_raw: could not decode {fpath}")
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    scale = {np.dtype(np.uint8): 255.0, np.dtype(np.uint16): 65535.0,
             np.dtype(np.float32): 1.0}.get(rgb.dtype)
    if scale is None:
        raise TypeError(
            f"imgio.load_img_raw: {fpath} has unsupported dtype {rgb.dtype}")
    return rgb, scale


def _checked_imwrite(path: str, bgr: np.ndarray) -> None:
    """cv2.imwrite returns False on failure (missing dir, unwritable path,
    disk full) instead of raising — silently swallowing that turns a whole
    denoise run into exit-0 data loss. Raise like the imageio branch does."""
    if not cv2.imwrite(path, bgr):
        raise IOError(f"imgio.save_img: cv2 could not write {path} "
                      f"(missing directory, permissions, or disk full?)")


def save_img(img_chw: np.ndarray, path: str) -> None:
    """float32 (3,H,W) -> file. Bit depth by extension:

    .jpg/.jpeg : 8-bit  (clip 0-1)
    .png/.tif  : 16-bit (clip 0-1)
    .tiff      : float32, NO clipping (keeps >1.0 highlights)
    """
    img_chw = np.asarray(img_chw)
    if img_chw.dtype != np.float32:
        img_chw = img_chw.astype(np.float32)
    ext = os.path.splitext(path)[1].lower()
    if ext in (".jpg", ".jpeg"):
        arr = (np.clip(img_chw, 0, 1) * 255).round().astype(np.uint8).transpose(1, 2, 0)
        _checked_imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
    elif ext in (".png", ".tif"):
        arr = (np.clip(img_chw, 0, 1) * 65535).round().astype(np.uint16).transpose(1, 2, 0)
        _checked_imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
    elif ext == ".tiff":
        import imageio.v2 as imageio

        imageio.imwrite(path, img_chw.transpose(1, 2, 0))
    else:
        raise NotImplementedError(f"imgio.save_img: extension of {path}")


def pad_img_pair(img1: np.ndarray, img2: np.ndarray, cs: int):
    """Zero-pad both images of a pair up to at least (cs, cs), centered."""
    xpad0 = max(0, (cs - img1.shape[2]) // 2)
    xpad1 = max(0, cs - img1.shape[2] - xpad0)
    ypad0 = max(0, (cs - img1.shape[1]) // 2)
    ypad1 = max(0, cs - img1.shape[1] - ypad0)
    padding = ((0, 0), (ypad0, ypad1), (xpad0, xpad1))
    return np.pad(img1, padding), np.pad(img2, padding)


def crop_img_pair(img1: np.ndarray, img2: np.ndarray, cs: int,
                  crop_method: CropMethod = CropMethod.RAND,
                  rng: "random.Random" = random):
    """Identical crop of an image pair to (cs, cs); RAND or CENTER."""
    if crop_method is CropMethod.RAND:
        x0 = rng.randint(0, img1.shape[2] - cs)
        y0 = rng.randint(0, img1.shape[1] - cs)
    else:
        x0 = (img1.shape[2] - cs) // 2
        y0 = (img1.shape[1] - cs) // 2
    return img1[:, y0:y0 + cs, x0:x0 + cs], img2[:, y0:y0 + cs, x0:x0 + cs]


def crop_to_multiple(img: np.ndarray, multiple: int = 64) -> np.ndarray:
    """Trim trailing rows/cols so H and W are multiples of ``multiple``."""
    h = img.shape[-2] - img.shape[-2] % multiple
    w = img.shape[-1] - img.shape[-1] % multiple
    return img[..., :h, :w]
