"""ctypes binding for the native host ops (native/tileio.cpp).

The shared library is optional: every entry point has a numpy fallback in
core/tiles.py. ``available()`` reports whether the .so was found; build it
with ``native/build.sh`` (cmake/ninja or plain g++).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False

_C = ctypes.c_int64
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (os.environ.get("NIND_TILEIO_LIB"),
                 os.path.join(here, "native", "build", "libtileio.so"),
                 os.path.join(here, "native", "libtileio.so")):
        if cand and os.path.isfile(cand):
            return cand
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.tileio_symmetric_pad_f32.argtypes = [
        _F32P, _C, _C, _C, _C, _C, _C, _C, _F32P, ctypes.c_int]
    lib.tileio_gather_tiles_f32.argtypes = [
        _F32P, _C, _C, _C, _I32P, _C, _C, _C, _F32P, ctypes.c_int]
    lib.tileio_scatter_add_f32.argtypes = [
        _F32P, _C, _C, _C, _F32P, _C, _C, _C, _C, _I32P, _I32P, _C]
    lib.tileio_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def symmetric_pad(src_hwc: np.ndarray, pt: int, pb: int, pl: int, pr: int,
                  threads: int = 2) -> np.ndarray:
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src_hwc, np.float32)
    h, w, c = src.shape
    dst = np.empty((h + pt + pb, w + pl + pr, c), np.float32)
    lib.tileio_symmetric_pad_f32(src, h, w, c, pt, pb, pl, pr, dst, threads)
    return dst


def gather_tiles(src_hwc: np.ndarray, coords: np.ndarray, cs: int, pad: int,
                 threads: int = 2) -> np.ndarray:
    """Gather tiles straight from the UNPADDED image; coords are padded-frame
    tile origins (TilePlan abs origins)."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src_hwc, np.float32)
    h, w, c = src.shape
    coords = np.ascontiguousarray(coords, np.int32)
    n = coords.shape[0]
    dst = np.empty((n, cs, cs, c), np.float32)
    lib.tileio_gather_tiles_f32(src, h, w, c, coords, n, cs, pad, dst, threads)
    return dst


def scatter_add(canvas_hwc: np.ndarray, tiles: np.ndarray, coords: np.ndarray,
                specs: np.ndarray, pad: int, ucs: int, ol: int) -> None:
    """In-place weighted scatter-add (canvas must be C-contiguous fp32)."""
    lib = _load()
    assert lib is not None
    assert canvas_hwc.flags.c_contiguous and canvas_hwc.dtype == np.float32
    hc, wc, c = canvas_hwc.shape
    tiles = np.ascontiguousarray(tiles, np.float32)
    n, cs = tiles.shape[0], tiles.shape[1]
    lib.tileio_scatter_add_f32(canvas_hwc, hc, wc, c, tiles, n, cs, pad, ucs,
                               np.ascontiguousarray(coords, np.int32),
                               np.ascontiguousarray(specs, np.int32), ol)
