"""Torch-free reader for PyTorch ``.pt`` state_dict checkpoints.

SURVEY.md §7 hard-part #3: the published production checkpoint
(``generator_650.pt``, /root/reference/src/config/operations.yaml:71-73) is
a torch zip archive; loading it previously required torch installed.
This module reads the zip format directly — ``data.pkl`` deserialized by a
RESTRICTED unpickler (an explicit allow-list of the handful of globals a
plain tensor state_dict references; anything else raises — strictly safer
than ``torch.load(weights_only=True)``'s broader allow-list) with tensor
storages mapped to numpy arrays from the archive's ``data/<key>`` entries.

Supported: dict / OrderedDict state_dicts of CPU tensors and Parameters in
the standard dtypes (fp16/32/64, bf16 via ml_dtypes, int8-64, uint8, bool),
including non-contiguous views, storage offsets, and tensors sharing one
storage. Deliberately NOT supported: whole pickled modules (``.pth``),
sparse/quantized/CUDA layouts, and the pre-1.6 non-zip format — callers get
a clear error and can re-save as a state_dict with any torch install.

``torch_import.load_state_dict`` uses this automatically when torch is not
installed, so inference/serving hosts can consume reference ``.pt``
checkpoints with zero torch dependency (tests/test_pt_reader.py asserts
bit-exact agreement with ``torch.load`` across dtypes and layouts).
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("float32"),
    "DoubleStorage": np.dtype("float64"),
    "HalfStorage": np.dtype("float16"),
    "LongStorage": np.dtype("int64"),
    "IntStorage": np.dtype("int32"),
    "ShortStorage": np.dtype("int16"),
    "CharStorage": np.dtype("int8"),
    "ByteStorage": np.dtype("uint8"),
    "BoolStorage": np.dtype("bool"),
}
try:  # bf16 exists in numpy only via ml_dtypes (shipped with jax)
    import ml_dtypes

    _STORAGE_DTYPES["BFloat16Storage"] = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    pass


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` etc. inside the pickle stream."""

    def __init__(self, name: str):
        if name not in _STORAGE_DTYPES:
            raise ValueError(f"unsupported torch storage type {name}")
        self.dtype = _STORAGE_DTYPES[name]


def _rebuild_tensor_v2(storage: np.ndarray, storage_offset: int, size,
                       stride, requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    """numpy analog of torch._utils._rebuild_tensor_v2: a strided view into
    the flat storage, materialized as a contiguous copy."""
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    offset = int(storage_offset)
    if not size:
        return storage[offset:offset + 1].copy().reshape(())
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[offset:], shape=size,
        strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(view)


def _rebuild_tensor(storage, storage_offset, size, stride):  # pre-v2 rule
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _OD(dict):
    """dict stand-in for collections.OrderedDict: a plain dict cannot take
    the instance state the pickle BUILD op sets (state_dicts carry a
    ``_metadata`` attribute); a subclass can."""


_ALLOWED = {
    ("collections", "OrderedDict"): _OD,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch.serialization", "_get_layout"): lambda name: name,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, fp, storages: Dict[str, np.ndarray]):
        super().__init__(fp)
        self._storages = storages

    def find_class(self, module: str, name: str):
        if (module, name) in _ALLOWED:
            return _ALLOWED[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        raise pickle.UnpicklingError(
            f"pt_reader: global {module}.{name} is not allowed (only plain "
            "tensor state_dicts are supported; re-save whole-module .pth "
            "checkpoints as state_dicts)")

    def persistent_load(self, pid: Any) -> np.ndarray:
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, storage_type, key, _location, _numel = pid
        if key not in self._storages:
            raise pickle.UnpicklingError(f"missing storage record {key!r}")
        raw = self._storages[key]
        return raw.view(storage_type.dtype)


def load_pt_state_dict(fpath_or_bytes) -> Dict[str, np.ndarray]:
    """Read a torch zip-format ``.pt`` checkpoint into {key: ndarray}."""
    if isinstance(fpath_or_bytes, (bytes, bytearray)):
        zf = zipfile.ZipFile(io.BytesIO(fpath_or_bytes))
    else:
        zf = zipfile.ZipFile(fpath_or_bytes)
    with zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(
                "pt_reader: not a torch zip checkpoint (pre-1.6 legacy "
                "format?); re-save with a modern torch or install torch")
        root = pkl[0][:-len("data.pkl")]
        byteorder = "little"
        bo_name = root + "byteorder"
        if bo_name in names:
            byteorder = zf.read(bo_name).decode().strip() or "little"
        if byteorder != "little":  # pragma: no cover - exotic save hosts
            raise ValueError("pt_reader: big-endian checkpoints unsupported")
        storages = {
            n[len(root) + len("data/"):]: np.frombuffer(zf.read(n), np.uint8)
            for n in names
            if n.startswith(root + "data/") and not n.endswith("/")
        }
        obj = _Unpickler(io.BytesIO(zf.read(pkl[0])), storages).load()
    if hasattr(obj, "state_dict"):  # pragma: no cover - guarded by find_class
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"pt_reader: expected a state_dict, got {type(obj)}")
    return obj
