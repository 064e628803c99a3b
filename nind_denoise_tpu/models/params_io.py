"""Native parameter checkpoint IO + model-path resolution.

Checkpoints are plain ``.npz`` files: pytree leaves stored under
"/"-joined key paths, non-array leaves (bools, meta dicts) in a JSON
sidecar entry. No pickle.

``complete_path`` reproduces the reference's resolution rules
(nn_common.Model.complete_path, /root/reference/src/nind_denoise/
nn_common.py:75-114): a file path is used as-is; a directory resolves to the
best epoch recorded in ``trainres.json['best_epoch']['validation_loss']``,
else the highest-numbered checkpoint; a bare name is looked up under
``models_dpath``. Both ``.npz`` (native) and ``.pt`` (torch state_dict via
models/torch_import.py) files are loadable.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


_META_KEY = "__pytree_meta__"


def _flatten(tree: Any, prefix: str = "") -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            a, m = _flatten(v, f"{prefix}{k}/")
            arrays.update(a)
            meta.update(m)
    elif isinstance(tree, (list, tuple)):
        meta[prefix + "__type__"] = "list" if isinstance(tree, list) else "tuple"
        for i, v in enumerate(tree):
            a, m = _flatten(v, f"{prefix}{i}/")
            arrays.update(a)
            meta.update(m)
    elif tree is None:
        meta[prefix[:-1]] = None
    elif hasattr(tree, "shape"):
        arrays[prefix[:-1]] = np.asarray(tree)
    else:
        meta[prefix[:-1]] = tree  # bool/int/float/str leaf
    return arrays, meta


def _insert(root: dict, path: str, value: Any) -> None:
    parts = path.split("/")
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _listify(node: Any) -> Any:
    if not isinstance(node, dict):
        return node
    t = node.pop("__type__", None)
    out = {k: _listify(v) for k, v in node.items()}
    if t in ("list", "tuple"):
        seq = [out[k] for k in sorted(out, key=int)]
        return seq if t == "list" else tuple(seq)
    return out


def save(tree: Any, fpath: str) -> None:
    arrays, meta = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(fpath)), exist_ok=True)
    np.savez(fpath, **{_META_KEY: np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)}, **arrays)


def load(fpath: str) -> Any:
    with np.load(fpath, allow_pickle=False) as z:
        meta = json.loads(bytes(z[_META_KEY]).decode()) if _META_KEY in z else {}
        root: dict = {}
        for key in z.files:
            if key == _META_KEY:
                continue
            _insert(root, key, z[key])
        for key, val in meta.items():
            _insert(root, key, val)
    return _listify(root)


def find_highest(dpath: str, keyword: str) -> Optional[str]:
    """Highest-epoch checkpoint file ``<keyword>_<epoch>.(npz|pt)`` in dpath.

    The keyword must be followed directly by ``_<epoch>`` so that
    ``discriminator`` does not also match ``discriminator2_*`` files (the
    reference's substring match, nn_common.py find_highest, had that
    ambiguity)."""
    best, best_epoch = None, -1
    for fn in os.listdir(dpath):
        m = re.match(rf"{re.escape(keyword)}_(\d+)\.(npz|pt|pth)$", fn)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = fn, int(m.group(1))
    return os.path.join(dpath, best) if best else None


def find_best(dpath: str, keyword: str) -> Optional[str]:
    """Best-validation-loss epoch from trainres.json (generators only)."""
    if keyword != "generator":
        return None
    resfpath = os.path.join(dpath, "trainres.json")
    if not os.path.isfile(resfpath):
        return None
    with open(resfpath, "r") as fp:
        res = json.load(fp)
    try:
        best_epoch = res["best_epoch"]["validation_loss"]
    except KeyError:
        return None
    for ext in (".npz", ".pt"):
        cand = os.path.join(dpath, f"generator_{best_epoch}{ext}")
        if os.path.isfile(cand):
            return cand
    return None


def complete_path(path: str, models_dpath: Optional[str] = None,
                  keyword: str = "generator") -> str:
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        best = find_best(path, keyword)
        if best is not None:
            return best
        highest = find_highest(path, keyword)
        if highest is not None:
            return highest
        raise FileNotFoundError(f"no {keyword} checkpoints in {path}")
    if models_dpath and os.path.isdir(os.path.join(models_dpath, path)):
        return complete_path(os.path.join(models_dpath, path), None, keyword)
    raise FileNotFoundError(f"model path not found: {path}")


def load_generator(model_path: str, network: str, models_dpath: Optional[str] = None,
                   **kwargs):
    """Resolve + load generator params from .npz or torch .pt."""
    fpath = complete_path(model_path, models_dpath, "generator")
    if fpath.endswith(".npz"):
        tree = load(fpath)
        # native checkpoints may bundle {'params': ..., 'state': ...}
        if isinstance(tree, dict) and "params" in tree:
            return tree["params"], tree.get("state")
        return tree, None
    if fpath.endswith((".pt", ".pth")):
        from . import torch_import

        res = torch_import.import_checkpoint(fpath, network, **kwargs)
        if isinstance(res, tuple):
            return res
        return res, None
    raise ValueError(f"unsupported checkpoint format: {fpath}")


def load_discriminator(model_path: str, network: str,
                       models_dpath: Optional[str] = None,
                       keyword: str = "discriminator") -> Dict[str, Any]:
    """Resolve + load a discriminator checkpoint.

    Returns ``{"params", "state", "opt", "sched"}`` where ``opt``/``sched``
    are None unless the checkpoint is a native .npz that bundled them
    (torch .pt state_dicts carry neither, so a resume from one restarts
    Adam and the plateau window — matching what the reference itself did
    on every resume, nn_common.py:300-305)."""
    fpath = complete_path(model_path, models_dpath, keyword)
    if fpath.endswith(".npz"):
        tree = load(fpath)
        if isinstance(tree, dict) and "params" in tree:
            return {"params": tree["params"], "state": tree.get("state"),
                    "opt": tree.get("opt"), "sched": tree.get("sched")}
        return {"params": tree, "state": None, "opt": None, "sched": None}
    if fpath.endswith((".pt", ".pth")):
        from . import torch_import

        params, state = torch_import.import_checkpoint(fpath, network)
        return {"params": params, "state": state, "opt": None, "sched": None}
    raise ValueError(f"unsupported checkpoint format: {fpath}")
