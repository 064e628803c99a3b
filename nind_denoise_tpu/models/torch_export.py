"""JAX parameter-pytree -> PyTorch state_dict exporter (the inverse of
models/torch_import.py).

Round-trip migration support: a generator trained with train/loop.py can be
exported to the reference's checkpoint format and dropped into the PyTorch
tooling (denoise_image.py --model_path, nn_common.Model.instantiate_model —
/root/reference/src/nind_denoise/nn_common.py:116-138 loads a plain
state_dict keyed by the module tree). Exact inverse of the import mappings:

* HWIO conv kernel                  -> ``nn.Conv2d`` (O, I, kh, kw)
* flipped-HWIO plain-conv kernel    -> ``nn.ConvTranspose2d`` k=3 s=1 (I, O, 3, 3)
* (I, 4*O) pixel-shuffle matmul     -> ``nn.ConvTranspose2d`` k=2 s=2 (I, O, 2, 2)
* scalar ``a``                      -> ``nn.PReLU`` weight (1,)
* BN scale/bias + mean/var state    -> ``nn.BatchNorm2d`` (+ num_batches_tracked=0)

Key layout mirrors the reference module trees (UtNet networks/UtNet.py:13-109,
UNet networks/nnModules.py:104-210) — identical to what torch_import reads,
so import(export(p)) is bit-exact (tests/test_torch_export.py).

Pure numpy; torch is only needed by ``save_pt`` to serialize the .pt file.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def conv_w_inv(w) -> np.ndarray:
    """(kh, kw, I, O) -> (O, I, kh, kw)."""
    return np.ascontiguousarray(_np(w).transpose(3, 2, 0, 1))


def tconv3_w_inv(w) -> np.ndarray:
    """flipped (3, 3, I, O) plain-conv kernel -> (I, O, 3, 3)."""
    return np.ascontiguousarray(_np(w).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])


def upconv_w_inv(w) -> np.ndarray:
    """(I, 4*O) matmul matrix, column (u*2+v)*O + o -> (I, O, 2, 2)."""
    w = _np(w)
    i, o4 = w.shape
    o = o4 // 4
    return np.ascontiguousarray(w.reshape(i, 2, 2, o).transpose(0, 3, 1, 2))


def _lay_out(sd: Dict, prefix: str, lay: Dict, kind: str,
             act_key: Optional[str] = None) -> None:
    """Emit one conv-ish layer (+ optional PReLU weight) into ``sd``."""
    wmap = {"conv": conv_w_inv, "tconv3": tconv3_w_inv, "up": upconv_w_inv}[kind]
    sd[prefix + ".weight"] = wmap(lay["w"])
    if "b" in lay:
        sd[prefix + ".bias"] = _np(lay["b"])
    if act_key is not None and "a" in lay:
        sd[act_key + ".weight"] = _np(lay["a"]).reshape(1)


def export_utnet(params: Dict) -> Dict[str, np.ndarray]:
    """UtNet params pytree (models/utnet.py) -> torch state_dict arrays."""
    sd: Dict[str, np.ndarray] = {}

    def double(prefix, tree, kind):
        _lay_out(sd, f"{prefix}.0", tree["c0"], kind, f"{prefix}.1")
        _lay_out(sd, f"{prefix}.2", tree["c1"], kind, f"{prefix}.3")

    for i in range(1, 5):
        double(f"convs{i}", params[f"convs{i}"], "conv")
    _lay_out(sd, "bottom.0", params["bottom"]["c0"], "conv", "bottom.1")
    _lay_out(sd, "bottom.2", params["bottom"]["c1"], "tconv3", "bottom.3")
    for i in range(1, 5):
        _lay_out(sd, f"up{i}", params[f"up{i}"], "up")
    for i in range(1, 4):
        double(f"tconvs{i}", params[f"tconvs{i}"], "tconv3")
    t4 = params["tconvs4"]
    _lay_out(sd, "tconvs4.0", t4["c0"], "tconv3", "tconvs4.1")
    _lay_out(sd, "tconvs4.2", t4["c1"], "tconv3", "tconvs4.3")
    _lay_out(sd, "tconvs4.4", t4["c2"], "conv")
    return sd


def _bn_out(sd: Dict, prefix: str, p: Dict, s: Dict) -> None:
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])
    sd[prefix + ".running_mean"] = _np(s["mean"])
    sd[prefix + ".running_var"] = _np(s["var"])
    # torch BatchNorm2d tracks this buffer; strict load_state_dict needs it
    sd[prefix + ".num_batches_tracked"] = np.zeros((), np.int64)


def export_unet(params: Dict, state: Dict) -> Dict[str, np.ndarray]:
    """UNet (params, state) (models/unet.py) -> torch state_dict arrays."""
    sd: Dict[str, np.ndarray] = {}

    def double(prefix, p, s):
        _lay_out(sd, f"{prefix}.0", p["c0"], "conv")
        _bn_out(sd, f"{prefix}.1", p["bn0"], s["bn0"])
        _lay_out(sd, f"{prefix}.3", p["c1"], "conv")
        _bn_out(sd, f"{prefix}.4", p["bn1"], s["bn1"])

    double("inc.conv.conv", params["inc"], state["inc"])
    for i in range(1, 5):
        double(f"down{i}.mpconv.1.conv", params[f"down{i}"], state[f"down{i}"])
    for i in range(1, 5):
        _lay_out(sd, f"up{i}.up", params[f"up{i}_t"], "up")
        double(f"up{i}.conv.conv", params[f"up{i}"], state[f"up{i}"])
    _lay_out(sd, "outc.conv", params["outc"], "conv")
    return sd


def export_checkpoint(tree, network: str) -> Dict[str, np.ndarray]:
    """Dispatch by architecture name. ``tree`` is params, or {params, state}
    as saved by train/loop (GeneratorWrapper.save_model)."""
    params = tree["params"] if isinstance(tree, dict) and "params" in tree else tree
    state = tree.get("state") if isinstance(tree, dict) else None
    if network == "UtNet":
        return export_utnet(params)
    if network == "UNet":
        if state is None:
            raise ValueError("UNet export needs BatchNorm state (save the "
                             "checkpoint with train/loop, or pass "
                             "{'params':..., 'state':...})")
        return export_unet(params, state)
    raise NotImplementedError(f"torch export for {network} (UtNet and UNet "
                              "are the reference's generator formats)")


def save_pt(sd: Dict[str, np.ndarray], fpath: str) -> str:
    """Serialize as a torch .pt state_dict (requires torch)."""
    import torch

    # np.array copy: torch.from_numpy on a non-writable view (e.g. a
    # jnp-backed buffer) warns and risks aliasing
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in sd.items()}, fpath)
    return fpath
