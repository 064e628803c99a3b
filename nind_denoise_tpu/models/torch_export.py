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


def export_hul_disc(params: Dict, state: Dict, network: str) -> Dict[str, np.ndarray]:
    """Hul discriminator family -> reference-layout state_dict (exact
    inverse of torch_import.import_hul_disc's Sequential-index walk over
    the declarative channel plan; Hul.py:255-417 et al.)."""
    from . import hul

    cls = {"Hul112Disc": hul.Hul112Disc, "Hulb112Disc": hul.Hulb112Disc,
           "Hull112Disc": hul.Hull112Disc, "Hulf112Disc": hul.Hulf112Disc}[network]
    sd: Dict[str, np.ndarray] = {}
    for bname, specs in cls.plan.items():
        idx = 0
        for li, (_cin_m, _cout_m, _k, _dil, _stride, bias, bn) in enumerate(specs):
            lay = params[bname][li]
            sd[f"{bname}.{idx}.weight"] = conv_w_inv(lay["w"])
            if bias:
                sd[f"{bname}.{idx}.bias"] = _np(lay["b"])
            idx += 1
            last_decide = bname == "decide" and li == len(specs) - 1
            if not last_decide:
                if cls.activation == "PReLU":
                    sd[f"{bname}.{idx}.weight"] = _np(lay["a"]).reshape(1)
                idx += 1  # activation occupies a Sequential slot either way
            if bn and cls.use_bn:
                st = state[bname][li]
                sd[f"{bname}.{idx}.weight"] = _np(lay["bn"]["scale"])
                sd[f"{bname}.{idx}.bias"] = _np(lay["bn"]["bias"])
                sd[f"{bname}.{idx}.running_mean"] = _np(st["mean"])
                sd[f"{bname}.{idx}.running_var"] = _np(st["var"])
                sd[f"{bname}.{idx}.num_batches_tracked"] = np.zeros((), np.int64)
                idx += 1
    if "_out_a" in params:
        sd["out_activation.weight"] = _np(params["_out_a"]).reshape(1)
    return sd


def export_hul_gen(params: Dict, network: str) -> Dict[str, np.ndarray]:
    """Hulb128Net / Hulbs128Net -> reference-layout state_dict (inverse of
    torch_import.import_hul_gen; Hul.py:12-250, :421-658)."""
    from . import hul_gen

    cls = {"Hulb128Net": hul_gen.Hulb128Net,
           "Hulbs128Net": hul_gen.Hulbs128Net}[network]
    conv_types = {"c", "d2", "d5", "s3"}
    sd: Dict[str, np.ndarray] = {}
    for bname, specs in hul_gen._PLAN.items():
        idx = 0
        for li, (_cin_m, _cout_m, ltype, _bias) in enumerate(specs):
            lay = params[bname][li]
            wmap = conv_w_inv if ltype in conv_types else tconv3_w_inv
            sd[f"{bname}.{idx}.weight"] = wmap(lay["w"])
            if "b" in lay:
                sd[f"{bname}.{idx}.bias"] = _np(lay["b"])
            idx += 1
            last_head = bname == "dec126to128std" and li == len(specs) - 1
            if not last_head:
                if cls.act == "PReLU":
                    sd[f"{bname}.{idx}.weight"] = _np(lay["a"]).reshape(1)
                idx += 1
    if "_final_a" in params:
        sd["activation.weight"] = _np(params["_final_a"]).reshape(1)
    return sd


_HUL_DISCS = ("Hul112Disc", "Hulb112Disc", "Hull112Disc", "Hulf112Disc")
_HUL_GENS = ("Hulb128Net", "Hulbs128Net")


def export_checkpoint(tree, network: str) -> Dict[str, np.ndarray]:
    """Dispatch by architecture name. ``tree`` is params, or {params, state}
    as saved by train/loop (GeneratorWrapper/DiscriminatorWrapper)."""
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
    if network in _HUL_DISCS:
        if state is None:
            raise ValueError(f"{network} export needs BatchNorm state")
        return export_hul_disc(params, state, network)
    if network in _HUL_GENS:
        return export_hul_gen(params, network)
    raise NotImplementedError(
        f"torch export for {network} (supported: UtNet, UNet, Hul "
        "discriminators, Hulb/Hulbs generators)")


def save_pt(sd: Dict[str, np.ndarray], fpath: str) -> str:
    """Serialize as a torch .pt state_dict (requires torch)."""
    import torch

    # np.array copy: torch.from_numpy on a non-writable view (e.g. a
    # jnp-backed buffer) warns and risks aliasing
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in sd.items()}, fpath)
    return fpath
