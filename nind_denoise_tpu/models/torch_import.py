"""PyTorch checkpoint -> JAX parameter-pytree importer.

Loads the reference's ``.pt`` state_dicts (e.g. the published
``generator_650.pt``, registry at /root/reference/src/config/operations.yaml:71-73)
and converts them to this framework's conv-native layout:

* ``nn.Conv2d``           weight (O, I, kh, kw)  -> HWIO
* ``nn.ConvTranspose2d``  k=3 s=1 weight (I, O, 3, 3)
      -> spatially-flipped HWIO plain-conv kernel (FULL padding at apply time)
* ``nn.ConvTranspose2d``  k=2 s=2 weight (I, O, 2, 2)
      -> (I, 4*O) matmul matrix with column index (u*2+v)*O + o
        (consumed by ops.conv.upconv2x as 1x1-conv + pixel shuffle)
* ``nn.PReLU``            weight (1,) -> scalar ``a``
* ``nn.BatchNorm2d``      weight/bias -> scale/bias params;
                          running_mean/var -> state

Key maps follow the reference module trees: UtNet (networks/UtNet.py:13-109)
and UNet (networks/nnModules.py:104-210).

torch (CPU) is imported lazily and only used to deserialize; all math stays
numpy/JAX.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):  # torch-free path (pt_reader)
        return np.asarray(t, dtype=np.float32)
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def conv_w(t) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def tconv3_w(t) -> np.ndarray:
    """(I, O, 3, 3) -> flipped (3, 3, I, O) plain-conv kernel."""
    w = _np(t)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def upconv_w(t) -> np.ndarray:
    """(I, O, 2, 2) -> (I, 4*O), column (u*2+v)*O + o."""
    w = _np(t)
    i, o = w.shape[0], w.shape[1]
    return np.ascontiguousarray(w.transpose(0, 2, 3, 1).reshape(i, 4 * o))


def load_state_dict(fpath: str) -> Dict[str, "np.ndarray"]:
    try:
        import torch
    except ImportError:
        # torch-free host (production/serving): read the zip checkpoint
        # directly (models/pt_reader.py) — no torch dependency needed to
        # consume reference .pt files
        from . import pt_reader

        return pt_reader.load_pt_state_dict(fpath)
    sd = torch.load(fpath, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd


def _prelu(sd, key) -> Optional[np.ndarray]:
    if key in sd:
        return _np(sd[key]).reshape(())
    return None


def _lay(sd, prefix, kind, act_key=None) -> Dict:
    """One conv-ish layer + optional following PReLU param."""
    wmap = {"conv": conv_w, "tconv3": tconv3_w, "up": upconv_w}[kind]
    lay = {"w": wmap(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        lay["b"] = _np(sd[prefix + ".bias"])
    if act_key is not None:
        a = _prelu(sd, act_key + ".weight")
        if a is not None:
            lay["a"] = a
    return lay


def import_utnet(fpath_or_sd, funit: int = 64) -> Dict:
    """torch UtNet state_dict -> UtNet params pytree (models/utnet.py)."""
    sd = load_state_dict(fpath_or_sd) if isinstance(fpath_or_sd, str) else fpath_or_sd

    def double(prefix, kind):
        return {
            "c0": _lay(sd, f"{prefix}.0", kind, f"{prefix}.1"),
            "c1": _lay(sd, f"{prefix}.2", kind, f"{prefix}.3"),
        }

    params = {
        "convs1": double("convs1", "conv"),
        "convs2": double("convs2", "conv"),
        "convs3": double("convs3", "conv"),
        "convs4": double("convs4", "conv"),
        "bottom": {
            "c0": _lay(sd, "bottom.0", "conv", "bottom.1"),
            "c1": _lay(sd, "bottom.2", "tconv3", "bottom.3"),
        },
        "up1": _lay(sd, "up1", "up"),
        "tconvs1": double("tconvs1", "tconv3"),
        "up2": _lay(sd, "up2", "up"),
        "tconvs2": double("tconvs2", "tconv3"),
        "up3": _lay(sd, "up3", "up"),
        "tconvs3": double("tconvs3", "tconv3"),
        "up4": _lay(sd, "up4", "up"),
        "tconvs4": {
            "c0": _lay(sd, "tconvs4.0", "tconv3", "tconvs4.1"),
            "c1": _lay(sd, "tconvs4.2", "tconv3", "tconvs4.3"),
            "c2": _lay(sd, "tconvs4.4", "conv"),
        },
    }
    return params


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    p = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    s = {"mean": _np(sd[prefix + ".running_mean"]), "var": _np(sd[prefix + ".running_var"])}
    return p, s


def import_unet(fpath_or_sd) -> Tuple[Dict, Dict]:
    """torch UNet state_dict -> (params, state) for models/unet.py."""
    sd = load_state_dict(fpath_or_sd) if isinstance(fpath_or_sd, str) else fpath_or_sd

    def double(prefix):
        p0 = _lay(sd, f"{prefix}.0", "conv")
        bn0p, bn0s = _bn(sd, f"{prefix}.1")
        p1 = _lay(sd, f"{prefix}.3", "conv")
        bn1p, bn1s = _bn(sd, f"{prefix}.4")
        return ({"c0": p0, "bn0": bn0p, "c1": p1, "bn1": bn1p},
                {"bn0": bn0s, "bn1": bn1s})

    params: Dict = {}
    state: Dict = {}
    params["inc"], state["inc"] = double("inc.conv.conv")
    for i in range(1, 5):
        params[f"down{i}"], state[f"down{i}"] = double(f"down{i}.mpconv.1.conv")
    for i in range(1, 5):
        params[f"up{i}_t"] = _lay(sd, f"up{i}.up", "up")
        params[f"up{i}"], state[f"up{i}"] = double(f"up{i}.conv.conv")
    params["outc"] = _lay(sd, "outc.conv", "conv")
    return params, state


def import_mobilenetv3(fpath_or_sd) -> Tuple[Dict, Dict]:
    """torchvision lraspp_mobilenet_v3_large state_dict (with or without the
    reference wrapper's ``net.`` prefix, ThirdPartyNets.py:171-179) ->
    (params, state) for models/third_party.MobileNetV3."""
    from .third_party import _LARGE_DILATED

    sd = load_state_dict(fpath_or_sd) if isinstance(fpath_or_sd, str) else fpath_or_sd
    if any(k.startswith("net.") for k in sd):
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("net.")}

    def cbn(conv_prefix, bn_prefix):
        lay = {"w": conv_w(sd[conv_prefix + ".weight"])}
        bnp, bns = _bn(sd, bn_prefix)
        lay["bn"] = bnp
        return lay, bns

    backbone, bstate = [], []
    lay, st = cbn("backbone.0.0", "backbone.0.1")
    backbone.append(lay)
    bstate.append({"bn": st})
    cin = 16
    for i, (k, exp, cout, use_se, _a, _s, _d) in enumerate(_LARGE_DILATED):
        p = f"backbone.{i + 1}.block"
        blk: Dict = {}
        bst: Dict = {}
        j = 0
        if exp != cin:
            blk["expand"], bst["expand"] = cbn(f"{p}.{j}.0", f"{p}.{j}.1")
            j += 1
        blk["dw"], bst["dw"] = cbn(f"{p}.{j}.0", f"{p}.{j}.1")
        j += 1
        if use_se:
            blk["se"] = {
                "fc1": {"w": conv_w(sd[f"{p}.{j}.fc1.weight"]),
                        "b": _np(sd[f"{p}.{j}.fc1.bias"])},
                "fc2": {"w": conv_w(sd[f"{p}.{j}.fc2.weight"]),
                        "b": _np(sd[f"{p}.{j}.fc2.bias"])},
            }
            j += 1
        blk["project"], bst["project"] = cbn(f"{p}.{j}.0", f"{p}.{j}.1")
        backbone.append(blk)
        bstate.append(bst)
        cin = cout
    lay, st = cbn("backbone.16.0", "backbone.16.1")
    backbone.append(lay)
    bstate.append({"bn": st})

    cbr, cbr_st = cbn("classifier.cbr.0", "classifier.cbr.1")
    params = {
        "backbone": backbone,
        "classifier": {
            "cbr": cbr,
            "scale": {"w": conv_w(sd["classifier.scale.1.weight"])},
            "low_classifier": {"w": conv_w(sd["classifier.low_classifier.weight"]),
                               "b": _np(sd["classifier.low_classifier.bias"])},
            "high_classifier": {"w": conv_w(sd["classifier.high_classifier.weight"]),
                                "b": _np(sd["classifier.high_classifier.bias"])},
        },
    }
    state = {"backbone": bstate, "classifier": {"cbr": cbr_st}}
    return params, state


def import_hul_disc(fpath_or_sd, network: str) -> Tuple[Dict, Dict]:
    """Hul discriminator family torch state_dict -> (params, state).

    The reference builds every block as an nn.Sequential of
    Conv2d -> activation -> [BatchNorm2d] triples (Hul112Disc
    Hul.py:255-417, Hulb112Disc :663-802 [no BN], Hull112Disc :806-968
    [LeakyReLU], Hulf112Disc :972-1134 [6-ch, wide]), so state_dict keys
    are ``<block>.<seq_idx>.<param>``. PReLU carries a scalar ``weight``;
    LeakyReLU is parameterless but still occupies a Sequential slot; the
    decide head's last conv has no activation module after it.

    Only the ``finalpool=False`` wiring is supported (the rebuild's
    models/hul.py implements that branch); finalpool checkpoints have a
    different decide head (1x1 first conv instead of 2x2) and are rejected
    with a shape check. ``funit``/``input_channels`` are inferred from the
    first conv's weight.
    """
    from . import hul

    sd = fpath_or_sd if isinstance(fpath_or_sd, dict) else load_state_dict(fpath_or_sd)
    cls = {"Hul112Disc": hul.Hul112Disc, "Hulb112Disc": hul.Hulb112Disc,
           "Hull112Disc": hul.Hull112Disc, "Hulf112Disc": hul.Hulf112Disc}[network]
    dk = "decide.0.weight"
    if sd[dk].shape[-1] != cls.plan["decide"][0][2]:
        raise ValueError(
            f"{network}: decide head kernel {tuple(sd[dk].shape)} does not "
            "match the finalpool=False wiring (finalpool checkpoints are "
            "not supported)")
    params: Dict = {}
    state: Dict = {}
    for bname, specs in cls.plan.items():
        bp, bs = [], []
        idx = 0
        for li, (_cin_m, _cout_m, k, _dil, _stride, bias, bn) in enumerate(specs):
            key = f"{bname}.{idx}.weight"
            w = sd[key]
            if w.shape[-1] != k:
                raise ValueError(f"{network}: {key} kernel {tuple(w.shape)} "
                                 f"!= plan k={k}")
            layer = {"w": conv_w(w)}
            if bias:
                layer["b"] = _np(sd[f"{bname}.{idx}.bias"])
            idx += 1
            last_decide = bname == "decide" and li == len(specs) - 1
            if not last_decide:
                if cls.activation == "PReLU":
                    layer["a"] = _np(sd[f"{bname}.{idx}.weight"]).reshape(())
                idx += 1  # activation occupies a Sequential slot either way
            if bn and cls.use_bn:
                layer["bn"] = {"scale": _np(sd[f"{bname}.{idx}.weight"]),
                               "bias": _np(sd[f"{bname}.{idx}.bias"])}
                bs.append({"mean": _np(sd[f"{bname}.{idx}.running_mean"]),
                           "var": _np(sd[f"{bname}.{idx}.running_var"])})
                idx += 1
            else:
                bs.append(None)
            bp.append(layer)
        params[bname] = bp
        state[bname] = bs
    if "out_activation.weight" in sd:
        params["_out_a"] = _np(sd["out_activation.weight"]).reshape(())
    return params, state


def import_hul_gen(fpath_or_sd, network: str) -> Dict:
    """Hulb128Net / Hulbs128Net torch state_dict -> params.

    Reference layout (Hul.py:12-250 Hulb, :421-658 Hulbs): Sequential
    blocks of (Conv2d|ConvTranspose2d) -> activation, no BatchNorm; PReLU
    carries a scalar ``weight``, SELU (Hulbs) is parameterless but still
    occupies a Sequential slot; the final head's 1x1 ConvTranspose2d has no
    activation module after it (Hul.py:197-202); the module-level
    ``activation`` attribute holds the optional output PReLU (:204-213).
    Transposed-conv weights (I, O, kh, kw) pre-lower to flipped HWIO plain
    -conv kernels (1x1 tconv == 1x1 conv, flip is a no-op)."""
    from . import hul_gen

    sd = fpath_or_sd if isinstance(fpath_or_sd, dict) else load_state_dict(fpath_or_sd)
    cls = {"Hulb128Net": hul_gen.Hulb128Net,
           "Hulbs128Net": hul_gen.Hulbs128Net}[network]
    conv_types = {"c", "d2", "d5", "s3"}
    params: Dict = {}
    for bname, specs in hul_gen._PLAN.items():
        layers = []
        idx = 0
        for li, (_cin_m, _cout_m, ltype, _bias) in enumerate(specs):
            wmap = conv_w if ltype in conv_types else tconv3_w
            lay = {"w": wmap(sd[f"{bname}.{idx}.weight"])}
            if f"{bname}.{idx}.bias" in sd:
                lay["b"] = _np(sd[f"{bname}.{idx}.bias"])
            idx += 1
            last_head = bname == "dec126to128std" and li == len(specs) - 1
            if not last_head:
                if cls.act == "PReLU":
                    lay["a"] = _np(sd[f"{bname}.{idx}.weight"]).reshape(())
                idx += 1  # activation occupies a Sequential slot either way
            layers.append(lay)
        params[bname] = layers
    if "activation.weight" in sd:
        params["_final_a"] = _np(sd["activation.weight"]).reshape(())
    return params


_HUL_DISCS = ("Hul112Disc", "Hulb112Disc", "Hull112Disc", "Hulf112Disc")
_HUL_GENS = ("Hulb128Net", "Hulbs128Net")


def import_checkpoint(fpath: str, network: str, **kwargs):
    """Dispatch by architecture name. Returns params or (params, state)."""
    if network == "UtNet":
        return import_utnet(fpath, **kwargs)
    if network == "UNet":
        return import_unet(fpath, **kwargs)
    if network == "MobileNetV3":
        return import_mobilenetv3(fpath)
    if network in _HUL_DISCS:
        return import_hul_disc(fpath, network)
    if network in _HUL_GENS:
        return import_hul_gen(fpath, network)
    raise NotImplementedError(f"torch import for {network}")
