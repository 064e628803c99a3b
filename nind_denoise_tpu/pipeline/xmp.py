"""darktable XMP sidecar history splitting.

Behavioral parity with ``parse_darktable_history_stack``
(/root/reference/src/denoise.py:153-220). A darktable sidecar carries the
full edit-history stack; the pipeline splits it into:

* ``.s1.xmp`` — first-stage ops only (RAW development that must happen
  before denoising: rawprepare, temperature, demosaic, ...). Ops not in the
  first-stage list are removed; ``flip`` is kept but disabled so tile
  geometry stays upright.
* ``.s2.xmp`` — second-stage ops (tone curves, sharpening, ...). Ops that
  are first-stage-only are removed; unknown ops are kept (K/K/R/K rule);
  per-op attribute overrides from the config are applied (notably the
  ``colorin`` params blob); ``iop_order_version`` is forced to 5 and
  ``colorin`` is moved right next to ``demosaic`` in the iop order list.

``--nightmode`` moves ``exposure``/``toneequal`` into the first stage so
brightness is normalized before denoising (read_config,
src/denoise.py:126-151).
"""

from __future__ import annotations

import copy
import io
import os
import pathlib
from typing import Dict, Optional

import yaml

from bs4 import BeautifulSoup

DEFAULT_OPERATIONS_FPATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "operations.yaml")
NIGHTMODE_OPS = ("exposure", "toneequal")


def read_config(config_path: Optional[str] = None, nightmode: bool = False,
                verbose: bool = False) -> Dict:
    """Load the pipeline operations config; nightmode rewrites the op split."""
    config_path = config_path or DEFAULT_OPERATIONS_FPATH
    with io.open(config_path, "r", encoding="utf-8") as fp:
        cfg = yaml.safe_load(fp)
    if nightmode:
        if verbose:
            print("Updating ops for nightmode ...")
        for op in NIGHTMODE_OPS:
            if op not in cfg["operations"]["first_stage"]:
                cfg["operations"]["first_stage"].append(op)
            if op in cfg["operations"]["second_stage"]:
                cfg["operations"]["second_stage"].remove(op)
    return cfg


def split_history(input_xmp: pathlib.Path, config: Dict, verbose: bool = False) -> None:
    """Write <stem>.s1.xmp and <stem>.s2.xmp next to the sidecar."""
    operations = config["operations"]
    first = set(operations["first_stage"])
    second = set(operations["second_stage"])
    overrides = operations.get("overrides", {})

    sidecar_xml = pathlib.Path(input_xmp).read_text()
    sidecar = BeautifulSoup(sidecar_xml, "xml")
    history = sidecar.find("darktable:history")
    if history is None:
        raise ValueError(f"no darktable:history in {input_xmp}")
    history_org = copy.copy(history)

    ops = history.find_all("rdf:li")
    ops.sort(key=lambda tag: int(tag["darktable:num"]))

    # ---- stage 1: keep only first-stage ops; disable flip ----
    for op in reversed(ops):
        name = op["darktable:operation"]
        if name not in first:
            op.extract()
            if verbose:
                print("s1 removed:", name)
        elif name == "flip":
            op["darktable:enabled"] = "0"

    s1_path = input_xmp.with_suffix(".s1.xmp")
    s1_path.unlink(missing_ok=True)
    s1_path.write_text(sidecar.prettify())

    # ---- stage 2: restore, then apply the keep/keep/remove/keep rule ----
    history.replace_with(history_org)
    for op in reversed(history_org.find_all("rdf:li")):
        name = op["darktable:operation"]
        if name not in second and name in first:
            op.extract()  # first-stage-only op: already applied in stage 1
            if verbose:
                print("s2 removed:", name)
        elif name in overrides:
            for key, val in overrides[name].items():
                op[key] = val

    desc = sidecar.find("rdf:Description")
    desc["darktable:iop_order_version"] = "5"
    if desc.has_attr("darktable:iop_order_list"):
        desc["darktable:iop_order_list"] = (
            desc["darktable:iop_order_list"]
            .replace("colorin,0,", "")
            .replace("demosaic,0", "demosaic,0,colorin,0"))

    s2_path = input_xmp.with_suffix(".s2.xmp")
    s2_path.unlink(missing_ok=True)
    s2_path.write_text(sidecar.prettify())
