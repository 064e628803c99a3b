"""convert-checkpoint — torch .pt/.pth -> native .npz, offline.

The runtime loads torch checkpoints directly (models/params_io.load_generator
-> models/torch_import), but that path needs torch installed. Production/
serving hosts shouldn't carry a torch dependency just to read the published
``generator_650.pt`` (reference registry, src/config/operations.yaml:71-73):
convert once with this tool wherever torch exists, deploy the .npz.

The conversion is exact: the same importer mappings (OIHW->HWIO, transposed
-conv pre-lowering, PReLU shared-parameter handling — models/torch_import.py)
produce the arrays, and params_io round-trips them bit-for-bit
(tests/test_tools_eval.py::test_convert_checkpoint).

egrun:
    nind-convert-checkpoint generator_650.pt generator_650.npz --network UtNet
"""

from __future__ import annotations

import argparse
import os
import sys


def convert(src: str, dst: str, network: str) -> str:
    from ..models import params_io

    params, state = params_io.load_generator(src, network)
    tree = {"params": params, "state": state} if state is not None else params
    params_io.save(tree, dst)
    return dst


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torch checkpoint (.pt state_dict or .pth)")
    ap.add_argument("dst", nargs="?", help="output .npz (default: src with .npz)")
    ap.add_argument("--network", default="UtNet",
                    help="architecture (UtNet, UNet, MobileNetV3, or a Hul "
                         "discriminator: Hul112Disc/Hulb112Disc/"
                         "Hull112Disc/Hulf112Disc)")
    args = ap.parse_args(argv)
    dst = args.dst or os.path.splitext(args.src)[0] + ".npz"
    try:
        out = convert(args.src, dst, args.network)
    except ImportError as e:
        sys.exit(f"error: converting a torch checkpoint requires torch "
                 f"installed ({e})")
    print(f"converted {args.src} -> {out}")
    return out


if __name__ == "__main__":
    main()
