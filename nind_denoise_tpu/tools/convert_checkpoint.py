"""convert-checkpoint — torch .pt/.pth <-> native .npz, offline.

Forward (torch -> npz): the runtime loads torch checkpoints directly
(models/params_io.load_generator -> models/torch_import), but that path
needs torch installed. Production/serving hosts shouldn't carry a torch
dependency just to read the published ``generator_650.pt`` (reference
registry, src/config/operations.yaml:71-73): convert once with this tool
wherever torch exists, deploy the .npz.

Reverse (npz -> .pt, selected by the destination suffix): a generator
trained with train/loop.py exports to the reference's state_dict format
(models/torch_export.py) so it drops straight into the PyTorch tooling
(/root/reference/src/nind_denoise/denoise_image.py --model_path). UtNet and
UNet — the reference's generator formats.

Both directions are exact: the importer mappings (OIHW->HWIO, transposed
-conv pre-lowering, PReLU shared-parameter handling) and their inverses
round-trip bit-for-bit (tests/test_tools_eval.py::test_convert_checkpoint,
tests/test_torch_export.py).

egrun:
    nind-convert-checkpoint generator_650.pt generator_650.npz --network UtNet
    nind-convert-checkpoint mine_120.npz mine_120.pt --network UtNet
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


def convert_reverse(src: str, dst: str, network: str) -> str:
    from ..models import params_io, torch_export

    tree = params_io.load(src)
    sd = torch_export.export_checkpoint(tree, network)
    return torch_export.save_pt(sd, dst)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torch checkpoint (.pt state_dict or .pth), "
                                "or a native .npz for the reverse direction")
    ap.add_argument("dst", nargs="?",
                    help="output path; .npz (default) or .pt for npz->torch")
    ap.add_argument("--network", default="UtNet",
                    help="architecture (UtNet, UNet, MobileNetV3, a Hul "
                         "discriminator Hul112Disc/Hulb112Disc/Hull112Disc/"
                         "Hulf112Disc, or a Hulb128Net/Hulbs128Net "
                         "generator); reverse (.npz -> .pt) supports all "
                         "but MobileNetV3")
    args = ap.parse_args(argv)
    reverse = args.src.endswith(".npz")
    default_ext = ".pt" if reverse else ".npz"
    dst = args.dst or os.path.splitext(args.src)[0] + default_ext
    try:
        if reverse:
            out = convert_reverse(args.src, dst, args.network)
        else:
            # torch-free even without torch installed: the importer falls
            # back to models/pt_reader.py's zip reader
            out = convert(args.src, dst, args.network)
    except ImportError as e:
        sys.exit(f"error: writing a torch .pt requires torch installed ({e})")
    print(f"converted {args.src} -> {out}")
    return out


if __name__ == "__main__":
    main()
