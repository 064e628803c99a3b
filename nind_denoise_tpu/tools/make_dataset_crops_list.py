"""Crop-quality CSV: MS-SSIM for every (gt, noisy) crop pair.

Equivalent of /root/reference/src/nind_denoise/tools/make_dataset_crops_list.py:
1-39 — output consumed by PickyDenoisingDatasetFromList.
"""

from __future__ import annotations

import argparse
import os

from ..train import dataset as ds_mod


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_data", nargs="*", required=True)
    p.add_argument("--out_dir", default="datasets")
    args = p.parse_args(argv)
    ds = ds_mod.DenoisingDataset(args.train_data, cs=None)
    os.makedirs(args.out_dir, exist_ok=True)
    ds.list_content_quality(export=True, outdir=args.out_dir)


if __name__ == "__main__":
    main()
