"""File-pair quality metrics (MSE / SSIM / MS-SSIM / PSNR).

Equivalent of ``pt_helpers.get_losses`` (/root/reference/src/nind_denoise/
common/libs/pt_helpers.py:42-50) and ``libimganalysis.piqa_msssim``
(libimganalysis.py:16-19), computed with the JAX losses (ops/losses.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core import imgio


def _pair(img1_fpath: str, img2_fpath: str):
    import jax.numpy as jnp

    a = imgio.load_img(img1_fpath).transpose(1, 2, 0)[None]
    b = imgio.load_img(img2_fpath).transpose(1, 2, 0)[None]
    assert a.shape == b.shape, f"{a.shape=} != {b.shape=}"
    return jnp.asarray(a), jnp.asarray(b)


def get_losses(img1_fpath: str, img2_fpath: str) -> Dict[str, float]:
    """{'mse', 'ssim', 'msssim'} — ssim/msssim as LOSSES (1 - metric),
    matching the reference's res dict semantics."""
    from ..ops import losses as L

    a, b = _pair(img1_fpath, img2_fpath)
    return {
        "mse": float(L.mse_loss(a, b)[0]),
        "ssim": float(L.ssim_loss(a, b)[0]),
        "msssim": float(L.ms_ssim_loss(a, b)[0]),
    }


def msssim_files(img1_fpath: str, img2_fpath: str) -> float:
    """MS-SSIM metric (not loss) between two image files."""
    from ..ops import losses as L

    a, b = _pair(img1_fpath, img2_fpath)
    return float(L.ms_ssim(a, b)[0])


def psnr_files(img1_fpath: str, img2_fpath: str) -> float:
    from ..ops import losses as L

    a, b = _pair(img1_fpath, img2_fpath)
    return float(L.psnr(a, b)[0])


def gen_score(denoised_dir: str, gt_dir: str, outpath: str = None) -> str:
    """Legacy res.txt scorer (loss.py:29-45 parity): per-image SSIM/MSE CSV."""
    import os

    from ..train.dataset import get_baseline_fpath

    lines = []
    baseline = get_baseline_fpath(gt_dir) if os.path.isdir(gt_dir) else gt_dir
    for fn in sorted(os.listdir(denoised_dir)):
        fpath = os.path.join(denoised_dir, fn)
        try:
            res = get_losses(baseline, fpath)
        except Exception as e:
            print(f"gen_score: skipping {fn} ({e})")
            continue
        lines.append(f"{fn},{1 - res['ssim']},{res['mse']}")
    outpath = outpath or os.path.join(denoised_dir, "res.txt")
    with open(outpath, "w") as f:
        f.write("\n".join(["filename,ssim,mse"] + lines) + "\n")
    return outpath
