"""Image quality losses in JAX: SSIM, MS-SSIM, L1/MSE, PSNR.

Semantics follow the reference's loss stack (pt_losses.SSIM_loss /
MS_SSIM_loss wrap piqa with ``reduction=None`` and return ``1 - metric``
per sample; /root/reference/src/nind_denoise/common/libs/pt_losses.py:6-18):

* Gaussian window 11, sigma 1.5, normalized; separable depthwise VALID convs
  (no padding), value_range 1.0, k1=0.01, k2=0.03.
* MS-SSIM: 5 scales with weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
  2x average-pool downsampling with ceil_mode=True between scales, relu-
  clamped cs/ss, product of powers, mean over channels. Minimum input size
  162 (pt_losses.py:29).

All functions are per-sample (reduction=None); wrap with ``.mean()`` for a
scalar. NHWC layout.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .conv import avgpool2x_ceil

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
MS_SSIM_MIN_SIZE = 162


def gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    half = (size - 1) / 2
    x = jnp.arange(size, dtype=jnp.float32) - half
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _depthwise_sep_conv(x: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise VALID conv of NHWC x with a 1D kernel (both axes)."""
    c = x.shape[-1]
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(k1d[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(k1d[None, :, None, None], (1, 1, 1, c))
    x = lax.conv_general_dilated(x, kh.astype(x.dtype), (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 preferred_element_type=jnp.float32).astype(x.dtype)
    x = lax.conv_general_dilated(x, kw.astype(x.dtype), (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 preferred_element_type=jnp.float32).astype(x.dtype)
    return x


def ssim_per_channel(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
                     sigma: float = 1.5, value_range: float = 1.0,
                     k1: float = 0.01, k2: float = 0.03
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ssim, cs), each (N, C): spatial means per sample/channel."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = (k1 * value_range) ** 2
    c2 = (k2 * value_range) ** 2
    k = gaussian_kernel(window_size, sigma)
    mu_x = _depthwise_sep_conv(x, k)
    mu_y = _depthwise_sep_conv(y, k)
    mu_xx = _depthwise_sep_conv(x * x, k)
    mu_yy = _depthwise_sep_conv(y * y, k)
    mu_xy = _depthwise_sep_conv(x * y, k)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    cs_map = (2 * cov + c2) / (var_x + var_y + c2)
    ss_map = (2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1) * cs_map
    return ss_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def ssim(x: jnp.ndarray, y: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """(N,) per-sample SSIM (mean over channels)."""
    ss, _ = ssim_per_channel(x, y, **kwargs)
    return ss.mean(axis=-1)


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, weights=MS_SSIM_WEIGHTS,
            **kwargs) -> jnp.ndarray:
    """(N,) per-sample MS-SSIM."""
    if min(x.shape[1], x.shape[2]) < MS_SSIM_MIN_SIZE:
        # shapes are static under jit, so this fails cleanly at trace time —
        # matching the reference's explicit check (pt_losses.py:29) instead
        # of a negative-dim conv error at scale 5
        raise ValueError(
            f"ms_ssim needs inputs >= {MS_SSIM_MIN_SIZE} px per side "
            f"(got {x.shape[1]}x{x.shape[2]}): the 5-scale pyramid's 11-tap "
            f"VALID windows run out of pixels below that")
    w = jnp.asarray(weights, jnp.float32)
    css = []
    ss = None
    for i in range(len(weights)):
        if i > 0:
            x = avgpool2x_ceil(x)
            y = avgpool2x_ceil(y)
        ss, cs = ssim_per_channel(x, y, **kwargs)
        css.append(jax.nn.relu(cs))
    stack = jnp.stack(css[:-1] + [jax.nn.relu(ss)], axis=-1)  # (N, C, S)
    msss = jnp.prod(stack ** w, axis=-1)
    return msss.mean(axis=-1)


def ssim_loss(x, y, **kwargs):
    """1 - SSIM per sample (reference SSIM_loss semantics)."""
    return 1.0 - ssim(x, y, **kwargs)


def ms_ssim_loss(x, y, **kwargs):
    """1 - MS-SSIM per sample (reference MS_SSIM_loss semantics)."""
    return 1.0 - ms_ssim(x, y, **kwargs)


def mse_loss(x, y):
    return jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2,
                    axis=(1, 2, 3))


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)),
                    axis=(1, 2, 3))


def psnr(x, y, value_range: float = 1.0):
    m = mse_loss(x, y)
    return 10.0 * jnp.log10(value_range ** 2 / m)
