"""Convolution primitives, NHWC, formulated for the TPU MXU.

Design notes (this is where the rebuild deliberately departs from the
reference's torch modules, /root/reference/src/nind_denoise/networks/UtNet.py):

* PyTorch ``ConvTranspose2d(k=3, stride=1)`` == a plain convolution with the
  spatially-flipped kernel, swapped in/out channels, and FULL padding. We do
  the kernel transform once at parameter-import time, so the forward pass is
  a single ``lax.conv_general_dilated`` that XLA tiles straight onto the MXU.
* PyTorch ``ConvTranspose2d(k=2, stride=2)`` (the U-Net up-convs) is exactly
  a 1x1 convolution to ``4*out`` channels followed by a 2x2 pixel-shuffle
  (depth_to_space). A 1x1 conv is a pure matmul — the best possible op for
  the systolic array — and the pixel shuffle is a free layout change for XLA.
* float32 convs take ``preferred_element_type=float32``; bfloat16 convs
  leave it unset (the MXU still accumulates them in fp32 internally, and an
  explicit f32 output breaks the conv transpose rule under differentiation
  — f32 cotangents meet bf16 operands; see ``_pet``).

Parameter convention: plain convs store kernels as HWIO; up-convs store the
(in, 4*out) matmul matrix with output channel index c = (u*2+v)*out + o for
sub-pixel position (u, v).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def _pet(dtype):
    """f32 accumulation-output for f32 inputs, unset for bf16 (differentiable)."""
    return jnp.float32 if dtype == jnp.float32 else None


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           padding: str | Tuple[Tuple[int, int], Tuple[int, int]] = "VALID",
           stride: int = 1) -> jnp.ndarray:
    """NHWC conv with fp32 accumulation. ``padding``: 'VALID', 'SAME', 'FULL'
    or explicit ((t,b),(l,r))."""
    if padding == "FULL":
        kh, kw = w.shape[0], w.shape[1]
        padding = ((kh - 1, kh - 1), (kw - 1, kw - 1))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DN, preferred_element_type=_pet(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def tconv2d_k3s1(x: jnp.ndarray, w_conv: jnp.ndarray,
                 b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PyTorch ConvTranspose2d(k=3, s=1, p=0) with the kernel already
    converted to plain-conv HWIO form (see ``torch_import``): FULL-padded
    conv, output spatial = input + 2."""
    return conv2d(x, w_conv, b, padding="FULL")


def conv2d_torch(x: jnp.ndarray, w: jnp.ndarray,
                 b: Optional[jnp.ndarray] = None, stride: int = 1,
                 dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """torch Conv2d with padding=(k-1)//2*dilation (torchvision
    Conv2dNormActivation's default 'same-ish' padding), optional groups
    (depthwise when groups == C_in, HWIO weight with I=1)."""
    k = w.shape[0]
    p = (k - 1) // 2 * dilation
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((p, p), (p, p)), rhs_dilation=(dilation, dilation),
        feature_group_count=groups, dimension_numbers=dn,
        preferred_element_type=_pet(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def conv2d_dilated(x: jnp.ndarray, w: jnp.ndarray,
                   b: Optional[jnp.ndarray] = None,
                   dilation: int = 2, stride: int = 1) -> jnp.ndarray:
    """VALID conv with rhs dilation (torch Conv2d(dilation=d, padding=0))."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding="VALID",
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        preferred_element_type=_pet(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def tconv2d_k3s1_dil(x: jnp.ndarray, w_conv: jnp.ndarray,
                     b: Optional[jnp.ndarray] = None,
                     dilation: int = 2) -> jnp.ndarray:
    """PyTorch ConvTranspose2d(k=3, s=1, dilation=d, p=0) with the kernel in
    plain-conv HWIO form: rhs-dilated conv, pad d*(k-1) per side; output
    spatial = input + 2*d."""
    d = dilation
    dn = lax.conv_dimension_numbers(x.shape, w_conv.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w_conv.astype(x.dtype), window_strides=(1, 1),
        padding=((2 * d, 2 * d), (2 * d, 2 * d)), rhs_dilation=(d, d),
        dimension_numbers=dn, preferred_element_type=_pet(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def tconv2d_k3s3(x: jnp.ndarray, w_conv: jnp.ndarray,
                 b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PyTorch ConvTranspose2d(k=3, s=3, p=0) with the kernel in plain-conv
    HWIO form: lhs-dilated conv with symmetric padding 2; output = 3x input."""
    dn = lax.conv_dimension_numbers(x.shape, w_conv.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w_conv.astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(3, 3), dimension_numbers=dn,
        preferred_element_type=_pet(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def upconv2x(x: jnp.ndarray, w_mat: jnp.ndarray,
             b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PyTorch ConvTranspose2d(k=2, s=2, p=0) as matmul + pixel shuffle.

    ``w_mat``: (in, 4*out) with column index (u*2+v)*out + o.
    Output: (N, 2H, 2W, out).
    """
    n, h, wdt, _ = x.shape
    cout4 = w_mat.shape[1]
    cout = cout4 // 4
    y = jnp.einsum("nhwi,io->nhwo", x, w_mat.astype(x.dtype),
                   preferred_element_type=_pet(x.dtype)).astype(x.dtype)
    y = y.reshape(n, h, wdt, 2, 2, cout)            # (..., u, v, o)
    y = y.transpose(0, 1, 3, 2, 4, 5)               # (n, h, u, w, v, o)
    y = y.reshape(n, 2 * h, 2 * wdt, cout)
    if b is not None:
        y = (y.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return y


def maxpool2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool, VALID (floors odd dims like torch MaxPool2d)."""
    # init must be CONCRETE (a traced array breaks reduce_window's autodiff
    # rule) and must match the operand dtype exactly (int8 operands reject
    # a weak-typed python int) — a typed numpy scalar satisfies both.
    import numpy as np

    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else np.asarray(jnp.iinfo(x.dtype).min, np.dtype(x.dtype)))
    return lax.reduce_window(
        x, init,
        lax.max, window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID")


def avgpool2x_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool with ceil_mode=True semantics (as used by
    piqa's MS-SSIM downsampling): edge windows average over the valid
    elements only."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    xs = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    ones = jnp.ones((1, h, w, 1), dtype=x.dtype)
    ones = jnp.pad(ones, ((0, 0), (0, ph), (0, pw), (0, 0)))
    s = lax.reduce_window(xs, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return s / cnt


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch ReflectionPad2d (no edge duplication) on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def crop2(x: jnp.ndarray, pad: int = 2) -> jnp.ndarray:
    """torch ZeroPad2d(-pad): crop ``pad`` pixels from each spatial side.
    pad=0 is the identity (x[:, 0:-0] would be an EMPTY slice)."""
    if pad == 0:
        return x
    return x[:, pad:-pad, pad:-pad, :]


# -- activations --------------------------------------------------------------

def prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """PReLU with torch's default single shared parameter."""
    a = a.astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def apply_activation(x: jnp.ndarray, name: str, a: Optional[jnp.ndarray]) -> jnp.ndarray:
    if name == "PReLU":
        return prelu(x, a)
    if name == "ELU":
        return jax.nn.elu(x)
    if name == "Hardswish":
        return jax.nn.hard_swish(x)
    if name == "LeakyReLU":
        return jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "SELU":
        return jax.nn.selu(x)
    if name == "ReLU":
        return jax.nn.relu(x)
    raise ValueError(f"unknown activation: {name}")
