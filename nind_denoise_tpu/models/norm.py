"""Functional BatchNorm with torch-compatible semantics.

Used by the legacy UNet generator and the Hul discriminators. Torch defaults:
eps=1e-5, momentum=0.1, running stats updated with unbiased batch variance,
normalization uses biased batch variance in train mode and running stats in
eval mode.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def init(c: int) -> Tuple[Dict, Dict]:
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def apply(params: Dict, state: Dict, x: jnp.ndarray, train: bool,
          momentum: float = MOMENTUM, eps: float = EPS):
    """x: NHWC. Returns (y, new_state)."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    y = (x.astype(jnp.float32) - mean) * inv * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


def instance_norm(x: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """torch InstanceNorm2d defaults (affine=False, no running stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)
