"""Legacy denoiser zoo: DnCNN and RedCNN (functional JAX, NHWC).

Parity with /root/reference/src/nind_denoise/networks/nnModules.py:

* ``DnCNN`` (:16-60): conv3-SAME + ReLU, (depth-2) x [conv3-SAME(no bias) +
  BN(eps=1e-4, momentum=0.95) + ReLU], final conv3-SAME(no bias);
  ``find_noise=True`` returns ``x - out`` (residual learning).
* ``RedCNN`` (:62-98): encoder/decoder of VALID k5 convs and k5 transposed
  convs with **shared weights across repeats** (the reference reuses the
  same ``self.conv``/``self.deconv`` modules at every depth step — a
  deliberate weight-tied architecture, reproduced here) and additive
  residual skips from encoder checkpoints.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import conv as C
from . import norm
from .utnet import _init_conv


class DnCNN:
    name = "DnCNN"
    kind = "generator"

    @staticmethod
    def init(key, depth: int = 22, n_channels: int = 64, image_channels: int = 3,
             **_ignored) -> Tuple[Dict, Dict]:
        keys = iter(jax.random.split(key, depth + 2))
        params: Dict = {"first": _init_conv(next(keys), 3, 3, image_channels,
                                            n_channels, None)}
        state: Dict = {}
        mids = []
        for i in range(depth - 2):
            lay = _init_conv(next(keys), 3, 3, n_channels, n_channels, None)
            lay.pop("b", None)  # bias=False
            bnp, bns = norm.init(n_channels)
            mids.append({"c": lay, "bn": bnp})
            state[f"bn{i}"] = bns
        params["mid"] = mids
        last = _init_conv(next(keys), 3, 3, n_channels, image_channels, None)
        last.pop("b", None)
        params["last"] = last
        return params, state

    @staticmethod
    def apply(params: Dict, x: jnp.ndarray, state: Dict, train: bool = False,
              find_noise: bool = True, **_ignored):
        y_in = x
        t = jax.nn.relu(C.conv2d(x, params["first"]["w"], params["first"]["b"],
                                 "SAME"))
        new_state: Dict = {}
        for i, lay in enumerate(params["mid"]):
            t = C.conv2d(t, lay["c"]["w"], None, "SAME")
            t, new_state[f"bn{i}"] = norm.apply(lay["bn"], state[f"bn{i}"], t,
                                                train, momentum=0.95, eps=1e-4)
            t = jax.nn.relu(t)
        t = C.conv2d(t, params["last"]["w"], None, "SAME")
        out = y_in - t if find_noise else t
        return out, new_state


class RedCNN:
    name = "RedCNN"
    kind = "generator"

    @staticmethod
    def init(key, n_channels: int = 128, image_channels: int = 3,
             kernel_size: int = 5, depth: int = 30, **_ignored) -> Dict:
        ks = kernel_size
        keys = iter(jax.random.split(key, 4))

        def conv(cin, cout):
            return _init_conv(next(keys), ks, ks, cin, cout, None)

        # transposed convs are stored in plain-conv FULL-padding form (fresh
        # init: same distribution; torch imports flip/transpose the kernels)
        return {
            "conv_first": conv(image_channels, n_channels),
            "conv": conv(n_channels, n_channels),
            "deconv": conv(n_channels, n_channels),
            "deconv_last": conv(n_channels, image_channels),
        }

    @staticmethod
    def apply(params: Dict, x: jnp.ndarray, depth: int = 30,
              **_ignored) -> jnp.ndarray:
        relu = jax.nn.relu
        conv = lambda t, p: relu(C.conv2d(t, p["w"], p["b"], "VALID"))
        deconv = lambda t, p: relu(C.conv2d(t, p["w"], p["b"], "FULL"))
        residuals = []
        t = conv(x, params["conv_first"])
        t = conv(t, params["conv"])
        residuals.append(t)
        for _ in range((depth - 6) // 2):
            t = conv(t, params["conv"])
            t = conv(t, params["conv"])
            residuals.append(t)
        t = conv(t, params["conv"])
        t = deconv(t, params["deconv"])
        t = relu(t + residuals.pop())
        for _ in range((depth - 6) // 2):
            t = deconv(t, params["deconv"])
            t = deconv(t, params["deconv"])
            t = relu(t + residuals.pop())
        t = deconv(t, params["deconv"])
        return relu(deconv(t, params["deconv_last"]))
