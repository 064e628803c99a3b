"""Tensor (model) parallelism for the conv zoo via GSPMD shardings.

The production UtNet is ~31 M params, so TP is never *required* for it —
data/tile parallelism (parallel/mesh.py, parallel/sharded_engine.py) is
the efficient deployment. This module covers the WEIGHT-memory regime
(huge funit variants): shard every conv weight on its OUTPUT-channel dim
over a ``('model',)`` mesh axis and let GSPMD insert the collectives.
For the ACTIVATION-memory regime — whole-image forwards — out-channel TP
is the wrong tool (activations stay replicated); use
parallel/spatial.SpatialShardedForward, which shards the H axis and
divides activation memory by the mesh size.
No manual collectives: the sharding annotations alone drive XLA to
partition each conv's output channels and resolve the next conv's
input-channel contraction (all-gather or reduce-scatter, its choice) over
ICI — the scaling-book recipe: pick a mesh, annotate, let XLA work.

Correctness is sharding-independent (GSPMD is semantics-preserving);
tests/test_parallel.py asserts bit-level agreement with the single-device
forward on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_model_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("model",))


def _leaf_spec(path_leaf_name: str, shape, n_shards: int) -> P:
    """Out-channel sharding where the dim divides the mesh, else replicate.

    Conv kernels are HWIO (out = last dim); up-conv matmuls are
    (cin, 4*cmid) (out = last dim); biases are (cout,); PReLU 'a' is a
    scalar. Anything whose last dim doesn't divide (e.g. the final 1x1's
    cout=3) stays replicated — GSPMD composes mixed shardings fine.
    """
    if len(shape) == 0:
        return P()
    if shape[-1] % n_shards != 0:
        return P()
    return P(*([None] * (len(shape) - 1) + ["model"]))


def shard_params_tp(params, mesh: Mesh):
    """Place a param pytree with out-channel dims sharded over ``mesh``."""
    n = mesh.devices.size

    def place(x):
        if not hasattr(x, "shape"):
            return x
        spec = _leaf_spec("", x.shape, n)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def tp_forward(apply_fn, mesh: Mesh):
    """jit ``apply_fn(params, x)`` with replicated activations in/out and
    whatever param shardings the arrays carry (use shard_params_tp first).
    GSPMD propagates the channel shardings through every conv."""
    rep = NamedSharding(mesh, P())
    return jax.jit(apply_fn, out_shardings=rep)
