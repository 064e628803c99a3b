"""Device mesh + sharding helpers for multi-chip scale-out.

The reference is strictly single-process single-device (SURVEY.md §2.9,
§5.8: no torch.distributed anywhere). The TPU-native scale-out strategy for
this workload (a ~31 M-param conv net over independent tiles/crops) is:

* **Data parallelism** — training batches and inference tile batches shard
  over a 1-D ``('data',)`` mesh; parameters are replicated (124 MB fp32 is
  trivially replicable). XLA inserts the gradient all-reduce over ICI from
  the sharding annotations alone.
* **Tile parallelism** — the image analog of sequence/context parallelism:
  each chip denoises disjoint tiles; halos are read-only from the source
  image so no inter-chip exchange is needed (SURVEY.md §5.7).

``jax.distributed.initialize`` is invoked lazily for multi-host pods.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Join a multi-host pod via ``jax.distributed.initialize``.

    No-op (returns False) on a single host: it only activates when a
    coordinator address is passed or present as ``JAX_COORDINATOR_ADDRESS``
    (on Cloud TPU pods, ``jax.distributed.initialize()``'s own metadata
    auto-detection fills the rest). Idempotent; ``make_mesh`` calls it
    lazily, but multi-host CLIs must call it EAGERLY before the first
    backend touch (any ``jax.devices()``/``jit`` call initializes the
    backend, after which ``jax.distributed.initialize`` raises — ADVICE
    r2). Exercised for real by tests/test_multihost.py (2-process CPU
    pod: coordinator + worker, global mesh, one psum)."""
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    coord = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord is None and num_processes is None:
        return False
    try:
        # coord may legitimately be None on Cloud TPU pods:
        # jax.distributed.initialize auto-detects the coordinator from the
        # TPU metadata service and only num_processes/process_id are given
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except Exception as e:
        if coord is None:
            raise ValueError(
                "init_distributed: num_processes given without a "
                "coordinator address and cluster auto-detection failed "
                "(pass coordinator= or set JAX_COORDINATOR_ADDRESS); "
                f"underlying error: {e}") from e
        raise
    _DIST_INITIALIZED = True
    return True


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              local: bool = False) -> Mesh:
    """``local=True`` builds the mesh over THIS process's devices only —
    the right scope for inference surfaces on a multi-host pod, where
    directory/serving workloads are embarrassingly parallel across hosts
    (each process owns a file shard, see ``process_shard``) and a global
    mesh would make every image a cross-host collective. Training keeps
    the default global mesh (gradients all-reduce over DCN). Identical on
    single-process hosts."""
    init_distributed()
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def process_shard(items):
    """Split a work list across pod processes (strided by process index,
    so mixed-size directories balance). Identity on single-process hosts.
    The multi-host analog of the reference's dir loop
    (/root/reference/src/denoise.py:491-500) — images are independent, so
    each host simply owns every ``process_count``-th file."""
    items = list(items)
    if jax.process_count() <= 1:
        return items
    return items[jax.process_index()::jax.process_count()]


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch/tile) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays with the batch axis sharded over the mesh."""
    sh = data_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh)
                                  if hasattr(x, "shape") else x, tree)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad the batch axis so it divides the mesh; returns (padded, n_real)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad), n
