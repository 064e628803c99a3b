"""Child process for tests/test_multihost.py::test_dp_train_step_two_process_pod.

One worker of a 2-process CPU 'pod' (2 local devices each -> 4-device global
mesh). Runs the PRODUCT training path — ``steps.make_generator_train_step``
on UtNet's fast forward with the batch sharded over the global mesh and
params replicated, exactly as train/loop.py wires it — for two steps, then
recomputes the same two steps unsharded on one device and asserts the
DP-trained params match. This is the multi-host evidence the psum smoke
test (_multihost_child.py) does not provide: gradients all-reduce across
PROCESSES (Gloo here, DCN on a real pod) through the same code the trainer
ships.

Usage: python _multihost_train_child.py <coordinator_addr> <num_procs> <proc_id>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from nind_denoise_tpu.parallel import mesh as pmesh

assert pmesh.init_distributed(coordinator=coordinator,
                              num_processes=num_procs,
                              process_id=proc_id)

from functools import partial

import numpy as np
import jax.numpy as jnp

from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.train import steps

NDEV = len(jax.devices())
assert jax.process_count() == num_procs

# deterministic across processes: same seed -> same params, same batch
# (train/loop.py relies on the same property: every process builds the
# global batch, device_put scatters it across the pod)
apply_fn = partial(UtNet.apply_fast, activation="PReLU")
params0 = UtNet.init(jax.random.PRNGKey(0), funit=8)
optimizer = steps.make_optimizer(1e-3, 0.5, amsgrad=True)
train_step = steps.make_generator_train_step(
    apply_fn, optimizer, {"MSE": 1.0}, loss_cs=96, donate=False)

rng = np.random.default_rng(42)
batches = [(rng.random((NDEV, 104, 104, 3), dtype=np.float32),
            rng.random((NDEV, 104, 104, 3), dtype=np.float32))
           for _ in range(2)]

# ---- DP over the global (cross-process) mesh ----
mesh = pmesh.make_mesh()
state = steps.TrainState(pmesh.replicate_tree(mesh, params0),
                         pmesh.replicate_tree(mesh, optimizer.init(params0)))
for clean_np, noisy_np in batches:
    clean, noisy = pmesh.shard_batch(mesh, clean_np, noisy_np)
    state, metrics = train_step(state, clean, noisy)
dp_params = jax.tree_util.tree_map(np.asarray, state.params)
dp_loss = float(metrics["weighted"])

# ---- single-device reference: same steps, unsharded ----
ref = steps.TrainState(params0, optimizer.init(params0))
for clean_np, noisy_np in batches:
    ref, ref_metrics = train_step(ref, jnp.asarray(clean_np),
                                  jnp.asarray(noisy_np))
ref_params = jax.tree_util.tree_map(np.asarray, ref.params)

leaves_dp = jax.tree_util.tree_leaves(dp_params)
leaves_ref = jax.tree_util.tree_leaves(ref_params)
assert len(leaves_dp) == len(leaves_ref) and leaves_dp
# DP vs serial differ only by gradient-reduction order; Adam's
# grad/sqrt(v) normalization amplifies that fp32 noise on early steps
# (measured max ~2.4e-6 abs / ~1.3e-4 rel after 2 steps)
for a, b in zip(leaves_dp, leaves_ref):
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)
assert abs(dp_loss - float(ref_metrics["weighted"])) < 1e-5

# cross-process agreement: every process must hold identical params
checksum = float(sum(np.float64(np.abs(l).sum()) for l in leaves_dp))
print(f"MULTIHOST_TRAIN_OK proc={proc_id} ndev={NDEV} "
      f"loss={dp_loss:.8f} checksum={checksum:.8f}", flush=True)
