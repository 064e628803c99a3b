"""Child process for tests/test_multihost.py: one worker of a 2-process CPU
'pod'. Joins via parallel.mesh.init_distributed, builds a GLOBAL mesh over
all processes' devices, and runs one cross-process reduction (the psum rides
the distributed runtime exactly as it would ride DCN on a real pod).

Usage: python _multihost_child.py <coordinator_addr> <num_procs> <proc_id>
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

# must run BEFORE the first backend touch (mesh.py docstring / ADVICE r2)
assert pmesh.init_distributed(coordinator=coordinator,
                              num_processes=num_procs,
                              process_id=proc_id)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == num_procs, jax.process_count()
devs = jax.devices()
assert len(devs) == 2 * num_procs, devs  # 2 local CPU devices per process

mesh = Mesh(np.array(devs), ("data",))
sharding = NamedSharding(mesh, P("data"))
# each process contributes its own rows; the jitted sum needs a
# cross-process all-reduce to produce the replicated scalar
local = np.full((2, 8), float(proc_id + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local)
out = jax.jit(lambda a: jnp.sum(a * 2))(garr)
val = float(out)
expected = 2.0 * 8 * 2 * sum(range(1, num_procs + 1))
assert val == expected, (val, expected)
print(f"MULTIHOST_OK proc={proc_id} val={val}", flush=True)
