"""Child for tests/test_multihost.py::test_dir_batch_two_process_pod.

One worker of a 2-process CPU pod running the PRODUCT pipeline CLI over a
shared directory: parallel.mesh.process_shard must give each process its
strided half of the files, and the per-image engines must build over the
process's LOCAL devices only (a global mesh would turn every independent
image into a cross-host collective — see mesh.make_mesh(local=True)).

Usage: _multihost_cli_child.py <coord> <num_procs> <proc_id> <indir> <outdir> <ckpt>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["NIND_JAX_CACHE"] = "0"  # tiny CPU programs; skip cache writes

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
indir, outdir, ckpt = sys.argv[4], sys.argv[5], sys.argv[6]

from nind_denoise_tpu.parallel import mesh as pmesh

assert pmesh.init_distributed(coordinator=coordinator,
                              num_processes=num_procs,
                              process_id=proc_id)
assert jax.process_count() == num_procs

from nind_denoise_tpu.pipeline import denoise_cli

denoise_cli.main([indir, "--tiff-input", "-o", outdir, "-e", "jpg",
                  "--model_path", ckpt, "--no_deblur", "--batch_size", "2"])
print(f"MULTIHOST_CLI_OK proc={proc_id}", flush=True)
