"""Child for tests/test_multihost.py::test_eval_two_process_pod.

One worker of a 2-process CPU pod running the eval harness
(eval/denoise_dir.main) over a shared noisy_dir: each process denoises its
strided image shard on local devices, the per-set metrics merge across
processes via process_allgather, and only the chief writes testres.json.

Usage: _multihost_eval_child.py <coord> <num_procs> <proc_id> <noisy_dir> <result_dir> <ckpt>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["NIND_JAX_CACHE"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
noisy_dir, result_dir, ckpt = sys.argv[4], sys.argv[5], sys.argv[6]

from nind_denoise_tpu.parallel import mesh as pmesh

assert pmesh.init_distributed(coordinator=coordinator,
                              num_processes=num_procs,
                              process_id=proc_id)

from nind_denoise_tpu.eval import denoise_dir

# scoring ON: the cross-process metric merge is exactly what this child
# exercises (--no_scoring now genuinely skips scoring, round-3 fix)
overall = denoise_dir.main(["--noisy_dir", noisy_dir, "--model_path", ckpt,
                            "--network", "UtNet", "--result_dir", result_dir,
                            "--batch_size", "2"])
print(f"MULTIHOST_EVAL_OK proc={proc_id} "
      f"mse={overall['mse']:.8f} msssim={overall['msssim']:.8f}", flush=True)
