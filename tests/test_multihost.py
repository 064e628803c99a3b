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
TRAIN_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_multihost_train_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pod(child: str, num_procs: int = 2, timeout: int = 300,
             extra_args=()):
    """Launch a <num_procs>-process localhost pod of `child`; return outputs."""
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # children provision their own 2-device CPU backend; scrub the parent's
    # 8-device flag so local device counts are deterministic
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [subprocess.Popen(
        [sys.executable, child, addr, str(num_procs), str(pid),
         *map(str, extra_args)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(num_procs)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    return outs


@pytest.mark.slow
def test_init_distributed_two_process_pod():
    outs = _run_pod(CHILD)
    for pid, out in enumerate(outs):
        assert f"MULTIHOST_OK proc={pid}" in out, out


@pytest.mark.slow
def test_dp_train_step_two_process_pod():
    """The PRODUCT training path across processes: UtNet fast-forward DP
    train step on a 4-device global mesh (2 procs x 2 devices), gradients
    all-reduced cross-process, result bit-compared (2e-5) inside each child
    against the unsharded single-device run and across children here."""
    outs = _run_pod(TRAIN_CHILD, timeout=600)
    lines = []
    for pid, out in enumerate(outs):
        marks = [ln for ln in out.splitlines()
                 if ln.startswith(f"MULTIHOST_TRAIN_OK proc={pid}")]
        assert marks, out
        lines.append(marks[0].split(f"proc={pid} ", 1)[1])
    # loss + checksum identical across processes (replicated params agree)
    assert lines[0] == lines[1], lines


CLI_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_multihost_cli_child.py")


@pytest.mark.slow
def test_dir_batch_two_process_pod(tmp_path):
    """The pipeline CLI over a shared directory on a 2-process pod: each
    process takes its strided half of the files (mesh.process_shard) and
    denoises on its LOCAL devices; together they produce every output."""
    import cv2
    import numpy as np

    pytest.importorskip("jax")
    # fixture: 4 tiny 16-bit TIFFs + a small UtNet checkpoint, written
    # without touching this process's jax backend
    import jax as _jax

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    outdir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        img = rng.integers(0, 65536, (72, 88, 3), dtype=np.uint16)
        cv2.imwrite(str(indir / f"img{i}.tif"), img[..., ::-1])
    ckpt = str(tmp_path / "generator_1.npz")
    params_io.save(UtNet.init(_jax.random.PRNGKey(0), funit=8), ckpt)

    outs = _run_pod(CLI_CHILD, timeout=600,
                    extra_args=[str(indir), str(outdir), ckpt])
    for pid, out in enumerate(outs):
        assert f"MULTIHOST_CLI_OK proc={pid}" in out, out
        assert f"process {pid}/2 takes 2/4 files" in out, out
    produced = sorted(p.name for p in outdir.iterdir() if p.suffix == ".jpg")
    assert produced == [f"img{i}.jpg" for i in range(4)], produced


EVAL_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_eval_child.py")


@pytest.mark.slow
def test_eval_two_process_pod(tmp_path):
    """The eval harness on a 2-process pod: images shard across processes,
    the per-set metrics merge via process_allgather (both ranks must report
    the SAME overall numbers), the chief alone writes testres.json, and
    together the ranks denoise every non-baseline image."""
    import json

    import cv2
    import numpy as np

    pytest.importorskip("jax")
    import jax as _jax

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet

    noisy = tmp_path / "sets"
    results = tmp_path / "results"
    ckpt_dir = tmp_path / "run"
    ckpt_dir.mkdir()
    rng = np.random.default_rng(11)
    n_noisy = 0
    for scene in ("sceneA", "sceneB"):
        d = noisy / scene
        d.mkdir(parents=True)
        for iso in (100, 400, 800, 1600):  # ISO100 = baseline (excluded)
            # >= 162 px: real scoring runs in the child (MS-SSIM min size)
            img = rng.integers(0, 65536, (176, 200, 3), dtype=np.uint16)
            cv2.imwrite(str(d / f"NIND_{scene}_ISO{iso}.png"), img[..., ::-1])
            n_noisy += iso != 100
    ckpt = str(ckpt_dir / "generator_3.npz")
    params_io.save(UtNet.init(_jax.random.PRNGKey(0), funit=8), ckpt)

    outs = _run_pod(EVAL_CHILD, timeout=600,
                    extra_args=[str(noisy), str(results), ckpt])
    lines = []
    for pid, out in enumerate(outs):
        marks = [ln for ln in out.splitlines()
                 if ln.startswith(f"MULTIHOST_EVAL_OK proc={pid}")]
        assert marks, out
        lines.append(marks[0].split(" ", 2)[2])
        assert "takes every 2th image" in out, out
    assert lines[0] == lines[1], lines  # merged metrics agree across ranks
    # chief wrote testres.json next to the checkpoint; every image denoised
    tr = json.loads((ckpt_dir / "testres.json").read_text())
    assert tr, tr
    save_dir = results / ckpt_dir.name
    produced = [p for p in save_dir.iterdir() if p.suffix in (".png", ".tif")]
    assert len(produced) == n_noisy, sorted(p.name for p in produced)


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
