"""Test configuration: run everything on CPU with a virtual 8-device mesh.

Multi-chip sharding tests use the 8 virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per SURVEY.md §4's
test-pyramid plan. Must set env before the first jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin latches JAX_PLATFORMS before user code runs; the config
# update below is the override that actually sticks.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


def _ensure_native_built() -> None:
    """Build native/build/libtileio.so once per checkout when a C++
    toolchain exists, so tests/test_native.py actually runs in CI
    conditions instead of permanently skipping (VERDICT r3). The skip
    remains only where no compiler is present. Runs at conftest import —
    before test_native.py's collection-time ``native.available()`` check."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "build", "libtileio.so")
    if os.path.isfile(so):
        return
    if not (shutil.which("g++") or shutil.which("c++")):
        return
    try:
        subprocess.run(["sh", os.path.join(root, "native", "build.sh")],
                       capture_output=True, timeout=300, check=True)
    except (subprocess.SubprocessError, OSError) as e:
        print(f"conftest: native build failed ({e}); native tests will skip",
              file=sys.stderr)


_ensure_native_built()


@pytest.fixture(scope="session")
def fixture_images(tmp_path_factory):
    """Small deterministic 8-bit and 16-bit test images on disk."""
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img8 = rng.integers(0, 256, (104, 104, 3), dtype=np.uint8)
    img16 = rng.integers(0, 65536, (104, 104, 3), dtype=np.uint16)
    p8 = str(d / "NIND_test_ISO200_10_6_104.png")
    p16 = str(d / "NIND_test_ISO50_20_30_104.png")
    cv2.imwrite(p8, img8[..., ::-1])
    cv2.imwrite(p16, img16[..., ::-1])
    return {"img8": p8, "img16": p16, "dir": str(d)}
