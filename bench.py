"""Benchmark: 24 MP tiled denoise throughput on one TPU chip (BASELINE #2).

Prints ONE JSON line:
  {"metric": "denoise_throughput_24mp", "value": <MP/s>, "unit": "MP/s",
   "vs_baseline": <TPU MP/s divided by torch-CPU MP/s>}

The reference publishes no quantitative throughput (SURVEY.md §6); the
recorded baseline here is the same UtNet(funit=64) forward in torch-CPU on
this host, measured once and cached in ``bench_baseline.json``. The north
star (BASELINE.md) asks for >= 10x CPU.

Usage: python bench.py [--quick] [--batch N] [--dtype bfloat16|float32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


def measure_cpu_baseline(funit: int = 64, cs: int = 504, reps: int = 1) -> float:
    """torch-CPU UtNet MP/s on one tile (cached)."""
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cpu_mps"]
    import numpy as np
    import torch
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_models_parity import build_torch_utnet

    torch.manual_seed(0)
    model = build_torch_utnet(funit=funit).eval()
    x = torch.from_numpy(np.random.default_rng(0).random((1, 3, cs, cs)).astype("float32"))
    with torch.no_grad():
        model.forward(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            model.forward(x)
        dt = (time.perf_counter() - t0) / reps
    mps = (cs * cs / 1e6) / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"cpu_mps": mps, "funit": funit, "cs": cs,
                   "threads": torch.get_num_threads()}, f)
    return mps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="6 MP instead of 24 MP")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--funit", type=int, default=64)
    args = ap.parse_args()

    cpu_mps = measure_cpu_baseline(funit=args.funit)

    import numpy as np
    import jax

    from nind_denoise_tpu.models.utnet import UtNet
    from nind_denoise_tpu.engine.tile_engine import make_engine

    h, w = (2000, 3000) if args.quick else (4000, 6000)  # 6 / 24 MP
    rng = np.random.default_rng(0)
    # product path: 16-bit image in, 16-bit image out (denoise_dir writes .tif)
    img = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)

    params = UtNet.init(jax.random.PRNGKey(0), funit=args.funit)
    eng = make_engine("UtNet", params, batch_size=args.batch,
                      compute_dtype=args.dtype)

    eng.denoise_raw(img, 65535.0, out_dtype="uint16")  # compile + warm
    t0 = time.perf_counter()
    out = eng.denoise_raw(img, 65535.0, out_dtype="uint16")
    dt = time.perf_counter() - t0
    assert out.dtype == np.uint16 and out.shape == (h, w, 3)

    mps = (h * w / 1e6) / dt
    print(json.dumps({
        "metric": "denoise_throughput_24mp" if not args.quick else "denoise_throughput_6mp",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / cpu_mps, 2),
    }))


if __name__ == "__main__":
    main()
