"""denoise — end-to-end RAW -> developed TIFF -> denoise -> RL-deblur -> JPEG.

CLI surface parity with the reference's docopt pipeline
(/root/reference/src/denoise.py:8-35): same options and defaults
(-o/--output-path, -e/--extension [jpg], --dt, -g/--gmic, -q/--quality [90],
--nightmode, --no_deblur, --debug, --tiff-input, --sigma [1],
--iterations [10], --height, --copy_num, -v/--verbose), file-or-directory
input over the same RAW extension list, the same stage file naming
(<stem>_s1.tif 32-bit dev / _s1_denoised.tiff fp32 / _s2.tif 16-bit;
tif=16-bit vs tiff=32-bit convention, denoise.py:417-418) and collision
counter (_1.._99).

TPU-native differences:
* the denoiser runs IN-PROCESS on the TileEngine instead of a python
  subprocess (denoise.py:430-436) — no process boundary, no re-import cost;
* RL-deblur runs on-device (ops/rl_deblur.py) by default; ``--use-gmic``
  restores the byte-compatible gmic subprocess when the binary exists;
* if darktable-cli is absent and the input is already a TIFF, stage 2 is
  skipped with a warning instead of crashing (CI-friendly, SURVEY.md §4c).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
from typing import Optional

import numpy as np

from ..core import imgio
from ..models import params_io
from . import exif as exif_mod
from . import external, xmp

VALID_EXTENSIONS = [
    "." + e.lower() for e in
    ["3FR", "ARW", "SR2", "SRF", "CR2", "CR3", "CRW", "DNG", "ERF", "FFF",
     "MRW", "NEF", "NRW", "ORF", "PEF", "RAF", "RW2"]
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="denoise", description="Denoise the RAW image <raw_image> and save the result.")
    p.add_argument("raw_image", help="RAW file (or directory of RAWs)")
    p.add_argument("-o", "--output-path", dest="output_path",
                   help="Where to save the result (defaults to input directory)")
    p.add_argument("-e", "--extension", default="jpg", help="Output extension")
    p.add_argument("-d", "--dt", help="Path to darktable-cli")
    p.add_argument("-g", "--gmic", help="Path to gmic")
    p.add_argument("-q", "--quality", default="90", help="JPEG quality")
    p.add_argument("--nightmode", action="store_true",
                   help="Normalize brightness (exposure, toneequal) before denoise")
    p.add_argument("--no_deblur", action="store_true", help="Skip RL-deblur")
    p.add_argument("--debug", action="store_true", help="Keep intermediate files")
    p.add_argument("--tiff-input", dest="tiff_input", action="store_true",
                   help="Input is already a stage-1 TIFF")
    p.add_argument("--sigma", default="1", help="RL-deblur sigma")
    p.add_argument("--iterations", default="10", help="RL-deblur iterations")
    p.add_argument("--rl-impl", default="auto",
                   choices=["auto", "xla", "pallas"], dest="rl_impl",
                   help="on-device RL kernel: auto (default: fused pallas "
                        "VMEM kernel on TPU, 2.26x the xla path; xla "
                        "elsewhere), or force xla/pallas")
    p.add_argument("--rl-psf", default="gaussian",
                   choices=["gaussian", "gmic_fast"], dest="rl_psf",
                   help="RL blur PSF: exact truncated-FIR gaussian (product "
                        "default, the PSF gmic documents) or gmic_fast "
                        "(CImg Deriche-IIR approximation — what the "
                        "reference's use_fast_approximation=1 actually runs)")
    p.add_argument("--height", help="Max output height")
    p.add_argument("--copy_num", help="darktable duplicate number (XMP naming)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--version", action="version", version="nind_denoise_tpu")
    p.add_argument("--use-gmic", dest="use_gmic", action="store_true",
                   help="Use the gmic binary for RL-deblur instead of on-device")
    p.add_argument("--model", default="nind_generator_650.pt",
                   help="Model registry key (pipeline/operations.yaml)")
    p.add_argument("--model_path", help="Override generator checkpoint path")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "int8", "int8_static"],
                   help="engine compute dtype (int8/int8_static: UtNet-only "
                        "quantized MXU forward, PERF.md 'int8 engine mode'; "
                        "the serial per-file path calibrates int8_static on "
                        "the actual image, directory batches use the "
                        "data-independent synthetic set)")
    p.add_argument("--cs", type=int, help="Override tile size")
    p.add_argument("--ucs", type=int, help="Override useful tile size")
    p.add_argument("--devices", type=int,
                   help="Directory mode: dispatch images one-per-device over "
                        "this many devices (parallel/batch_engine). Default: "
                        "all visible devices when >1; 1 forces serial")
    return p


def check_good_input(path: pathlib.Path, extensions) -> bool:
    extensions = [extensions] if isinstance(extensions, str) else list(extensions)
    if not path.is_file():
        print(f"This isn't a file: {path} — skipping.")
        return False
    if path.suffix.lower() not in extensions:
        if path.suffix.lower() != ".xmp":
            print(f"Not a (supported) RAW file: {path}, skipping.")
        return False
    return True


def get_stage_filepaths(outpath: pathlib.Path, stage: int):
    """tif = 16-bit, tiff = 32-bit (intentional, denoise.py:259-276)."""
    if stage == 1:
        return (outpath.parent / (outpath.stem + "_s1.tif"),
                outpath.parent / (outpath.stem + "_s1_denoised.tiff"))
    return outpath.parent / (outpath.stem + "_s2.tif")


def resolve_model(args, config) -> dict:
    mcfg = dict(config["models"][args.model])
    if args.model_path:
        mcfg["path"] = args.model_path
    if not os.path.isabs(mcfg["path"]):
        mcfg["path"] = os.path.join(os.getcwd(), mcfg["path"])
    if not os.path.exists(mcfg["path"]) and "url" in mcfg:
        print(f"Model checkpoint missing; downloading from {mcfg['url']} ...")
        external.download_model(mcfg["url"], mcfg["path"])
    return mcfg


def _run_denoiser(mcfg: dict, in_fpath: pathlib.Path, out_fpath: pathlib.Path,
                  batch_size: int, cs=None, ucs=None,
                  compute_dtype: str = "bfloat16") -> None:
    """In-process equivalent of the denoise_image.py subprocess."""
    from . import denoise_image_cli

    argv = ["-i", str(in_fpath), "-o", str(out_fpath),
            "--network", mcfg.get("network", "UtNet"),
            "--model_path", mcfg["path"],
            "--compute_dtype", compute_dtype,
            "--batch_size", str(batch_size)]
    if cs:
        argv += ["--cs", str(cs)]
    if ucs:
        argv += ["--ucs", str(ucs)]
    ns = denoise_image_cli.build_parser().parse_known_args_layered(argv)[0]
    if mcfg.get("activation"):
        ns.model_parameters = f"activation={mcfg['activation']}"
    denoise_image_cli.run(ns)


_ENGINE_CACHE: dict = {}


def _get_engine(mcfg: dict, args, cs=None, ucs=None):
    """Engine memoized per (model, tiling, batch): compiled programs are tied
    to the TileEngine instance, so directory runs reuse one engine."""
    from ..engine.tile_engine import make_engine
    from ..models import params_io

    cs = cs if cs is not None else args.cs
    ucs = ucs if ucs is not None else args.ucs
    key = (mcfg["path"], mcfg.get("network", "UtNet"), cs, ucs,
           args.batch_size, args.compute_dtype)
    if key not in _ENGINE_CACHE:
        params, state = params_io.load_generator(
            mcfg["path"], mcfg.get("network", "UtNet"))
        if mcfg.get("network", "UtNet") == "UNet":
            params = (params, state)
        # int8_static here calibrates on the synthetic extremal set (the
        # engine is memoized across a whole directory, so one image's
        # content must not bake into everyone's scales)
        _ENGINE_CACHE[key] = make_engine(
            mcfg.get("network", "UtNet"), params, cs=cs, ucs=ucs,
            activation=mcfg.get("activation", "PReLU"),
            compute_dtype=args.compute_dtype,
            batch_size=args.batch_size)
    return _ENGINE_CACHE[key]


_DECODE_AHEAD: dict = {}
_DECODE_POOL = None


def _prefetch_decode(fpath: pathlib.Path) -> None:
    """Directory mode: decode the NEXT image on a thread while the current
    one streams through the chip (cv2.imread releases the GIL). The pool is
    scoped to the directory loop (``_shutdown_decode_pool``) so a mid-batch
    failure cannot leak decoded images or delay interpreter exit."""
    global _DECODE_POOL
    import concurrent.futures as cf

    if _DECODE_POOL is None:
        _DECODE_POOL = cf.ThreadPoolExecutor(max_workers=1)
    key = str(fpath)
    if key not in _DECODE_AHEAD:
        _DECODE_AHEAD[key] = _DECODE_POOL.submit(imgio.load_img_raw, key)


def _shutdown_decode_pool() -> None:
    global _DECODE_POOL
    _DECODE_AHEAD.clear()
    if _DECODE_POOL is not None:
        _DECODE_POOL.shutdown(wait=False, cancel_futures=True)
        _DECODE_POOL = None


def _denoise_to_array(mcfg: dict, in_fpath: pathlib.Path, args):
    """In-memory denoise: file -> DEVICE-resident float32 HWC array (fast
    path; the result feeds on-device RL without ever crossing the wire).
    Storage-dtype pixels go straight to the streaming engine — the [0,1]
    normalization is fused into the tile program on device, skipping
    ~1 s/6 MP of host fp32 divide + transpose."""
    fut = _DECODE_AHEAD.pop(str(in_fpath), None)
    raw, scale = fut.result() if fut is not None \
        else imgio.load_img_raw(str(in_fpath))
    # small-image tile adaptation (core/tiles.adapt_cs_ucs): the default
    # 504/480 tiling cannot mirror-pad images below ~246 px
    from ..core.tiles import TilingError, adapt_cs_ucs, default_cs_ucs
    from ..models import get_network

    network = mcfg.get("network", "UtNet")
    cs, ucs = args.cs, args.ucs
    if cs is None or ucs is None:
        cs, ucs = default_cs_ucs(network)
    try:
        cs, ucs = adapt_cs_ucs(raw.shape[0], raw.shape[1], cs, ucs,
                               check=getattr(get_network(network),
                                             "check_cs", None))
    except TilingError:
        # below the minimum tiling (the reference aborts): pad-to-valid
        # single forward (TileEngine.denoise_tiny), still device-resident
        engine = _get_engine(mcfg, args, cs=None, ucs=None)
        if args.compute_dtype == "int8_static":
            engine.recalibrate_int8(raw, scale)
        return engine.denoise_tiny(raw, scale, out_dtype="device")
    engine = _get_engine(mcfg, args, cs=cs, ucs=ucs)
    if args.compute_dtype == "int8_static":
        # content-match the memoized engine's static scales to THIS image
        # (scales are traced leaves — no recompile; engine docstring)
        engine.recalibrate_int8(raw, scale)
    return engine.denoise_raw(raw, scale, out_dtype="device")


def _encode_u8(u8_hwc: np.ndarray, out_fpath: pathlib.Path, quality: str) -> None:
    import cv2

    bgr = cv2.cvtColor(np.asarray(u8_hwc), cv2.COLOR_RGB2BGR)
    if out_fpath.suffix.lower() in (".jpg", ".jpeg"):
        cv2.imwrite(str(out_fpath), bgr, [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
    else:
        cv2.imwrite(str(out_fpath), bgr)


def _write_encoded(img01_hwc, out_fpath: pathlib.Path, quality: str) -> None:
    """Device or host float01 image -> 8-bit encode (quantize on device)."""
    import jax.numpy as jnp

    from ..engine import transfer

    u8 = jnp.round(jnp.clip(jnp.asarray(img01_hwc), 0, 1) * 255).astype(jnp.uint8)
    _encode_u8(transfer.fast_get(u8), out_fpath, quality)


def _rl_array_to_file(img01_hwc, out_fpath: pathlib.Path,
                      sigma: int, iterations: int, quality: str,
                      verbose: bool = False, impl: str = "auto",
                      psf: str = "gaussian") -> None:
    """On-device RL on a device-resident image, gmic post-op semantics
    (*65535/256, cut 0-255, round), uint8 quantize on device, single fetch."""
    from ..engine import transfer
    from ..ops import rl_deblur

    u8 = rl_deblur.rl_to_u8_device(img01_hwc, sigma, iterations, impl=impl,
                                   psf=psf)
    _encode_u8(transfer.fast_get(u8), out_fpath, quality)
    if verbose:
        print(f"Applied on-device RL-deblur to: {out_fpath}")


def _rl_deblur_ondevice(in_fpath: pathlib.Path, out_fpath: pathlib.Path,
                        sigma: int, iterations: int, quality: str,
                        verbose: bool = False, impl: str = "auto",
                        psf: str = "gaussian") -> None:
    import cv2

    from ..ops import rl_deblur

    img = imgio.load_img(str(in_fpath)).transpose(1, 2, 0)  # [0,1] HWC
    u8 = rl_deblur.rl_deblur_to_uint8(img, float(sigma), int(iterations),
                                      impl=impl, psf=psf)
    bgr = cv2.cvtColor(u8, cv2.COLOR_RGB2BGR)
    if out_fpath.suffix.lower() in (".jpg", ".jpeg"):
        cv2.imwrite(str(out_fpath), bgr, [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
    else:
        cv2.imwrite(str(out_fpath), bgr)
    if verbose:
        print(f"Applied on-device RL-deblur to: {out_fpath}")


def _initial_outpath(args, input_path: pathlib.Path) -> pathlib.Path:
    output_dir = pathlib.Path(args.output_path) if args.output_path else input_path.parent
    ext = "." + args.extension if args.extension[0] != "." else args.extension
    return output_dir if output_dir.suffix != "" \
        else (output_dir / input_path.name).with_suffix(ext)


def _collision_resolve(outpath: pathlib.Path,
                       taken=frozenset()) -> pathlib.Path:
    """_1.._99 collision counter (denoise.py:383-389) — including the
    reference's stem-compounding on repeated collisions (img -> img_1 ->
    img_1_2: the reference also appends to the already-suffixed stem).
    ``taken``: extra
    paths to treat as existing — reservations made before their files are
    written (the straggler pool resolves all outpaths up front on the
    caller thread so concurrent writers cannot race the counter)."""
    i = 1
    while outpath.exists() or outpath in taken:
        outpath = outpath.with_stem(outpath.stem + "_" + str(i))
        i += 1
        if i >= 99:
            raise FileExistsError(f"too many files with the same name near {outpath}")
    return outpath


def denoise_file(args, input_path: pathlib.Path) -> Optional[pathlib.Path]:
    print(input_path)
    from ..utils.log import StageTimers

    # per-stage wall times (develop / denoise / stage2 / rl+encode / exif),
    # printed under --verbose — the observability the reference's single
    # elapsed-seconds print (denoise_image.py:282) does not give
    timers = StageTimers()
    outpath = _initial_outpath(args, input_path)

    # darktable duplicate naming (--copy_num, denoise.py:342-350)
    if args.copy_num:
        n = int(args.copy_num)
        copy_number = f"_0{args.copy_num}" if 0 < n < 10 else \
            (f"_{args.copy_num}" if 9 < n < 100 else "")
        input_xmp = input_path.with_stem(input_path.stem + copy_number) \
            .with_suffix(input_path.suffix + ".xmp")
    else:
        input_xmp = input_path.with_suffix(input_path.suffix + ".xmp")
    if args.verbose:
        print(input_xmp)

    sigma = int(args.sigma or 1)
    quality = args.quality or "90"
    iterations = args.iterations or "10"

    config = xmp.read_config(nightmode=args.nightmode, verbose=args.verbose)
    cmd_darktable = external.find_darktable(args.dt)
    cmd_gmic = external.find_gmic(args.gmic) if args.use_gmic else None

    rldeblur = not args.no_deblur

    if cmd_darktable is None and not args.tiff_input:
        print("Error: darktable-cli not found and input is RAW.")
        raise FileNotFoundError("darktable-cli")

    good_file = ((args.tiff_input and check_good_input(input_path, [".tif", ".tiff"]))
                 or check_good_input(input_path, VALID_EXTENSIONS)
                 or check_good_input(input_xmp, ".xmp"))
    if not good_file:
        print("The input raw-image or its XMP were not found, or are not valid.")
        raise FileNotFoundError(input_path)

    outpath = _collision_resolve(outpath)

    # stage paths derive from the collision-resolved output name (the
    # reference computed them before the collision loop, which in
    # --no_deblur mode could delete its own output; fixed here)
    s1_fpath, s1_denoised_fpath = get_stage_filepaths(outpath, 1)
    s2_fpath = get_stage_filepaths(outpath, 2)
    if not rldeblur:
        s2_fpath = outpath  # no deblur stage -> stage 2 writes the final file

    have_xmp = input_xmp.is_file()
    if not args.tiff_input:
        if not have_xmp:
            # hardening over the reference, which crashes the whole run here
            # (denoise.py:392 parses the sidecar unconditionally once the
            # RAW alone passed the good_file check): skip just this file
            print(f"No XMP sidecar for {input_path} ({input_xmp.name} not "
                  f"found); skipping (darktable development needs the "
                  f"history stack).")
            return None
        xmp.split_history(input_xmp, config=config, verbose=args.verbose)
        s1_fpath.unlink(missing_ok=True)
        with timers.stage("develop"):
            external.run_darktable_stage1(cmd_darktable, input_path,
                                          input_xmp.with_suffix(".s1.xmp"),
                                          s1_fpath)
    else:
        s1_fpath = input_path
        if have_xmp:
            xmp.split_history(input_xmp, config=config, verbose=args.verbose)
        else:
            print("Warning: no XMP sidecar; stage-2 darktable ops unavailable.")

    mcfg = resolve_model(args, config)

    # ---- fast path: no darktable stage 2 and on-device RL -> everything
    # stays in memory (no intermediate encode/decode round-trips; the
    # reference pays them only because its stages are separate processes)
    stage2_runs = cmd_darktable is not None and have_xmp
    if not stage2_runs and not (args.use_gmic and cmd_gmic) and not args.debug:
        with timers.stage("denoise"):
            denoised01 = _denoise_to_array(mcfg, s1_fpath, args)
            if args.verbose:
                # attribute the async device tail to THIS stage:
                # block_until_ready is a no-op on axon (CLAUDE.md), so
                # force one scalar readback (~25 ms RPC). Only under
                # --verbose — the timers only print there, and the sync
                # would otherwise cost the denoise/RL dispatch overlap.
                float(denoised01[0, 0, 0])
        with timers.stage("rl+encode"):
            if rldeblur:
                _rl_array_to_file(denoised01, outpath, sigma, iterations,
                                  quality, verbose=args.verbose,
                                  impl=args.rl_impl, psf=args.rl_psf)
            elif outpath.suffix.lower() == ".tiff":
                imgio.save_img(denoised01.transpose(2, 0, 1), str(outpath))
            else:
                _write_encoded(denoised01, outpath, quality)
        with timers.stage("exif"):
            exif_mod.clone_exif(s1_fpath, outpath, verbose=args.verbose)
        for f in [input_xmp.with_suffix(".s1.xmp"), input_xmp.with_suffix(".s2.xmp")]:
            pathlib.Path(f).unlink(missing_ok=True)
        if args.verbose:
            print(f"stages: {timers.summary()}")
        return outpath

    # ---- denoise (in-process, on-device) ----
    s1_denoised_fpath.unlink(missing_ok=True)
    with timers.stage("denoise"):
        _run_denoiser(mcfg, s1_fpath, s1_denoised_fpath, args.batch_size,
                      cs=args.cs, ucs=args.ucs,
                      compute_dtype=args.compute_dtype)
    if not s1_denoised_fpath.exists():
        raise RuntimeError(f"denoiser did not produce {s1_denoised_fpath}")
    exif_mod.clone_exif(input_path, s1_denoised_fpath, verbose=args.verbose)

    # ---- stage 2 (darktable ops on the denoised image) ----
    if rldeblur and s2_fpath.is_file():
        s2_fpath.unlink()
    if stage2_runs:
        with timers.stage("stage2"):
            external.run_darktable_stage2(cmd_darktable, s1_denoised_fpath,
                                          input_xmp.with_suffix(".s2.xmp"),
                                          s2_fpath, height=args.height or "0")
    else:
        print("Warning: skipping darktable stage 2 (missing binary or XMP); "
              "writing denoised image as stage-2 output.")
        img = imgio.load_img(str(s1_denoised_fpath))
        imgio.save_img(img, str(s2_fpath))

    # ---- RL-deblur ----
    if rldeblur:
        with timers.stage("rl+encode"):
            if args.use_gmic and cmd_gmic is not None:
                restore = None
                if " " in outpath.name:  # gmic can't handle spaces (denoise.py:464-469)
                    restore = outpath.name
                    outpath = outpath.rename(
                        outpath.with_name(outpath.name.replace(" ", "_")))
                external.run_gmic_rl_deblur(cmd_gmic, s2_fpath, outpath.name,
                                            sigma, int(iterations), quality)
                if restore is not None:
                    outpath = outpath.replace(outpath.with_name(restore))
            else:
                _rl_deblur_ondevice(s2_fpath, outpath, sigma, iterations,
                                    quality, verbose=args.verbose,
                                    impl=args.rl_impl, psf=args.rl_psf)

    with timers.stage("exif"):
        exif_mod.clone_exif(s1_fpath, outpath, verbose=args.verbose)

    if not args.debug:
        for f in [s1_fpath, s1_denoised_fpath, s2_fpath,
                  input_xmp.with_suffix(".s1.xmp"), input_xmp.with_suffix(".s2.xmp")]:
            if f not in (input_path, outpath):
                pathlib.Path(f).unlink(missing_ok=True)
    if args.verbose:
        print(f"stages: {timers.summary()}")
    return outpath


def _batchable(args, f: pathlib.Path, cmd_darktable, cmd_gmic) -> bool:
    """Whether ``f`` qualifies for the in-memory multi-device batch path —
    the same conditions as denoise_file's fast path: no darktable stage 2
    (missing binary or no XMP sidecar), on-device RL, no --debug dumps."""
    if not args.tiff_input or args.debug or (args.use_gmic and cmd_gmic):
        return False
    have_xmp = f.with_suffix(f.suffix + ".xmp").is_file()
    return not (cmd_darktable is not None and have_xmp)


def denoise_dir_batch(args, files, ndev: int) -> list:
    """Directory mode over a device mesh: images dispatch one-per-device
    (parallel/batch_engine.DeviceBatchDenoiser — the 'embarrassingly
    parallel across images' scale-out SURVEY.md §2.9 names for the
    --nightmode batch; the reference loops serially, denoise.py:491-500).

    Same-shaped images group into mesh-sized chunks: one SPMD dispatch
    denoises ndev images; RL-deblur then runs BATCHED on the still-sharded
    output (data-parallel, zero resharding), and each image fetches once,
    already quantized. Returns the list of written output paths.
    """
    from ..core.tiles import default_cs_ucs
    from ..engine.tile_engine import resolve_apply_fn
    from ..ops import rl_deblur as ops_rl
    from ..parallel import mesh as pmesh
    from ..parallel.batch_engine import DeviceBatchDenoiser

    config = xmp.read_config(nightmode=args.nightmode, verbose=args.verbose)
    mcfg = resolve_model(args, config)
    network = mcfg.get("network", "UtNet")
    cs, ucs = args.cs, args.ucs
    if cs is None or ucs is None:
        cs, ucs = default_cs_ucs(network)
    params, state = params_io.load_generator(mcfg["path"], network)
    if network == "UNet":
        params = (params, state)
    raw_params = params  # pre-resolve form (the straggler pool re-resolves
    # per device so each replica's derived kernels colocate with its chip)
    activation = mcfg.get("activation", "PReLU")
    # int8_static in batch mode calibrates on the synthetic extremal set:
    # one SPMD program serves many images, so no one image's content may
    # bake into the shared scales (the serial path calibrates per image)
    apply_fn, params = resolve_apply_fn(network, params, activation,
                                        compute_dtype=args.compute_dtype)
    mesh = pmesh.make_mesh(ndev, local=True)

    sigma = int(args.sigma or 1)
    iterations = int(args.iterations or 10)
    quality = args.quality or "90"
    rldeblur = not args.no_deblur

    from ..core.tiles import TilingError as tiles_TilingError
    from ..core.tiles import adapt_cs_ucs
    from ..engine.tile_engine import TileEngine
    from ..models import get_network
    from ..parallel import batch_engine

    check_cs = getattr(get_network(network), "check_cs", None)
    tilings: dict = {}

    def tiling_for(h, w):
        """Per-shape tile adaptation (small images would otherwise abort
        the whole run with a TilePlan error under the 504/480 default)."""
        k = (h, w)
        if k not in tilings:
            tilings[k] = adapt_cs_ucs(h, w, cs, ucs, check=check_cs)
            if tilings[k] != (cs, ucs):
                print(f"{w}x{h} images too small for cs={cs}; "
                      f"using cs={tilings[k][0]}")
        return tilings[k]

    engines: dict = {}

    def get_batcher(cs_a, ucs_a) -> DeviceBatchDenoiser:
        key = ("batch", cs_a, ucs_a)
        if key not in engines:
            engines[key] = DeviceBatchDenoiser(
                apply_fn, params, cs=cs_a, ucs=ucs_a,
                tiles_per_dispatch=max(1, args.batch_size // ndev),
                # tile I/O dtype; the int8 modes live inside apply_fn
                compute_dtype="float32" if args.compute_dtype == "float32"
                else "bfloat16",
                mesh=mesh)
        return engines[key]

    def get_sharded(cs_a, ucs_a):
        key = ("band", cs_a, ucs_a)
        if key not in engines:
            from ..engine.tile_engine import make_sharded_denoiser

            engines[key] = make_sharded_denoiser(
                network, None, ndev, cs=cs_a, ucs=ucs_a,
                batch_size=args.batch_size,
                compute_dtype=args.compute_dtype,
                resolved=(apply_fn, params))
        return engines[key]

    def get_tiny() -> TileEngine:
        """Single-device pad-to-valid engine for shapes below the minimum
        tiling (the reference aborts on these; sharding them is pointless)."""
        if "tiny" not in engines:
            engines["tiny"] = TileEngine(apply_fn, params, cs, ucs,
                                         compute_dtype=args.compute_dtype,
                                         size_check=check_cs)
        return engines["tiny"]

    def write_one(f, outpath, img01_or_u8, is_u8):
        if is_u8:
            _encode_u8(img01_or_u8, outpath, quality)
        elif outpath.suffix.lower() == ".tiff":
            imgio.save_img(np.asarray(img01_or_u8).transpose(2, 0, 1),
                           str(outpath))
        else:
            _write_encoded(img01_or_u8, outpath, quality)
        exif_mod.clone_exif(f, outpath, verbose=args.verbose)

    written = []

    def process_chunk(chunk, scale):
        h, w = chunk[0][1].shape[:2]
        try:
            cs_a, ucs_a = tiling_for(h, w)
        except tiles_TilingError:
            tiny = get_tiny()
            for f, raw in chunk:
                print(f"\n----------------- {f.name} "
                      f"(tiny, padded forward) -----------------\n")
                outpath = _collision_resolve(_initial_outpath(args, f))
                out01 = tiny.denoise_tiny(raw, scale, out_dtype="device")
                if rldeblur:
                    _rl_array_to_file(out01, outpath, sigma,
                                      int(iterations), quality,
                                      verbose=args.verbose,
                                      impl=args.rl_impl, psf=args.rl_psf)
                    exif_mod.clone_exif(f, outpath, verbose=args.verbose)
                else:
                    write_one(f, outpath, out01, is_u8=False)
                written.append(outpath)
            return
        if len(chunk) * 2 <= ndev:
            # few images, many devices: row-band tile sharding uses the
            # WHOLE mesh per image instead of idling ndev-B devices
            sharded = get_sharded(cs_a, ucs_a)
            for f, raw in chunk:
                print(f"\n----------------- {f.name} "
                      f"(row-band x{ndev}) -----------------\n")
                outpath = _collision_resolve(_initial_outpath(args, f))
                out01 = sharded.denoise_hwc(raw.astype(np.float32) / scale)
                if rldeblur:
                    _rl_array_to_file(out01, outpath, sigma,
                                      int(iterations), quality,
                                      verbose=args.verbose,
                                      impl=args.rl_impl, psf=args.rl_psf)
                    exif_mod.clone_exif(f, outpath, verbose=args.verbose)
                else:
                    write_one(f, outpath, out01, is_u8=False)
                written.append(outpath)
            return
        den_full, nb = get_batcher(cs_a, ucs_a).denoise_batch(
            np.stack([r for _, r in chunk]), scale,
            keep_padded=True)  # (ndev, H, W, C) sharded
        if rldeblur:
            # per-device single-image RL under shard_map: on TPU each
            # device runs the fused Pallas kernel on its own image
            # (the plain 4-D batched call is XLA-only); then the gmic
            # post-op + uint8 quantize, all still sharded, one fetch
            u = batch_engine.rl_deblur_sharded(
                den_full, float(sigma), int(iterations), mesh,
                impl=args.rl_impl, psf=args.rl_psf)
            # slice the DEVICE array before fetching: a short final chunk
            # must not download the ndev-nb zero-dummy shards
            host = np.asarray(ops_rl.gmic_quantize_u8(u)[:nb])
        else:
            den = den_full[:nb]
        for j, (f, _) in enumerate(chunk):
            print(f"\n----------------- {f.name} (device {j}) -----------------\n")
            outpath = _collision_resolve(_initial_outpath(args, f))
            if rldeblur:
                write_one(f, outpath, host[j], is_u8=True)
            else:
                write_one(f, outpath, den[j], is_u8=False)
            written.append(outpath)

    def process_stragglers_pool(groups):
        """Leftover images too few for the image-batcher: instead of the
        serial row-band pass (whole mesh per image, one image at a time),
        run them CONCURRENTLY one-per-device through the request pool
        (parallel/engine_pool) — mixed shapes don't couple, each image
        runs whole on one chip (denoise -> RL -> quantize -> fetch), and
        tiny shapes take the pad-to-valid fallback inside the replica."""
        import jax

        from ..parallel.engine_pool import EnginePool

        items, taken = [], set()
        for members, scale in groups:
            for f, raw in members:
                outpath = _collision_resolve(_initial_outpath(args, f),
                                             taken=taken)
                taken.add(outpath)
                items.append((f, raw, scale, outpath))
        pool = EnginePool(network, raw_params,
                          jax.local_devices()[:ndev], cs=cs, ucs=ucs,
                          activation=activation,
                          batch_size=args.batch_size,
                          compute_dtype=args.compute_dtype)
        try:
            def one(worker, item):
                f, raw, scale, outpath = item
                out01 = worker.denoise_raw(raw, scale, out_dtype="device")
                if rldeblur:
                    _rl_array_to_file(out01, outpath, sigma,
                                      int(iterations), quality,
                                      verbose=args.verbose,
                                      impl=args.rl_impl, psf=args.rl_psf)
                    exif_mod.clone_exif(f, outpath, verbose=args.verbose)
                else:
                    write_one(f, outpath, out01, is_u8=False)
                print(f"\n----------------- {f.name} "
                      f"(pool: {worker.device}) -----------------\n")
                return outpath
            written.extend(pool.map(items, one))
        finally:
            pool.close()

    # STREAMING decode + group by (shape, dtype): files decode one at a
    # time into per-shape pending lists; a list dispatches the moment it
    # holds a full mesh chunk, so host memory is bounded at ~ndev decoded
    # images per distinct shape (not the whole directory) and one compiled
    # step serves each shape. Stragglers flush at the end: big leftover
    # groups keep the image-batcher; the small ones (few images per shape —
    # previously a serial row-band pass each) pool one-per-device when
    # there are at least two of them.
    pending: dict = {}
    for f in files:
        raw, scale = imgio.load_img_raw(str(f))
        key = (raw.shape, str(raw.dtype), scale)
        pending.setdefault(key, []).append((f, raw))
        if len(pending[key]) == ndev:
            process_chunk(pending.pop(key), scale)
    small, big = [], []
    for (_, _, scale), members in pending.items():
        (small if len(members) * 2 <= ndev else big).append((members, scale))
    for members, scale in big:
        process_chunk(members, scale)
    if ndev > 1 and sum(len(m) for m, _ in small) >= 2:
        process_stragglers_pool(small)
    else:
        for members, scale in small:
            process_chunk(members, scale)
    return written


def main(argv=None):
    from ..utils import jaxcache
    jaxcache.enable()
    args = build_parser().parse_args(argv)
    # multi-host pods: join BEFORE the first backend touch (ADVICE r2 —
    # jax.distributed.initialize raises after any jax.devices()/jit call)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from ..parallel import mesh as pmesh

        pmesh.init_distributed()
    input_path = pathlib.Path(args.raw_image)
    if input_path.is_dir():
        # reference parity: dir mode iterates the RAW extension list
        # (denoise.py:491-500). Superset: with --tiff-input it accepts
        # TIFFs (the reference's dir loop silently matched nothing there)
        exts = [".tif", ".tiff"] if args.tiff_input else VALID_EXTENSIONS
        files = [f for f in sorted(input_path.iterdir())
                 if f.suffix.lower() in exts]
        # multi-device hosts: dispatch qualifying images one-per-device
        # (the rest fall through to the serial loop below)
        import jax

        if jax.process_count() > 1:
            # multi-host pod: images are independent; each process owns a
            # strided shard of the directory and drives its LOCAL chips
            from ..parallel import mesh as pmesh

            nfiles = len(files)
            files = pmesh.process_shard(files)
            print(f"multi-host pod: process {jax.process_index()}/"
                  f"{jax.process_count()} takes {len(files)}/{nfiles} files")
        ndev = args.devices
        if ndev is None:
            ndev = jax.local_device_count()
        if ndev > 1 and files:
            cmd_darktable = external.find_darktable(args.dt)
            cmd_gmic = external.find_gmic(args.gmic) if args.use_gmic else None
            batch = [f for f in files
                     if _batchable(args, f, cmd_darktable, cmd_gmic)]
            if batch:
                denoise_dir_batch(args, batch, ndev)
            files = [f for f in files if f not in batch]
        try:
            for i, f in enumerate(files):
                if args.tiff_input and i + 1 < len(files):
                    _prefetch_decode(files[i + 1])  # overlap decode with compute
                print(f"\n----------------------- {f.name} -------------------------\n")
                denoise_file(args, f)
        finally:
            _shutdown_decode_pool()
    else:
        denoise_file(args, input_path)


if __name__ == "__main__":
    main()
