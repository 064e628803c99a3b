"""denoise_image — tiled single-image denoising CLI (the compute core).

Surface parity with the reference's denoise_image.py __main__
(/root/reference/src/nind_denoise/denoise_image.py:180-283): same flags
(--cs/--ucs/--overlap/-i/-o/-b/--network/--model_path/--model_parameters/
--max_subpixels/--whole_image/--pad/--exif_method/--debug), same network/
tile-size autodetection from the model path, same output-extension bit-depth
conventions. The engine underneath is the TPU-native TileEngine.

egrun:
    python -m nind_denoise_tpu.pipeline.denoise_image_cli \
        -i noisy.tif -o denoised.tiff --network UtNet --model_path ckpt.npz
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

from ..core import imgio
from ..core.tiles import default_cs_ucs
from ..models import params_io
from ..utils import conf
from . import exif as exif_mod


def autodetect_network_cs_ucs(args) -> None:
    """Arch from model path; per-arch tile defaults (denoise_image.py:59-79)."""
    if args.g_network is None:
        if "unet" in args.model_path.lower():
            args.g_network = "UNet"
        elif "utnet" in args.model_path.lower():
            args.g_network = "UtNet"
        else:
            sys.exit("Could not determine network architecture from path. "
                     "Please specify --network (typically UNet or UtNet)")
        print(f"Assuming {args.g_network} from path")
    # NOTE reference parity (denoise_image.py:69-79): when EITHER is unset
    # BOTH are replaced by the arch defaults — an explicit --cs without
    # --ucs is deliberately ignored, exactly like upstream
    if args.cs is None or args.ucs is None:
        args.cs, args.ucs = default_cs_ucs(args.g_network)
        print(f"cs={args.cs}, ucs={args.ucs}")


def parse_model_parameters(strparameters: Optional[str]) -> dict:
    """'k=v,k=v' model parameter string (nn_common.py:123-124)."""
    if not strparameters:
        return {}
    out = {}
    for kv in strparameters.split(","):
        k, v = kv.split("=")
        out[k] = int(v) if v.isdigit() else v
    return out


def make_output_fpath(input_fpath: str, model_fpath: str) -> str:
    model_dpath = os.path.dirname(os.path.normpath(model_fpath))
    out_dir = os.path.join(model_dpath, "test", "denoised_images")
    os.makedirs(out_dir, exist_ok=True)
    return os.path.join(out_dir, f"{os.path.basename(input_fpath)}_"
                                 f"{os.path.basename(model_fpath)}.tif")


def build_parser():
    p = conf.LayeredArgumentParser(
        description=__doc__, default_config_files=[conf.common_config_fpath()])
    p.add_argument("--cs", type=int, help="Tile size")
    p.add_argument("--ucs", type=int, help="Useful tile size")
    p.add_argument("-ol", "--overlap", default=6, type=int,
                   help="Merge crops with this much overlap")
    p.add_argument("-i", "--input", default="in.jpg", type=str)
    p.add_argument("-o", "--output", type=str,
                   help="Output file (default: model_dpath/test/denoised_images/fn.tif)")
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--exif_method", default="auto", type=str,
                   help="auto, or noexif to skip EXIF transplant")
    p.add_argument("--g_network", "--network", "--arch", type=str)
    p.add_argument("--model_path", help="generator checkpoint (.npz native or torch .pt)")
    p.add_argument("--model_parameters", type=str,
                   help='"parameter1=value1,parameter2=value2"')
    p.add_argument("--max_subpixels", type=int)
    p.add_argument("--whole_image", action="store_true")
    p.add_argument("--pad", type=int)
    p.add_argument("--models_dpath")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "int8", "int8_static"],
                   help="int8/int8_static (UtNet only): quantized forward on "
                        "the MXU; int8_static bakes calibrated activation "
                        "scales (the fast variant). Bounded quality cost "
                        "pinned by tests/test_qconv.py (see PERF.md 'int8 "
                        "engine mode')")
    p.add_argument("--precision", default="default", choices=["default", "float32"])
    p.add_argument("--trace_dir", help="capture a jax.profiler trace here")
    p.add_argument("-q", "--quality", type=int, default=95,
                   help="JPEG quality for .jpg outputs (pipeline-CLI parity)")
    p.add_argument("--devices", type=int,
                   help="Shard tiles over this many devices "
                        "(parallel/sharded_engine row bands). Default: all "
                        "visible devices when >1 (multi-chip hosts engage "
                        "automatically); 1 forces the single-device engine")
    return p


def load_generator_params(args):
    kwargs = parse_model_parameters(args.model_parameters)
    # activation-from-path hack parity (denoise_image.py:223-225)
    if not kwargs and args.model_path and "activation" in args.model_path:
        act = args.model_path.split("activation")[-1].split("_")[1]
        kwargs["activation"] = act
        print(f"set model parameters to activation={act} based on model_path")
    activation = kwargs.pop("activation", "PReLU")
    kwargs.pop("funit", None)  # funit is encoded in the weights themselves
    params, state = params_io.load_generator(
        args.model_path, args.g_network, models_dpath=args.models_dpath)
    return params, state, activation


def _resolve_devices(args) -> int:
    """--devices, defaulting to every visible device (multi-chip hosts
    engage the sharded engine automatically; single-chip unchanged)."""
    if getattr(args, "devices", None):
        return args.devices
    import jax

    # on a multi-host pod each process drives its own chips (inference is
    # embarrassingly parallel across hosts); single-host: same number
    return jax.local_device_count()


def _run_sharded(args, ndev: int) -> None:
    """Multi-device path: row-band tile parallelism over a mesh
    (parallel/sharded_engine.py; zero collectives). The image loads fp32 on
    host and the canvas comes back fp32 — the wire-minimal streaming of the
    single-device engine matters on the tunnel dev environment, while this
    path targets co-located multi-chip hosts (PCIe, compute-bound)."""
    from ..engine.tile_engine import make_sharded_denoiser

    params, state, activation = load_generator_params(args)
    if args.g_network == "UNet":
        params = (params, state)
    img = imgio.load_img(args.input)  # (3, H, W) fp32 [0,1]
    cs, ucs = _adapt_tiles(args, img.shape[1], img.shape[2])
    resolved = None
    if args.compute_dtype == "int8_static":
        # calibrate the static scales on the actual input (see
        # calib_resolved in run())
        from ..engine.tile_engine import resolve_apply_fn
        from ..ops.qconv import calib_from_image

        resolved = resolve_apply_fn(args.g_network, params, activation,
                                    compute_dtype="int8_static",
                                    calib=calib_from_image(
                                        img.transpose(1, 2, 0)))
    sharded = make_sharded_denoiser(
        args.g_network, params, ndev, cs=cs, ucs=ucs, activation=activation,
        ol=args.overlap, batch_size=args.batch_size,
        compute_dtype=args.compute_dtype, precision=args.precision,
        max_subpixels=args.max_subpixels, resolved=resolved)
    out = sharded.denoise_hwc(np.ascontiguousarray(img.transpose(1, 2, 0)))
    _save_float_hwc(out, args.output, quality=args.quality)
    print(f"Denoised image written to {args.output} "
          f"({ndev}-device row-band sharding)")


def _run_whole_spatial(args, ndev: int) -> None:
    """--whole_image over >1 device: H-axis spatial sharding
    (parallel/spatial.SpatialShardedForward — GSPMD partitions the convs
    and inserts the halo exchanges). Fixed per-chip activation memory: the
    'enormous RAM' whole-image regime runs at ~1/ndev the footprint.

    The sharded H axis must divide the mesh (jax.device_put rejects
    non-divisible dims), so the mesh shrinks to the largest divisor of the
    padded height <= ndev (1 == plain single-device forward)."""
    from ..core import tiles as tiles_mod
    from ..engine.tile_engine import resolve_apply_fn
    from ..parallel import mesh as pmesh
    from ..parallel.spatial import SpatialShardedForward

    if args.compute_dtype.startswith("int8"):
        # the spatially-sharded forward runs the exact apply; silently
        # downgrading an explicit int8 opt-in would misreport the mode
        raise SystemExit(
            "--whole_image over >1 device does not support --compute_dtype "
            "int8/int8_static; drop --whole_image (the tiled path supports "
            "it) or use --compute_dtype bfloat16/float32")
    params, state, activation = load_generator_params(args)
    if args.g_network == "UNet":
        params = (params, state)
    apply_fn, params = resolve_apply_fn(args.g_network, params, activation)
    if args.precision == "float32":
        # parity with the single-device whole path (TileEngine._get_whole_jit
        # wraps in highest matmul precision); the context applies at trace
        # time inside the spatial jit
        import jax

        def apply_fn(p, x, _inner=apply_fn):
            with jax.default_matmul_precision("highest"):
                return _inner(p, x)
    img = imgio.load_img(args.input)  # (3, H, W)
    pad = args.pad or 0
    padded = tiles_mod.whole_image_pad(img, pad) if pad \
        else img.astype(np.float32)
    hp = padded.shape[1]
    nd = max(d for d in range(min(ndev, hp), 0, -1) if hp % d == 0)
    if nd != ndev:
        print(f"whole-image H={hp} not divisible by {ndev} devices; "
              f"sharding over {nd}")
    fwd = SpatialShardedForward(apply_fn, params,
                                mesh=pmesh.make_mesh(nd, axis_name="sp",
                                                     local=True))
    y = np.asarray(fwd(padded.transpose(1, 2, 0)))[0]
    if pad:
        y = y[pad:-pad, pad:-pad]
    _save_float_hwc(y, args.output, quality=args.quality)
    print(f"Denoised image written to {args.output} "
          f"({nd}-device spatial sharding, whole image)")


def _adapt_tiles(args, height: int, width: int):
    """Shrink (cs, ucs) for small images (core/tiles.adapt_cs_ucs); the
    reference crashes below ~246 px with UtNet's 504/480 defaults."""
    from ..core import tiles as tiles_mod
    from ..models import get_network

    check = getattr(get_network(args.g_network), "check_cs", None)
    cs, ucs = tiles_mod.adapt_cs_ucs(height, width, args.cs, args.ucs,
                                     args.overlap, check)
    if (cs, ucs) != (args.cs, args.ucs):
        print(f"Image {width}x{height} too small for cs={args.cs}/"
              f"ucs={args.ucs}; using cs={cs}, ucs={ucs}")
    return cs, ucs


def _save_float_hwc(out_hwc: np.ndarray, path: str, quality: int = 95) -> None:
    """fp32 HWC canvas -> file, reference bit-depth conventions
    (tif/png 16-bit, jpg 8-bit, tiff fp32 unclipped — pt_helpers.py:22-40)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".png", ".tif"):
        u16 = np.round(np.clip(out_hwc, 0, 1) * 65535).astype(np.uint16)
        imgio_save_uint16(u16, path)
    elif ext in (".jpg", ".jpeg"):
        u8 = np.round(np.clip(out_hwc, 0, 1) * 255).astype(np.uint8)
        imgio_save_uint8(u8, path, quality=quality)
    else:
        imgio.save_img(out_hwc.astype(np.float32).transpose(2, 0, 1), path)


def run(args) -> str:
    from ..core.tiles import TilingError
    from ..engine.tile_engine import make_engine  # lazy: imports jax

    assert args.model_path is not None, "--model_path is required"
    autodetect_network_cs_ucs(args)
    if args.output is None:
        args.output = make_output_fpath(args.input, args.model_path)

    ndev = _resolve_devices(args)
    if args.debug and ndev > 1:
        print("--debug tile dumps are a single-device feature; using 1 device")
        ndev = 1
    if ndev > 1 and not args.whole_image:
        start_time = time.time()
        try:
            _run_sharded(args, ndev)
            if args.exif_method != "noexif":
                exif_mod.clone_exif(args.input, args.output)
            print("Elapsed time: " + str(time.time() - start_time)
                  + " seconds")
            return args.output
        except TilingError:
            # below the minimum tiling: sharding a tiny image is pointless;
            # fall through to the single-device path (tiny padded forward)
            pass
    if ndev > 1 and args.whole_image:
        start_time = time.time()
        _run_whole_spatial(args, ndev)
        if args.exif_method != "noexif":
            exif_mod.clone_exif(args.input, args.output)
        print("Elapsed time: " + str(time.time() - start_time) + " seconds")
        return args.output

    params, state, activation = load_generator_params(args)
    if args.g_network == "UNet":
        params = (params, state)

    def build_engine(cs, ucs, resolved=None):
        return make_engine(args.g_network, params, cs=cs, ucs=ucs,
                           activation=activation, ol=args.overlap,
                           batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype,
                           precision=args.precision,
                           max_subpixels=args.max_subpixels,
                           debug_dir="dbg" if args.debug else None,
                           resolved=resolved)

    def calib_resolved(get_img_hwc, scale: float = 1.0):
        """int8_static: calibrate the static scales on crops of the ACTUAL
        input (qconv.calib_from_image) instead of the synthetic extremal
        set — content-matched scales digitize the image's real dynamic
        range (the win is measured in tests/test_qconv.py).

        ``get_img_hwc`` is a THUNK so the default (non-int8) path pays
        nothing; with a storage-dtype array + ``scale``, only the six
        calibration crops are normalized (raw-dtype fast-path rule)."""
        if args.compute_dtype != "int8_static":
            return None
        from ..engine.tile_engine import resolve_apply_fn
        from ..ops.qconv import calib_from_image

        return resolve_apply_fn(args.g_network, params, activation,
                                compute_dtype="int8_static",
                                calib=calib_from_image(get_img_hwc(),
                                                       scale=scale))

    start_time = time.time()
    if args.whole_image:
        img = imgio.load_img(args.input)
        engine = build_engine(
            args.cs, args.ucs,
            resolved=calib_resolved(lambda: img.transpose(1, 2, 0)))
        out_chw = engine.denoise_whole(img, pad=args.pad or 0)
        imgio.save_img(out_chw, args.output)
    else:
        # storage-dtype pixels straight to the streaming engine: the [0,1]
        # normalization fuses into the tile program (saves the host fp32
        # divide + transpose, and uint16 uploads are exact vs the f32->f16
        # wire cast)
        raw, scale = imgio.load_img_raw(args.input)
        resolved = calib_resolved(lambda: raw, scale)
        try:
            cs, ucs = _adapt_tiles(args, raw.shape[0], raw.shape[1])
            engine = build_engine(cs, ucs, resolved=resolved)
            den = lambda dt: engine.denoise_raw(raw, scale, out_dtype=dt)
        except TilingError:
            # below the minimum tiling (the reference aborts here):
            # pad-to-valid single forward, crop (TileEngine.denoise_tiny)
            print(f"Image {raw.shape[1]}x{raw.shape[0]} below the minimum "
                  f"tiling; denoising as one padded forward")
            engine = build_engine(args.cs, args.ucs, resolved=resolved)
            den = lambda dt: engine.denoise_tiny(raw, scale, out_dtype=dt)
        ext = os.path.splitext(args.output)[1].lower()
        # quantize on device to minimize the downlink (engine docstring)
        if ext in (".png", ".tif"):
            imgio_save_uint16(den("uint16"), args.output)
        elif ext in (".jpg", ".jpeg"):
            imgio_save_uint8(den("uint8"), args.output, quality=args.quality)
        else:  # .tiff fp32, unclipped
            out = den("float32" if args.precision == "float32" else "float16")
            imgio.save_img(out.astype(np.float32).transpose(2, 0, 1), args.output)
    print(f"Denoised image written to {args.output}")

    if args.exif_method != "noexif":
        exif_mod.clone_exif(args.input, args.output)
    print("Elapsed time: " + str(time.time() - start_time) + " seconds")
    return args.output


def imgio_save_uint16(img_hwc: np.ndarray, path: str) -> None:
    import cv2

    cv2.imwrite(path, cv2.cvtColor(img_hwc, cv2.COLOR_RGB2BGR))


def imgio_save_uint8(img_hwc: np.ndarray, path: str, quality: int = 95) -> None:
    import cv2

    cv2.imwrite(path, cv2.cvtColor(img_hwc, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, quality])


def main(argv=None):
    from ..utils import jaxcache
    jaxcache.enable()
    # multi-host pods: join BEFORE the first backend touch (ADVICE r2 —
    # jax.distributed.initialize raises after any jax.devices()/jit call)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from ..parallel import mesh as pmesh

        pmesh.init_distributed()
    from ..utils.log import maybe_profile

    args, _ = build_parser().parse_known_args_layered(argv)
    with maybe_profile(getattr(args, "trace_dir", None)):
        run(args)


if __name__ == "__main__":
    main()
