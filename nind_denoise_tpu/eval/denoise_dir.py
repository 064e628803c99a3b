"""denoise_dir — batch test/eval harness over a directory or test reserve.

Parity with /root/reference/src/nind_denoise/denoise_dir.py:49-132: resolves
the sets to denoise from ``--noisy_dir`` or the test-reserve yaml, denoises
every non-baseline image, scores MSE/SSIM/MS-SSIM against the lowest-ISO
ground truth, averages per set and overall, and records results into
``trainres.json`` (best-effort) and ``testres.json``.

TPU-native: ONE TileEngine instance serves every image (the reference shells
a fresh ``python denoise_image.py`` per image, recompiling everything each
time; here the compiled tile program is reused across the whole run).
"""

from __future__ import annotations

import os
import sys
from typing import List

from ..core.tiles import default_cs_ucs
from ..models import params_io
from ..utils import conf, json_saver, utilities
from . import score
from ..train.dataset import get_baseline_fpath


def build_parser():
    p = conf.LayeredArgumentParser(
        description=__doc__, default_config_files=[conf.common_config_fpath()])
    p.add_argument("--noisy_dir", type=str,
                   help="directory of test sets (or a directory of images)")
    p.add_argument("--g_network", "--network", type=str)
    p.add_argument("--model_path", "--model_fpath")
    p.add_argument("--model_parameters", default="", type=str)
    p.add_argument("--result_dir", default="../../results/NIND/test", type=str)
    p.add_argument("--no_scoring", action="store_true")
    p.add_argument("--cs", type=int)
    p.add_argument("--ucs", type=int)
    p.add_argument("--skip_existing", action="store_true")
    p.add_argument("--whole_image", action="store_true")
    p.add_argument("--pad", type=int)
    p.add_argument("--max_subpixels", type=int)
    p.add_argument("--test_reserve", nargs="*")
    p.add_argument("--orig_data")
    p.add_argument("--models_dpath")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--devices", type=int,
                   help="Shard tiles over this many devices (row-band "
                        "sharded engine). Default: all visible when >1")
    return p


def main(argv=None):
    from ..utils import jaxcache
    jaxcache.enable()
    from ..core import imgio
    from ..engine.tile_engine import make_engine
    from ..pipeline import denoise_image_cli
    from ..train.loop import get_test_reserve_list

    args = build_parser().parse_known_args_layered(argv)[0]
    assert args.model_path is not None
    denoise_image_cli.autodetect_network_cs_ucs(args)
    model_path = params_io.complete_path(args.model_path,
                                         models_dpath=args.models_dpath,
                                         keyword="generator")

    if args.noisy_dir is not None:
        sets = sorted(os.listdir(args.noisy_dir))
        if sets and os.path.isfile(os.path.join(args.noisy_dir, sets[0])):
            sets = ["."]
        save_dir = os.path.join(args.result_dir,
                                model_path.split(os.sep)[-2]
                                if os.sep in model_path else "model")
    else:
        if not args.test_reserve:
            sys.exit("error: provide --noisy_dir or --test_reserve "
                     "(nothing to evaluate)")
        if not args.orig_data or not os.path.isdir(args.orig_data):
            # the layered config supplies a relative default; if it does not
            # resolve here, fail with the flag name instead of a
            # FileNotFoundError deep inside get_baseline_fpath
            sys.exit(f"error: --test_reserve reads scenes from --orig_data, "
                     f"which is {args.orig_data!r} (not a directory)")
        sets = get_test_reserve_list(args.test_reserve)
        args.noisy_dir = args.orig_data
        reserve_tag = (utilities.get_leaf(args.test_reserve[0])
                       if len(args.test_reserve) == 1
                       and os.path.isfile(args.test_reserve[0])
                       else str(args.test_reserve))
        save_dir = os.path.join(utilities.get_root(model_path), "test",
                                utilities.get_leaf(model_path), reserve_tag)
    os.makedirs(save_dir, exist_ok=True)

    # one engine for the whole run
    args.model_path = model_path
    params, state, activation = denoise_image_cli.load_generator_params(args)
    if args.g_network == "UNet":
        params = (params, state)
    import jax
    import numpy as np

    # local devices: on a multi-host pod each process evaluates its image
    # shard with its own chips (merge + chief-only writes below)
    ndev = args.devices or jax.local_device_count()
    # per-image tile adaptation + tiny fallback — the same small-image
    # behavior as the product CLIs (the reference's eval would crash on
    # images below the minimum tiling, denoise_image.py:151-170)
    from ..core import tiles as tiles_mod
    from ..engine.tile_engine import make_sharded_denoiser, resolve_apply_fn
    from ..models import get_network

    check_cs = getattr(get_network(args.g_network), "check_cs", None)
    resolved = resolve_apply_fn(args.g_network, params, activation)
    _denoisers: dict = {}

    def _fn_for(cs: int, ucs: int):
        key = (cs, ucs)
        if key not in _denoisers:
            if ndev > 1 and not args.whole_image:
                # row-band tile sharding per image (same auto-engagement
                # and guard rails as the product CLIs)
                shd = make_sharded_denoiser(
                    args.g_network, None, ndev, cs=cs, ucs=ucs,
                    batch_size=args.batch_size, resolved=resolved,
                    max_subpixels=args.max_subpixels)
                _denoisers[key] = lambda raw, scale: np.round(np.clip(
                    shd.denoise_hwc(raw.astype(np.float32) / scale), 0, 1)
                    * 65535).astype(np.uint16)
            else:
                eng = make_engine(args.g_network, None, cs=cs, ucs=ucs,
                                  resolved=resolved,
                                  batch_size=args.batch_size,
                                  max_subpixels=args.max_subpixels)
                _denoisers[key] = lambda raw, scale: eng.denoise_raw(
                    raw, scale, out_dtype="uint16")
        return _denoisers[key]

    def denoise_u16(raw, scale):
        try:
            cs, ucs = tiles_mod.adapt_cs_ucs(raw.shape[0], raw.shape[1],
                                             args.cs, args.ucs, check=check_cs)
        except tiles_mod.TilingError:
            if "tiny" not in _denoisers:
                _denoisers["tiny"] = make_engine(
                    args.g_network, None, resolved=resolved,
                    max_subpixels=args.max_subpixels)
            return _denoisers["tiny"].denoise_tiny(raw, scale,
                                                   out_dtype="uint16")
        return _fn_for(cs, ucs)(raw, scale)

    # whole-image mode still needs a plain engine handle
    engine = (make_engine(args.g_network, None, cs=args.cs, ucs=args.ucs,
                          resolved=resolved, batch_size=args.batch_size,
                          max_subpixels=args.max_subpixels)
              if args.whole_image else None)

    # decode-ahead: the next image decodes on a worker thread while the
    # current one runs on the device (the reference re-spawned a python
    # subprocess per image instead)
    import concurrent.futures as cf

    decode_pool = cf.ThreadPoolExecutor(max_workers=1)
    pending: dict = {}

    def decode_ahead(fpath):
        if fpath not in pending:
            pending[fpath] = decode_pool.submit(imgio.load_img_raw, fpath)

    # multi-host pods: each process evaluates a strided shard of every
    # set's images on its local devices (shared filesystem assumed for the
    # denoised outputs); per-set metrics merge across processes below via
    # an allgather of (sum, count) — the allgather doubles as the barrier
    # that makes the chief-only JSON writes and legacy scorer safe
    pcount, pidx = jax.process_count(), jax.process_index()
    is_chief = pidx == 0
    if pcount > 1:
        print(f"multi-host eval: process {pidx}/{pcount} takes every "
              f"{pcount}th image of each set")
    LOSS_KEYS = ("mse", "ssim", "msssim")

    losses_per_set: List[dict] = []
    for aset in sets:
        set_dir = os.path.join(args.noisy_dir, aset)
        baseline = get_baseline_fpath(set_dir)
        losses_per_img = []
        work = [fn for fn in sorted(os.listdir(set_dir))
                if os.path.isfile(os.path.join(set_dir, fn))
                and os.path.join(set_dir, fn) != baseline]
        if pcount > 1:
            from ..parallel import mesh as pmesh

            work = pmesh.process_shard(work)

        def _ofp(fn2):
            p = os.path.join(save_dir, fn2)
            root, ext = os.path.splitext(p)
            # uint16 output cannot be a JPEG (cv2: 8-bit only); remap any
            # jpeg-ish extension, case-insensitively (.jpg/.JPG/.jpeg)
            return root + ext + ".tif" if ext.lower() in (".jpg", ".jpeg") \
                else p

        # which images actually need denoising — decode-ahead must skip
        # the skipped ones too, or every skipped image's decoded array
        # leaks in `pending` for the life of the run (review r3)
        todo = [not (args.skip_existing and os.path.isfile(_ofp(fn2)))
                for fn2 in work]
        for idx, fn in enumerate(work):
            in_fpath = os.path.join(set_dir, fn)
            out_fpath = _ofp(fn)
            nxt = next((j for j in range(idx + 1, len(work)) if todo[j]),
                       None)
            if nxt is not None:
                decode_ahead(os.path.join(set_dir, work[nxt]))
            fut = pending.pop(in_fpath, None)  # always drained
            if todo[idx]:
                raw, scale = (fut.result() if fut is not None
                              else imgio.load_img_raw(in_fpath))
                if args.whole_image:
                    img = raw.astype("float32").transpose(2, 0, 1) / scale
                    out = engine.denoise_whole(img, pad=args.pad or 128)
                    imgio.save_img(out, out_fpath)
                else:
                    # storage dtype straight to the streaming engine
                    out = denoise_u16(raw, scale)
                    denoise_image_cli.imgio_save_uint16(out, out_fpath)
            if args.no_scoring:
                # the user opted out of metrics: do not pay (or crash on) a
                # baseline comparison — e.g. a flat dir with no real GT
                continue
            cur = score.get_losses(baseline, out_fpath)
            print(f"in: {in_fpath}, out: {out_fpath}, clean: {baseline}")
            print(cur)
            losses_per_img.append(cur)
        if pcount > 1:
            # every process calls the allgather for every set (even with an
            # empty local shard) — it is a collective AND the cross-process
            # completion barrier for this set's output files
            import numpy as np
            from jax.experimental import multihost_utils

            local = np.array(
                [sum(d[k] for d in losses_per_img) for k in LOSS_KEYS]
                + [float(len(losses_per_img))], np.float32)
            tot = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
            if tot[-1] > 0:
                losses_per_set.append(
                    {k: float(tot[i] / tot[-1]) for i, k in enumerate(LOSS_KEYS)})
        elif losses_per_img:
            losses_per_set.append(utilities.avg_listofdicts(losses_per_img))
    overall = utilities.avg_listofdicts(losses_per_set)
    print(overall)
    if not is_chief:
        return overall  # chief writes the JSONs / legacy score (same values)

    # record into trainres.json (best-effort) + testres.json (denoise_dir.py:105-129)
    epoch = None
    try:
        epoch = int(utilities.get_leaf(model_path).split("_")[1].split(".")[0])
        js = json_saver.JSONSaver(os.path.join(utilities.get_root(model_path),
                                               "trainres.json"), step_type="epoch")
        js.add_res(step=epoch, res=overall, key_prefix="test_")
    except (ValueError, IndexError) as e:
        print(f"Cannot determine epoch from model_path {model_path} ({e})")
    try:
        js = json_saver.JSONSaver(os.path.join(utilities.get_root(model_path),
                                               "testres.json"), step_type="epoch")
        js.add_res(step=epoch if epoch is not None else 0, res=overall,
                   key_prefix="test_")
    except Exception as e:
        print(f"testres saver failed ({e}); dumping raw")
        utilities.dict_to_json(overall, os.path.join(
            utilities.get_root(model_path), "testres.json"))
    if not args.no_scoring and sets and sets != ["."]:
        try:
            score.gen_score(save_dir, os.path.join(args.noisy_dir, sets[0]))
        except Exception as e:
            print(f"legacy scorer skipped: {e}")
    return overall


if __name__ == "__main__":
    main()
