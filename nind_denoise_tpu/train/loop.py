"""nn_train — train a denoising generator (+ up to 2 cGAN discriminators).

Behavioral parity with /root/reference/src/nind_denoise/nn_train.py:118-448:
layered YAML config (common + train defaults + --config/--config2), loss
weights {SSIM, MSSSIM, L1, MSE, D1, D2} normalized to 1, experiment dir named
by timestamp + argv, Printer tee to train.log, JSONSaver trainres.json with
best tracking, per-epoch checkpointing with retention of only the best
epochs, validation every ``validation_interval``, optional whole-image test,
manual patience-window LR decay, stochastic discriminator/generator
scheduling with fuzzy targets, ``--freeze_generator`` warm-up, ``time_limit``
and ``min_lr`` stops, and debug options
{short_run, check_dataset, output_val_images, output_test_images,
keep_all_output_images}.

TPU-native: jitted functional train steps (train/steps.py), Adam-amsgrad via
optax, bfloat16-optional compute, and data parallelism over all visible
devices (batch sharded on a ('data',) mesh; params replicated; XLA inserts
the gradient all-reduce) — the reference is single-device only. SIGTERM /
SIGINT trigger a graceful shutdown (finish the batch, checkpoint, exit —
see GracefulShutdown); the reference loses the epoch in flight.

egrun (dummy run first, as the reference README prescribes):
    python -m nind_denoise_tpu.train.loop --config \
        nind_denoise_tpu/configs/train_conf_utnet_simple.yaml \
        --debug_options short_run output_val_images --epochs 3
"""

from __future__ import annotations

import collections
import datetime
import os
import random
import shutil
import signal
import statistics
import sys
import threading
import time
from functools import partial
from typing import Optional

import numpy as np
import yaml

from ..models import params_io
from ..utils import conf, json_saver
from ..utils.log import Printer
from . import dataset as ds_mod

DEBUG_OPTIONS = ("short_run", "check_dataset", "output_val_images",
                 "output_test_images", "keep_all_output_images")


def build_parser():
    cfg_dir = conf.default_configs_dir()
    p = conf.LayeredArgumentParser(
        description=__doc__,
        default_config_files=[os.path.join(cfg_dir, "common_conf_default.yaml"),
                              os.path.join(cfg_dir, "train_conf_defaults.yaml")])
    p.add_argument("--batch_size", type=int)
    p.add_argument("--time_limit", type=int)
    p.add_argument("--g_activation", type=str, default="PReLU")
    p.add_argument("--g_funit", type=int, default=32)
    p.add_argument("--g_model_path")
    p.add_argument("--models_dpath")
    p.add_argument("--beta1", type=float)
    p.add_argument("--g_lr", type=float)
    p.add_argument("--weight_SSIM", type=float)
    p.add_argument("--weight_MSSSIM", type=float)
    p.add_argument("--weight_L1", type=float)
    p.add_argument("--weight_MSE", type=float)
    p.add_argument("--test_reserve", nargs="*")
    p.add_argument("--train_data", nargs="*")
    p.add_argument("--cs", "--crop_size", type=int)
    p.add_argument("--min_crop_size", type=int)
    p.add_argument("--loss_cs", "--loss_crop_size", type=int)
    p.add_argument("--debug_options", "--debug", nargs="*", default=[])
    p.add_argument("--g_network", type=str)
    p.add_argument("--threads", type=int, default=6)
    p.add_argument("--min_lr", type=float)
    p.add_argument("--epochs", type=int, default=9001)
    p.add_argument("--compute_SSIM_anyway", action="store_true")
    p.add_argument("--freeze_generator", action="store_true")
    p.add_argument("--start_epoch", default=1, type=int)
    p.add_argument("--patience", type=int)
    p.add_argument("--reduce_lr_factor", type=float)
    p.add_argument("--validation_interval", default=1, type=int)
    p.add_argument("--test_interval", default=0, type=int)
    p.add_argument("--orig_data")
    p.add_argument("--validation_set_yaml")
    p.add_argument("--exp_mult_min", type=float)
    p.add_argument("--exp_mult_max", type=float)
    p.add_argument("--clean_data_dpath")
    p.add_argument("--clean_data_ratio", type=float)
    # discriminators
    p.add_argument("--d_activation", type=str, default="PReLU")
    p.add_argument("--d2_activation", type=str, default="PReLU")
    p.add_argument("--d_funit", type=int, default=32)
    p.add_argument("--d2_funit", type=int, default=32)
    p.add_argument("--d_model_path")
    p.add_argument("--d2_model_path")
    p.add_argument("--d_loss_function", type=str, default="MSE")
    p.add_argument("--d2_loss_function", type=str, default="MSE")
    p.add_argument("--d_lr", type=float)
    p.add_argument("--d2_lr", type=float)
    p.add_argument("--weight_D1", type=float)
    p.add_argument("--weight_D2", type=float)
    p.add_argument("--d_network", type=str, default="Hul112Disc")
    p.add_argument("--d2_network", type=str, default="Hul112Disc")
    p.add_argument("--not_conditional", action="store_true")
    p.add_argument("--not_conditional_2", action="store_true")
    p.add_argument("--discriminator_advantage", type=float, default=0.0)
    p.add_argument("--discriminator2_advantage", type=float, default=0.0)
    # TPU-native extras
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the generator forward (save HBM)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each batch into N sequential microbatches and "
                        "apply ONE averaged update (~1/N the activation "
                        "memory): train the reference's bs=30 configs, or "
                        "larger, on chips whose HBM cannot hold the full "
                        "batch. Exact same optimizer trajectory for "
                        "stateless nets (UtNet & co); BatchNorm nets (UNet) "
                        "normalize per-microbatch, so their trajectory "
                        "differs slightly (standard accumulation caveat). "
                        "Must divide --batch_size")
    p.add_argument("--log_interval", type=int, default=1,
                   help="print per-batch generator losses every N batches "
                        "(1 = reference parity). N>1 also DEFERS the "
                        "device->host metric readback between prints: on a "
                        "high-latency link each float(loss) readback "
                        "serializes dispatch against the ~25 ms RPC, so "
                        "deferring lets successive steps pipeline (epoch "
                        "means stay exact via a device-side accumulator). "
                        "Per-batch D losses still read back when "
                        "discriminators are active (their stochastic "
                        "scheduling is host-side by design)")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--cache_images", action="store_true",
                   help="decode training crops once and serve from RAM "
                        "(small datasets; this host has 1 core)")
    p.add_argument("--device_cache", type=int, default=0,
                   help="hold up to N (clean, noisy) crop pairs in device "
                        "HBM and run the rot90/flip/exp_mult augmentations "
                        "on chip (train/device_cache.py): zero host bytes "
                        "per step — the host feed was measured 20-40x off "
                        "the step rate on this deployment (PERF.md r4). "
                        "0 = off (reference-parity host loader). Requires "
                        "single-device, no clean-clean mixing, and no "
                        "JPEG/noise augs; falls back with a warning "
                        "otherwise")
    p.add_argument("--checkpoint_interval", type=int, default=1,
                   help="save the generator every N epochs instead of every "
                        "epoch (reference parity: 1). New-BEST epochs (any "
                        "tracked metric) always save regardless, so "
                        "directory->best-epoch resolution keeps working, and "
                        "stops (time_limit/min_lr/SIGTERM) force a final "
                        "save. 0 = stops/final only (no periodic or "
                        "best-epoch saves — benchmarking/dev). On "
                        "remote-device links the per-epoch checkpoint fetch "
                        "(~124 MB for funit=32 + Adam) can dominate epoch "
                        "wall (PERF.md r5) — N>1 bounds it")
    p.add_argument("--device_cache_refresh", type=float, default=0.25,
                   help="fraction of the device cache re-rolled (new ISO "
                        "pair + crop position, host-decoded in the "
                        "background) and re-uploaded per epoch boundary; "
                        "0 freezes pair/crop choices after the initial "
                        "fill (augs still re-randomize every epoch)")
    p.add_argument("--msssim_warmup_epochs", type=int, default=0,
                   help="train the first N epochs with MSE before switching "
                        "to the configured loss. MS-SSIM's relu'd product "
                        "has zero gradient whenever any scale's cs term goes "
                        "negative — a randomly initialized generator can "
                        "start (and stay) in that dead zone; the reference "
                        "documents the same instability and prescribes "
                        "re-running (src/nind_denoise/README.md:140). "
                        "Default 0 = strict reference parity.")
    p.add_argument("--coordinator", help="Multi-host pod: coordinator "
                   "address host:port (or set JAX_COORDINATOR_ADDRESS). "
                   "Joined EAGERLY at entry, before the first backend touch")
    p.add_argument("--num_processes", type=int,
                   help="Multi-host pod: total process count")
    p.add_argument("--process_id", type=int,
                   help="Multi-host pod: this process's index")
    return p


def get_test_reserve_list(test_reserve):
    """yaml path / '0' / plain list (nn_common.get_test_reserve_list)."""
    if test_reserve and len(test_reserve) == 1:
        if str(test_reserve[0]).endswith(".yaml"):
            with open(test_reserve[0], "r") as fp:
                return yaml.safe_load(fp)
        if test_reserve[0] == "0":
            return []
    return list(test_reserve or [])


def delete_outperformed_models(dpath: str, keepers: set, model_t: str = "generator",
                               keep_all_output_images: bool = False):
    """Remove checkpoints / val image dirs for epochs not in keepers
    (nn_train.py:95-116 parity, .npz extension)."""
    removed = []
    for fn in os.listdir(dpath):
        fpath = os.path.join(dpath, fn)
        if fn in ("val", "testimages") and not keep_all_output_images:
            for subdir in os.listdir(fpath):
                if subdir.isdigit() and int(subdir) not in keepers:
                    shutil.rmtree(os.path.join(fpath, subdir))
                    removed.append(os.path.join(fpath, subdir))
            continue
        if not fn.startswith(f"{model_t}_"):
            continue
        stem = fn.split("_")[1].split(".")[0]
        if stem.isdigit() and int(stem) not in keepers:
            os.remove(fpath)
            removed.append(fpath)
    return removed


class GracefulShutdown:
    """Cooperative SIGTERM/SIGINT handling for preemptible training.

    TPU pods (and most cluster schedulers) deliver SIGTERM with a short
    grace window before the hard kill; the reference trainer has no handler,
    so preemption loses everything since the last end-of-epoch checkpoint
    (nn_train.py:351-448 saves only at epoch tails). First signal sets a
    flag the epoch loop polls at batch boundaries — the in-flight jitted
    step completes, a full checkpoint (params + BN state + Adam leaves) is
    written, and main() returns cleanly so atexit/log flushing still runs.
    A second signal restores the previous disposition and re-raises, so a
    wedged run (e.g. stuck in a remote compile) can still be killed.

    Signal handlers can only be installed from the main thread; install()
    is a no-op elsewhere (the flag then simply never fires).
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self._prev = {}
        self.requested = False

    def install(self):
        if threading.current_thread() is not threading.main_thread():
            return
        for sig in self.SIGNALS:
            self._prev[sig] = signal.signal(sig, self._handle)

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev = {}

    def _handle(self, signum, frame):
        if self.requested:  # second signal: stop cooperating
            self.restore()
            signal.raise_signal(signum)
            return
        self.requested = True
        # async-signal context: keep IO minimal, defer Printer to the loop
        sys.stderr.write(f"\n[signal {signum}] finishing current batch, "
                         "then checkpointing and exiting "
                         "(send again to force)\n")


class AsyncCheckpointer:
    """Overlap the per-epoch checkpoint fetch+write with the next epoch's
    compute.

    On a remote-device deployment the checkpoint is the hidden epoch tax:
    ``params_io.save`` fetches every param/Adam leaf to host (~124 MB for
    UtNet funit=32 + optimizer state), which on the dev tunnel costs
    4-15 s per epoch — the r4 on-chip record's "7-14 s/epoch wall on
    0.3 s of step time" was substantially THIS, not just the loader
    (PERF.md r5). The epoch loop instead (1) snapshots the state
    device-side (``jnp.copy`` — an HBM copy, ~0.2 ms/GB; required
    because the next train step DONATES the live state's buffers) and
    (2) hands the snapshot to a single writer thread that fetches and
    writes it. Fetching from one dedicated thread while the main thread
    keeps dispatching is the engine's proven-safe transfer split
    (CLAUDE.md); one save in flight at a time bounds host memory and
    preserves file ordering. ``join()`` before retention scans and at
    loop exit makes completion points explicit; writer errors re-raise
    there (a checkpoint that failed to write must not be silent)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def submit(self, save_fn, tree) -> None:
        import jax
        import jax.numpy as jnp

        self.join()
        snap = jax.tree_util.tree_map(
            lambda a: jnp.copy(a) if hasattr(a, "shape") else a, tree)

        def work():
            try:
                save_fn(snap)
            except BaseException as e:  # noqa: BLE001 — re-raised in join
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from e


class GeneratorWrapper:
    """Host-side wrapper pairing a param pytree with its jitted steps
    (reference Generator, nn_common.py:163-272)."""

    def __init__(self, args, weights, apply_fn, init_fn, printer,
                 stateful: bool = False):
        import jax

        from . import steps

        self.apply_fn = apply_fn
        self.stateful = stateful
        self.weights = steps.normalize_weights(weights)
        self.optimizer = steps.make_optimizer(args.g_lr, args.beta1, amsgrad=True)
        opt_leaves = None
        self.resume_epoch = None
        if args.g_model_path:
            fpath = params_io.complete_path(args.g_model_path,
                                            args.models_dpath, "generator")
            if fpath.endswith(".npz"):
                tree = params_io.load(fpath)
                params = tree["params"] if "params" in tree else tree
                state = tree.get("state")
                opt_leaves = tree.get("opt")
                self.resume_epoch = tree.get("epoch")
            else:
                params, state = params_io.load_generator(
                    fpath, args.g_network, models_dpath=args.models_dpath)
        else:
            params = init_fn(jax.random.PRNGKey(args.seed))
            state = None
            if isinstance(params, tuple):
                params, state = params
        opt_state = (steps.restore_opt_state(self.optimizer, params, opt_leaves)
                     if opt_leaves is not None else self.optimizer.init(params))
        if opt_leaves is not None:
            printer.print(f"Restored optimizer state (resume from epoch "
                          f"{self.resume_epoch})")
        self.state = steps.TrainState(params, opt_state, state)
        self.loss = {"weighted": 1.0}

    def infer(self, params, x):
        """Forward pass independent of statefulness (current BN stats)."""
        if self.stateful:
            return self.apply_fn(params, x, self.state.model_state)[0]
        return self.apply_fn(params, x)

    def infer_jit(self, params, x):
        """Jitted ``infer``, compiled once per shape: per-batch callers (the
        discriminator's fake forward, validation image dumps) must not pay
        op-by-op dispatch for a full generator forward every iteration."""
        if getattr(self, "_infer_jit", None) is None:
            import jax

            if self.stateful:
                self._infer_jit = jax.jit(
                    lambda p_, x_, ms: self.apply_fn(p_, x_, ms)[0])
            else:
                self._infer_jit = jax.jit(lambda p_, x_: self.apply_fn(p_, x_))
        if self.stateful:
            return self._infer_jit(params, x, self.state.model_state)
        return self._infer_jit(params, x)

    def get_loss(self, pretty_printed=False, component="weighted"):
        if pretty_printed:
            return ", ".join(f"{k}: {v:.3f}" for k, v in self.loss.items()
                             if v != 1)
        return self.loss.get(component, 1.0)

    def save_model(self, model_dir, epoch, name="generator",
                   checkpointer: Optional[AsyncCheckpointer] = None):
        """Checkpoint params + BN state + optimizer leaves (the reference
        never saved Adam state, SURVEY.md §5.4 — resume here is exact).
        With ``checkpointer`` the device->host fetch + file write overlap
        the next epoch (see AsyncCheckpointer); None = synchronous."""
        import jax

        tree = {"params": self.state.params,
                "state": self.state.model_state,
                # device leaves — the fetch happens at np.savez time, on
                # the writer thread when async (restore_opt_state expects
                # this flat-list layout)
                "opt": list(jax.tree_util.tree_leaves(self.state.opt_state)),
                "epoch": epoch}
        fpath = os.path.join(model_dir, f"{name}_{epoch}.npz")
        if checkpointer is None:
            params_io.save(tree, fpath)
        else:
            checkpointer.submit(lambda t: params_io.save(t, fpath), tree)


def validate_generator(eval_step, gen, validation_set,
                       output_to_dir: Optional[str] = None) -> float:
    """Per-epoch validation on fixed crop pairs (nn_train.py:51-71)."""
    import jax.numpy as jnp

    from ..core import imgio

    losses = []
    for i in range(len(validation_set)):
        clean, noisy = validation_set[i]
        c = jnp.asarray(clean.transpose(1, 2, 0))[None]
        n = jnp.asarray(noisy.transpose(1, 2, 0))[None]
        metrics = eval_step(gen.state.params, c, n, gen.state.model_state)
        if output_to_dir is not None:
            os.makedirs(output_to_dir, exist_ok=True)
            den = np.clip(np.asarray(gen.infer_jit(gen.state.params, n))[0],
                          0, 1)
            imgio.save_img(den.transpose(2, 0, 1),
                           os.path.join(output_to_dir, f"{i}.tif"))
        losses.append(float(metrics["weighted"]))
    return statistics.mean(losses)


def test_generator(gen, test_set, output_to_dir: Optional[str] = None) -> float:
    """Whole-image test (nn_train.py:73-93); device-side here instead of the
    reference's CPU fallback (its "enormous amounts of RAM" warning). On a
    multi-device host the forward additionally shards the H axis over the
    mesh (parallel/spatial.py) so per-chip activation memory stays ~1/ndev
    — the regime the reference pushed to CPU runs at fixed chip footprint."""
    import jax
    import jax.numpy as jnp

    from ..core import imgio
    from . import steps as steps_mod

    spatial = None
    if jax.device_count() > 1:
        from ..parallel.spatial import SpatialShardedForward

        # EVERYTHING the forward reads must travel in the pytree: a
        # closure over gen.state (e.g. UNet BN stats via gen.infer) would
        # be baked into the jitted program at trace time and every later
        # epoch would silently test with stale statistics
        def _bundle():
            if gen.stateful:
                return {"p": gen.state.params, "s": gen.state.model_state}
            return {"p": gen.state.params}

        def _spatial_apply(bundle, x):
            if gen.stateful:
                return gen.apply_fn(bundle["p"], x, bundle["s"])[0]
            return gen.apply_fn(bundle["p"], x)

        # cached on the generator: one compiled program per image size for
        # the whole run; fresh params+state re-replicated ONCE per epoch
        spatial = getattr(gen, "_spatial_test_fwd", None)
        if spatial is None:
            spatial = SpatialShardedForward(_spatial_apply, _bundle())
            gen._spatial_test_fwd = spatial
        else:
            spatial.set_params(_bundle())

    def whole_forward(n):
        if spatial is not None and n.shape[1] % spatial.ndev == 0:
            try:
                return spatial(n)
            except Exception:  # odd size/sharding corner: single-device path
                pass
        return gen.infer(gen.state.params, n)

    losses = []
    for i in range(len(test_set)):
        clean, noisy = test_set[i]
        n = jnp.asarray(noisy.transpose(1, 2, 0))[None]
        c = jnp.asarray(clean.transpose(1, 2, 0))[None]
        den = jnp.clip(whole_forward(n), 0, 1)
        total, _ = steps_mod._quality_losses(den, c, gen.weights)
        if output_to_dir is not None:
            os.makedirs(output_to_dir, exist_ok=True)
            imgio.save_img(np.asarray(den)[0].transpose(2, 0, 1),
                           os.path.join(output_to_dir, f"{i}.tif"))
        losses.append(float(total))
    return statistics.mean(losses)


def main(argv=None):
    from ..utils import jaxcache
    jaxcache.enable()
    import jax

    from ..models import get_network
    from ..parallel import mesh as pmesh
    from . import steps

    args = build_parser().parse_args(argv)
    # multi-host pods must initialize BEFORE the first backend touch (any
    # jax.devices()/jit call latches the local backend and
    # jax.distributed.initialize then raises — ADVICE r2; exercised by
    # tests/test_multihost.py)
    if args.coordinator or args.num_processes or \
            os.environ.get("JAX_COORDINATOR_ADDRESS"):
        pmesh.init_distributed(coordinator=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    # multi-host pods: params/metrics are replicated (identical on every
    # process — same seeds, same global batch), so only the chief writes
    # checkpoints and image dumps; other ranks keep their own log +
    # trainres.json in a rank-suffixed dir for debugging
    is_chief = jax.process_count() == 1 or jax.process_index() == 0
    debug_options = [o for o in args.debug_options if o in DEBUG_OPTIONS]

    weights = {"SSIM": args.weight_SSIM or 0, "MSSSIM": args.weight_MSSSIM or 0,
               "L1": args.weight_L1 or 0, "MSE": args.weight_MSE or 0,
               "D1": args.weight_D1 or 0, "D2": args.weight_D2 or 0}
    weights = steps.normalize_weights(weights)
    use_d = weights["D1"] > 0
    use_d2 = weights["D2"] > 0

    # the reference supplies learning rates via its preset configs
    # (configs/train_conf_*.yaml g_lr); with lr=None optax silently builds
    # an un-steppable optimizer (and torch Adam rejects it) — fail early.
    if args.g_lr is None:
        sys.exit("error: --g_lr is required (set it directly or load a "
                 "preset, e.g. --config nind_denoise_tpu/configs/"
                 "train_conf_utnet_std.yaml)")
    if (use_d and args.d_lr is None) or (use_d2 and args.d2_lr is None):
        sys.exit("error: --d_lr/--d2_lr are required when the corresponding "
                 "discriminator weight is non-zero")

    expname = (datetime.datetime.now().isoformat()[:-10] + "_"
               + "_".join(sys.argv).replace("/", "-"))[:255]
    if not is_chief:
        expname = (expname + f"_rank{jax.process_index()}")[:255]
    model_dir = os.path.join(args.models_dpath, expname)
    os.makedirs(model_dir, exist_ok=True)
    p = Printer(file_path=os.path.join(model_dir, "train.log"))
    jsonsaver = json_saver.JSONSaver(os.path.join(model_dir, "trainres.json"),
                                     step_type="epoch")
    p.print(args)
    p.print("cmd: python3 " + " ".join(sys.argv))

    args.test_reserve = get_test_reserve_list(args.test_reserve)
    p.print(f"test_reserve: {args.test_reserve}")

    if (args.min_crop_size is None or args.min_crop_size == 0) \
            and "check_dataset" in debug_options:
        args.min_crop_size = args.cs
    dataset = ds_mod.DenoisingDataset(
        args.train_data, test_reserve=args.test_reserve, cs=args.cs,
        min_crop_size=args.min_crop_size, exp_mult_min=args.exp_mult_min or 1,
        exp_mult_max=args.exp_mult_max or 1, seed=args.seed,
        cache_images=args.cache_images)
    if args.loss_cs is None:
        args.loss_cs = dataset.min_crop_size
        assert args.loss_cs is not None
    if args.cs is None:
        args.cs = dataset.cs
    if "short_run" in debug_options:
        dataset.dataset = dataset.dataset[:3 * args.batch_size]

    if args.clean_data_ratio and args.clean_data_ratio > 0:
        cc = ds_mod.CleanCleanDataset(args.clean_data_dpath, cs=args.cs,
                                      seed=args.seed)
        bs_clean = max(1, int(args.batch_size * args.clean_data_ratio))
        bs_std = args.batch_size - bs_clean
        p.print(f"Initialized clean dataset of size {len(cc)}. "
                f"Clean batch_size = {bs_clean}")
        clean_loader = ds_mod.Loader(cc, bs_clean, num_threads=1, seed=args.seed)
        if len(clean_loader) == 0:
            # drop_last loader: a clean set smaller than bs_clean would
            # StopIteration forever mid-epoch — fail fast with the cause
            raise SystemExit(
                f"clean dataset ({len(cc)} crops) is smaller than the clean "
                f"batch size {bs_clean}; add data or lower --clean_data_ratio")
        clean_iter = iter(clean_loader)
    else:
        cc = clean_loader = clean_iter = None
        bs_clean, bs_std = 0, args.batch_size

    loader = ds_mod.Loader(dataset, bs_std, shuffle=True, drop_last=True,
                           num_threads=max(1, min(args.threads, 4)), seed=args.seed)

    # ---- device-resident data path (--device_cache) ----
    device_cache = None
    if args.device_cache > 0:
        from . import device_cache as dc_mod

        ndev_early = len(jax.devices())
        if bs_clean > 0:
            p.print("Warning: --device_cache is incompatible with "
                    "--clean_data_ratio (host-side batch mixing); using the "
                    "host loader")
        elif ndev_early > 1 and args.batch_size % ndev_early == 0:
            p.print("Warning: --device_cache currently targets single-device "
                    "runs; data-parallel meshes keep the host loader")
        elif not dc_mod.supports(dataset):
            p.print("Warning: --device_cache cannot express this dataset's "
                    "host-side augmentations (JPEG/noise); using the host "
                    "loader")
        else:
            t0 = time.time()
            device_cache = dc_mod.DeviceEpochCache(
                dataset, args.device_cache, seed=args.seed,
                refresh_frac=args.device_cache_refresh,
                threads=max(1, min(args.threads, 4)))
            p.print(f"Device cache: {len(device_cache)} crop pairs in HBM "
                    f"({time.time() - t0:.1f}s fill); refresh "
                    f"{args.device_cache_refresh:.0%}/epoch")
            device_cache.start_refresh()

    # ---- models + jitted steps ----
    net = get_network(args.g_network)
    stateful = args.g_network == "UNet"
    if args.g_network == "UtNet":
        # MXU-shaped exact forward (ops/fastconv.py): +27% step throughput
        # measured on chip; grads match apply to fp32 recomposition noise
        # (tests/test_utnet_fast.py::test_apply_fast_gradients). Falls back
        # to apply internally for odd crop sizes.
        apply_fn = partial(net.apply_fast, activation=args.g_activation)
        init_fn = lambda k: net.init(k, funit=args.g_funit,
                                     activation=args.g_activation)
    elif args.g_network == "UNet":  # BatchNorm state threads through the step
        apply_fn = lambda params, x, ms: net.apply(params, x, ms, train=True)
        init_fn = lambda k: net.init(k)
    elif args.g_network in ("Hulb128Net", "Hulbs128Net"):
        # the reference's heavy GAN generators (Hul.py): stateless, so the
        # standard 2-arg step signature applies
        apply_fn = lambda params, x: net.apply(params, x,
                                               activation=args.g_activation)
        init_fn = lambda k: net.init(k, funit=args.g_funit,
                                     activation=args.g_activation)
    else:
        # the rest of the zoo (relics, p2p, DnCNN/RedCNN) threads BN state
        # with per-family signatures; the reference never trains them from
        # its configs either — fail fast instead of a TypeError mid-trace
        raise SystemExit(
            f"--g_network {args.g_network}: the trainer supports UtNet, "
            f"UNet, Hulb128Net, Hulbs128Net (the reference's trainable "
            f"generators); {args.g_network} is registry/inference-only")
    if args.compute_dtype == "bfloat16":
        if stateful:
            p.print("Warning: --compute_dtype bfloat16 is unsupported for "
                    "stateful (BatchNorm) nets; training UNet in float32.")
        else:
            # mixed precision: bf16 forward/backward, fp32 master weights +
            # optimizer + loss (the cast is inside the differentiated fn,
            # so grads come back fp32). Measured +21% step throughput on
            # chip (545 -> 661 crops/s, UtNet-std), per-step loss drift
            # ~1e-5. Opt-in; fp32 is reference parity.
            import jax.numpy as _jnp

            def _bf16(tree):
                return jax.tree_util.tree_map(
                    lambda a: a.astype(_jnp.bfloat16)
                    if hasattr(a, "dtype") and a.dtype == _jnp.float32 else a,
                    tree)

            base_fn = apply_fn
            apply_fn = lambda p_, x: base_fn(
                _bf16(p_), _bf16(x)).astype(_jnp.float32)
    gen = GeneratorWrapper(args, weights, apply_fn, init_fn, p,
                           stateful=stateful)
    if gen.resume_epoch is not None and args.start_epoch == 1:
        args.start_epoch = int(gen.resume_epoch) + 1
        p.print(f"Resuming at epoch {args.start_epoch}")

    discs = []
    from . import gan as gan_mod

    if use_d:
        discs.append(gan_mod.DiscriminatorWrapper(
            args, network=args.d_network, funit=args.d_funit, lr=args.d_lr,
            conditional=not args.not_conditional, seed=args.seed + 1,
            advantage=args.discriminator_advantage, patience=args.patience,
            model_path=args.d_model_path, keyword="discriminator"))
    if use_d2:
        discs.append(gan_mod.DiscriminatorWrapper(
            args, network=args.d2_network, funit=args.d2_funit, lr=args.d2_lr,
            conditional=not args.not_conditional_2, seed=args.seed + 2,
            advantage=args.discriminator2_advantage, patience=args.patience,
            model_path=args.d2_model_path, keyword="discriminator2"))

    # slot the fooling terms by IDENTITY (D1/D2), not list position: a
    # D2-only run must reach the weight_D2 term, not a zero-weighted D1
    _slots = [None, None]
    for d in discs:
        _slots[0 if d.wname == "D1" else 1] = d.pred_fn
    disc_apply_fns = tuple(_slots)
    if args.grad_accum > 1 and args.batch_size % args.grad_accum:
        sys.exit(f"error: --grad_accum {args.grad_accum} must divide "
                 f"--batch_size {args.batch_size}")
    train_step = steps.make_generator_train_step(
        apply_fn, gen.optimizer, weights, args.loss_cs,
        compute_ssim_anyway=args.compute_SSIM_anyway, remat=args.remat,
        disc_apply_fns=disc_apply_fns, stateful=stateful,
        grad_accum=args.grad_accum)
    warmup_step = steps.make_generator_train_step(
        apply_fn, gen.optimizer, {"MSE": 1.0}, args.loss_cs,
        remat=args.remat, stateful=stateful, grad_accum=args.grad_accum) \
        if args.msssim_warmup_epochs > 0 else None
    eval_fwd = (lambda params, x, ms: net.apply(params, x, ms, train=False)) \
        if stateful else apply_fn
    eval_step = steps.make_generator_eval_step(
        eval_fwd, weights, args.loss_cs,
        compute_ssim_anyway=args.compute_SSIM_anyway, stateful=stateful)

    # ---- data parallelism over all visible devices ----
    ndev = len(jax.devices())
    mesh = pmesh.make_mesh(ndev) if ndev > 1 and args.batch_size % ndev == 0 else None
    if mesh is not None:
        p.print(f"Data-parallel over {ndev} devices")
        gen.state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh))
            if hasattr(x, "shape") else x, gen.state)

    # ---- validation / test data ----
    validation_set = None
    if args.validation_interval > 0:
        validation_set = ds_mod.ValidationDataset(args.validation_set_yaml,
                                                  cs=args.cs)
        val_dir = (lambda e: os.path.join(model_dir, "val", str(e))) \
            if "output_val_images" in debug_options and is_chief \
            else (lambda e: None)
        validation_loss = validate_generator(eval_step, gen, validation_set,
                                             val_dir(0))
        jsonsaver.add_res(0, {"validation_loss": validation_loss})
        p.print(f"Validation loss: {validation_loss}")
    else:
        validation_loss = None
    if args.test_interval > 0:
        test_set = ds_mod.TestDenoiseDataset(data_dpath=args.orig_data,
                                             sets=args.test_reserve)
        test_dir = (lambda e: os.path.join(model_dir, "testimages", str(e))) \
            if "output_test_images" in debug_options and is_chief \
            else (lambda e: None)

    with open(os.path.join(model_dir, "config.yaml"), "w") as fp:
        yaml.dump({k: v for k, v in vars(args).items()}, fp)

    start_time = time.time()
    loss_hist = collections.deque(maxlen=args.patience)
    frozen_generator = args.freeze_generator
    generator_lr = args.g_lr
    disc_lrs = [d.lr for d in discs]
    sched_rng = random.Random(args.seed)
    key = jax.random.PRNGKey(args.seed)

    shutdown = GracefulShutdown()
    shutdown.install()
    ckpt_writer = AsyncCheckpointer()
    try:
        defer_metrics = args.log_interval > 1
        for epoch in range(args.start_epoch, args.epochs):
            loss_g, loss_g_ssim = [], []
            # deferred-readback mode: exact epoch means via device-side sums
            # (one tiny add dispatched per batch, TWO readbacks per epoch)
            g_w_sum, g_ssim_sum, g_count, g_ssim_count = 0.0, 0.0, 0, 0
            loss_d_lists = [[] for _ in discs]
            epoch_start = time.time()
            batches_done = 0

            if device_cache is not None:
                key, ek = jax.random.split(key)
                batch_iter = device_cache.epoch_batches(args.batch_size, ek)
                n_batches = len(device_cache) // args.batch_size
            else:
                batch_iter = loader
                n_batches = len(loader)
            for iteration, (clean_np, noisy_np) in enumerate(batch_iter, 1):
                if shutdown.requested:
                    break
                if bs_clean > 0:
                    try:
                        cb = next(clean_iter)
                    except StopIteration:
                        p.print("Reloading clean_dataloader")
                        clean_iter = iter(clean_loader)
                        cb = next(clean_iter)  # non-empty: guarded at setup
                    clean_np = np.concatenate([clean_np, cb[0]])
                    noisy_np = np.concatenate([noisy_np, cb[1]])
                summary = f"Epoch {epoch} batch {iteration}/{n_batches}: "
                if mesh is not None:
                    clean, noisy = pmesh.shard_batch(mesh, clean_np, noisy_np)
                else:
                    clean, noisy = clean_np, noisy_np

                # ---- stochastic D/G scheduling (nn_train.py:325-350) ----
                d_learns = []
                for di, d in enumerate(discs):
                    learns = (d.loss + d.advantage) > sched_rng.random() or frozen_generator
                    if learns:
                        key, sub = jax.random.split(key)
                        d.learn(sub, clean, noisy, gen, args.loss_cs)
                        loss_d_lists[di].append(d.loss)
                        summary += (f"loss {d.wname}: {d.loss:.4f} "
                                    f"({d.predictions_range}) ")
                    d_learns.append(learns)

                if not discs:
                    g_learns = not frozen_generator
                else:
                    avg = statistics.mean(d.loss + d.advantage
                                          for d, l in zip(discs, d_learns) if l) \
                        if any(d_learns) else 0.0
                    g_learns = not frozen_generator and (
                        not any(d_learns) or avg < sched_rng.random())
                if g_learns:
                    disc_params = tuple((d.state.params, d.state.model_state)
                                        for d in discs) + (None,) * (2 - len(discs))
                    active_step = warmup_step if (warmup_step is not None and
                                                  epoch - args.start_epoch <
                                                  args.msssim_warmup_epochs) \
                        else train_step
                    gen.state, metrics = active_step(gen.state, clean, noisy,
                                                     disc_params)
                    if defer_metrics:
                        # device-side accumulation: float(loss) forces a
                        # host readback that serializes the NEXT dispatch
                        # against the link's RPC latency; defer it so
                        # successive steps pipeline (--log_interval help)
                        g_w_sum = g_w_sum + metrics["weighted"]
                        g_count += 1
                        if "SSIM" in metrics:
                            g_ssim_sum = g_ssim_sum + metrics["SSIM"]
                            g_ssim_count += 1
                        if iteration % args.log_interval == 0:
                            gen.loss = {k: float(v) for k, v in metrics.items()}
                            summary += (f"loss G: "
                                        f"{gen.get_loss(pretty_printed=True)}")
                    else:
                        gen.loss = {k: float(v) for k, v in metrics.items()}
                        loss_g.append(gen.loss["weighted"])
                        if "SSIM" in gen.loss:
                            loss_g_ssim.append(gen.loss["SSIM"])
                        summary += f"loss G: {gen.get_loss(pretty_printed=True)}"
                elif frozen_generator and discs:
                    frozen_generator = discs[0].loss > 0.33 and \
                        (len(discs) < 2 or discs[1].loss > 0.33)
                if not defer_metrics or iteration % args.log_interval == 0 \
                        or any(d_learns):
                    p.print(summary)
                batches_done = iteration

            if shutdown.requested:
                # Preemption checkpoint: params + BN state + Adam leaves, so
                # --g_model_path <model_dir> resumes exactly at epoch+1 (the
                # partially trained epoch counts as done, like time_limit).
                p.print(f"Graceful shutdown: checkpointing epoch {epoch} "
                        f"after {batches_done}/{n_batches} batches")
                if is_chief:
                    for d in discs:
                        d.save_model(model_dir, epoch, d.keyword)
                    gen.save_model(model_dir, epoch)
                    # name the exact file: a bare dir resolves to the *best*
                    # epoch (params_io.complete_path), not this latest one
                    p.print(f"Checkpoint saved; resume with --g_model_path "
                            f"{os.path.join(model_dir, f'generator_{epoch}.npz')}")
                return

            # retention must see a consistent directory: wait for the
            # previous epoch's async checkpoint write before scanning
            ckpt_writer.join()
            removed = delete_outperformed_models(
                model_dir, keepers=jsonsaver.get_best_steps(), model_t="generator",
                keep_all_output_images="keep_all_output_images" in debug_options) \
                if is_chief else []
            if removed:
                p.print(f"delete_outperformed_models removed {removed}")

            if args.validation_interval > 0 and epoch % args.validation_interval == 0:
                validation_loss = validate_generator(eval_step, gen,
                                                     validation_set,
                                                     val_dir(epoch))
                jsonsaver.add_res(epoch, {"validation_loss": validation_loss},
                                  write=False)
                p.print(f"Validation loss: {validation_loss}")
            if args.test_interval > 0 and epoch % args.test_interval == 0:
                test_loss = test_generator(gen, test_set, test_dir(epoch))
                jsonsaver.add_res(epoch, {"test_loss": test_loss}, write=False)

            if defer_metrics and g_count:
                # exact epoch means (same sums the per-batch lists hold in
                # parity mode), materialized with two readbacks
                loss_g = [float(g_w_sum) / g_count]
                if g_ssim_count:
                    loss_g_ssim = [float(g_ssim_sum) / g_ssim_count]
            p.print(f"Epoch {epoch} summary:")
            p.print("Time elapsed (s): %u (epoch), %u (total)"
                    % (time.time() - epoch_start, time.time() - start_time))
            if loss_g_ssim:
                jsonsaver.add_res(epoch, {"train_SSIM_loss": statistics.mean(loss_g_ssim)},
                                  write=False)
            if loss_g:
                avg_loss = statistics.mean(loss_g)
                p.print(f"Average weighted loss: {avg_loss}")
                jsonsaver.add_res(epoch, {"train_weighted_loss": avg_loss}, write=False)
                lr_loss = validation_loss if validation_loss is not None else avg_loss
                if loss_hist and max(loss_hist) < lr_loss:
                    gen.state, generator_lr = steps.decay_lr(gen.state,
                                                             args.reduce_lr_factor)
                    p.print(f"Generator learning rate updated to {generator_lr}")
                loss_hist.append(lr_loss)
                jsonsaver.add_res(epoch, {"gen_lr": generator_lr})
            else:
                p.print("Generator learned nothing")
            for di, d in enumerate(discs):
                if loss_d_lists[di]:
                    avg_d = statistics.mean(loss_d_lists[di])
                    p.print(f"Discriminator{di+1} average normalized loss: {avg_d}")
                    disc_lrs[di] = d.update_learning_rate(avg_d)
                    if is_chief:
                        d.save_model(model_dir, epoch, d.keyword)
            if device_cache is not None:
                # upload the background-refreshed block (if ready) and kick
                # the next re-roll; a slow host degrades to aug-only
                # re-randomization, never a stalled chip
                device_cache.maybe_swap()
                device_cache.start_refresh()
            saved = False
            if not frozen_generator and is_chief and \
                    args.checkpoint_interval > 0 and (
                    epoch % args.checkpoint_interval == 0
                    or epoch in jsonsaver.get_best_steps()):
                # async: the ~100+ MB device->host fetch + npz write overlap
                # the next epoch (AsyncCheckpointer) — on remote-device
                # hosts the synchronous save dominated epoch wall (PERF r5).
                # New-best epochs save even off-interval: they are exactly
                # the files retention keeps and complete_path resolves.
                gen.save_model(model_dir, epoch, checkpointer=ckpt_writer)
                saved = True
            stopping = (args.time_limit
                        and args.time_limit < time.time() - start_time) or \
                (args.min_lr and generator_lr < args.min_lr and
                 all(lr is None or lr < args.min_lr for lr in disc_lrs))
            if stopping:
                if not saved and not frozen_generator and is_chief:
                    gen.save_model(model_dir, epoch,
                                   checkpointer=ckpt_writer)
                p.print("Time is up" if args.time_limit
                        and args.time_limit < time.time() - start_time
                        else "Minimum learning rate reached")
                return
    finally:
        ckpt_writer.join()  # the last checkpoint must be on disk
        shutdown.restore()


if __name__ == "__main__":
    main()
