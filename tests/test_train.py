"""Training stack tests: dataset scanning/sampling/augments, ISO sorting,
the full nn_train-equivalent loop on a synthetic cropped dataset, and a cGAN
discriminator learn step."""

import os

import numpy as np
import pytest
import yaml

from nind_denoise_tpu.train import dataset as ds_mod


def test_sort_isos():
    bisos, isos = ds_mod.sort_isos(["ISO6400", "ISO200", "ISOH1", "ISO800"])
    assert bisos == ["ISO200"]
    assert isos == ["ISO800", "ISO6400", "ISOH1"]

    bisos, isos = ds_mod.sort_isos(["ISO200", "ISO200-1", "ISO800"])
    assert set(bisos) == {"ISO200", "ISO200-1"}
    assert isos == ["ISO800"]

    bisos, isos = ds_mod.sort_isos(["GT-A", "NOISY-B", "NOISY-A"])
    assert bisos == ["GT-A"]
    assert isos == ["NOISY-A", "NOISY-B"]


@pytest.fixture(scope="module")
def cropped_ds(tmp_path_factory):
    """<datadir>/<set>/ISO<val>/<DS>_<set>_<iso>_<x>_<y>_<ucs>.png layout."""
    import cv2

    root = tmp_path_factory.mktemp("cropped") / "TEST_64_56"
    rng = np.random.default_rng(0)
    for aset in ("sceneA", "sceneB", "reservedC"):
        base = rng.random((72, 72, 3)).astype(np.float32)
        for iso, sigma in (("ISO200", 0.0), ("ISO1600", 0.05), ("ISO6400", 0.1)):
            d = root / aset / iso
            d.mkdir(parents=True, exist_ok=True)
            for x, y in ((0, 0), (56, 0)):
                noisy = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
                fn = f"TEST_{aset}_{iso}_{x}_{y}_56.png"
                cv2.imwrite(str(d / fn), (noisy * 65535).astype(np.uint16))
    return str(root)


def test_denoising_dataset_scan_and_getitem(cropped_ds):
    ds = ds_mod.DenoisingDataset([cropped_ds], test_reserve=["reserved"],
                                 cs=64, seed=0)
    # 2 sets x 2 crops (reservedC excluded by substring match)
    assert len(ds) == 4
    x, y = ds[0]
    assert x.shape == (3, 64, 64) and y.shape == (3, 64, 64)
    assert x.dtype == np.float32
    xp, yp = ds.get_x_y_paths(0)
    assert "ISO200" in xp and os.path.isfile(xp)
    assert os.path.isfile(yp)


def test_dataset_exact_reserve(cropped_ds):
    ds = ds_mod.DenoisingDataset([cropped_ds], test_reserve=["sceneA"],
                                 exact_reserve=True, cs=64, seed=0)
    assert len(ds) == 4  # sceneB + reservedC remain


def test_dataset_exposure_mult(cropped_ds):
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, exp_mult_min=0.5,
                                 exp_mult_max=0.6, seed=1)
    x, y = ds[0]
    assert x.max() <= 0.61
    assert y.max() <= 1.0


def test_dataset_cache_images(cropped_ds, monkeypatch):
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, seed=0,
                                 cache_images=True)
    ref = ds_mod.DenoisingDataset([cropped_ds], cs=64, seed=0)
    # identical sampling/augmentation stream with and without the cache
    for i in range(len(ds)):
        xc, yc = ds[i]
        xr, yr = ref[i]
        np.testing.assert_array_equal(xc, xr)
        np.testing.assert_array_equal(yc, yr)
    # a path decoded once must be served from RAM afterwards (pair sampling
    # is random per __getitem__, so exercise the _load contract directly)
    from nind_denoise_tpu.core import imgio
    xp, _ = ds.get_x_y_paths(0)
    warm = ds._load(xp)

    def boom(_):
        raise AssertionError("cache miss: load_img called on warm cache")

    monkeypatch.setattr(imgio, "load_img", boom)
    again = ds._load(xp)
    np.testing.assert_array_equal(warm, again)
    with pytest.raises(AssertionError):
        ref._load(xp)  # cache off -> always decodes


def test_loader_batches(cropped_ds):
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, seed=0)
    loader = ds_mod.Loader(ds, batch_size=2, num_threads=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    x, y = batches[0]
    assert x.shape == (2, 64, 64, 3)  # NHWC


def test_cs_autoparse_from_dirname(cropped_ds):
    ds = ds_mod.DenoisingDataset([cropped_ds], seed=0)
    assert ds.cs == 64 and ds.min_crop_size == 56


@pytest.fixture(scope="module")
def validation_yaml(cropped_ds, tmp_path_factory):
    pairs = []
    setdir = os.path.join(cropped_ds, "sceneA")
    for x, y in ((0, 0), (56, 0)):
        pairs.append([os.path.join(setdir, "ISO200", f"TEST_sceneA_ISO200_{x}_{y}_56.png"),
                      os.path.join(setdir, "ISO6400", f"TEST_sceneA_ISO6400_{x}_{y}_56.png")])
    p = tmp_path_factory.mktemp("cfg") / "val.yaml"
    p.write_text(yaml.safe_dump(pairs))
    return str(p)


@pytest.fixture(scope="module")
def cropped_ds_104(tmp_path_factory):
    """Larger crops (112 px) so UtNet's cs=104 size formula holds."""
    import cv2

    root = tmp_path_factory.mktemp("cropped104") / "TEST_104_96"
    rng = np.random.default_rng(3)
    for aset in ("sceneA", "sceneB"):
        base = rng.random((112, 112, 3)).astype(np.float32)
        for iso, sigma in (("ISO200", 0.0), ("ISO6400", 0.1)):
            d = root / aset / iso
            d.mkdir(parents=True, exist_ok=True)
            for x in (0, 96):
                noisy = np.clip(base + rng.normal(0, sigma, base.shape), 0, 1)
                fn = f"TEST_{aset}_{iso}_{x}_0_96.png"
                cv2.imwrite(str(d / fn), (noisy * 65535).astype(np.uint16))
    return str(root)


@pytest.fixture(scope="module")
def validation_yaml_104(cropped_ds_104, tmp_path_factory):
    setdir = os.path.join(cropped_ds_104, "sceneA")
    pairs = [[os.path.join(setdir, "ISO200", "TEST_sceneA_ISO200_0_0_96.png"),
              os.path.join(setdir, "ISO6400", "TEST_sceneA_ISO6400_0_0_96.png")]]
    p = tmp_path_factory.mktemp("cfg104") / "val.yaml"
    p.write_text(yaml.safe_dump(pairs))
    return str(p)


@pytest.mark.slow  # full CLI epochs on the 1-core host
def test_checkpoint_interval_saves_best_and_final(cropped_ds_104,
                                                  validation_yaml_104,
                                                  tmp_path):
    """--checkpoint_interval N: epochs off the interval skip their save
    UNLESS they set a new best (retention/resolution semantics preserved);
    stops force a final save; the async writer's files are complete and
    loadable at loop exit."""
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")
    loop.main([
        "--train_data", cropped_ds_104,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "6", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", validation_yaml_104,
        "--threads", "1", "--checkpoint_interval", "3",
    ])
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    import json

    res = json.load(open(os.path.join(exp, "trainres.json")))
    ckpts = sorted(int(f.split("_")[1].split(".")[0])
                   for f in os.listdir(exp) if f.startswith("generator_"))
    assert ckpts, os.listdir(exp)
    # every retained checkpoint loads, and the best epoch resolves
    best = params_io.complete_path(exp, keyword="generator")
    tree = params_io.load(best)
    assert "params" in tree and "opt" in tree
    # best-epoch file exists even though interval=3 skipped some epochs
    assert "best_epoch" in res


@pytest.mark.slow  # >20 s on the 1-core host
def test_train_loop_end_to_end(cropped_ds_104, validation_yaml_104, tmp_path):
    """Two short epochs of the full training CLI: loss recorded, best-epoch
    retention applied, checkpoints loadable."""
    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")
    cropped_ds, validation_yaml = cropped_ds_104, validation_yaml_104
    loop.main([
        "--train_data", cropped_ds,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "3", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", validation_yaml,
        "--threads", "1",
        "--debug_options", "output_val_images",
    ])
    exp_dirs = os.listdir(models_dir)
    assert len(exp_dirs) == 1
    exp = os.path.join(models_dir, exp_dirs[0])
    files = os.listdir(exp)
    assert "trainres.json" in files and "config.yaml" in files and "train.log" in files
    ckpts = [f for f in files if f.startswith("generator_")]
    assert ckpts, files

    import json

    res = json.load(open(os.path.join(exp, "trainres.json")))
    assert "best_epoch" in res and "validation_loss" in res["best_epoch"]

    # the retained checkpoint resolves via directory lookup and loads
    from nind_denoise_tpu.models import params_io

    best = params_io.complete_path(exp, keyword="generator")
    tree = params_io.load(best)
    assert "params" in tree


@pytest.mark.slow  # >20 s on the 1-core host
def test_train_loop_bfloat16(cropped_ds_104, validation_yaml_104, tmp_path):
    """--compute_dtype bfloat16 (mixed precision: bf16 fwd/bwd, fp32 master
    weights/optimizer/loss) trains end-to-end and keeps fp32 checkpoints."""
    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")
    loop.main([
        "--train_data", cropped_ds_104,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "2", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5",
        "--validation_set_yaml", validation_yaml_104,
        "--threads", "1", "--compute_dtype", "bfloat16",
        "--debug_options", "short_run",
    ])
    import jax

    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    best = params_io.complete_path(exp, keyword="generator")
    tree = params_io.load(best)
    leaf = next(iter(jax.tree_util.tree_leaves(tree["params"])))
    assert leaf.dtype == np.float32  # master weights stay fp32


def test_discriminator_learn_step():
    """One cGAN discriminator learn + predict round (Hul112Disc, 112 crops)."""
    import jax
    import jax.numpy as jnp

    from nind_denoise_tpu.train import gan, steps

    class A:  # minimal args surrogate
        beta1 = 0.5
        models_dpath = None

    d = gan.DiscriminatorWrapper(A, network="Hul112Disc", funit=2, lr=1e-4,
                                 conditional=True, seed=0, patience=2)

    class G:  # identity "generator"
        class state:
            params = {}
            model_state = None
        apply_fn = staticmethod(lambda p, x: x)

    rng = np.random.default_rng(0)
    clean = rng.random((2, 120, 120, 3)).astype(np.float32)
    noisy = np.clip(clean + 0.1, 0, 1)
    d.learn(jax.random.PRNGKey(0), clean, noisy, G, loss_cs=112)
    assert np.isfinite(d.loss) and d.predictions_range is not None

    preds = d.pred_fn((d.state.params, d.state.model_state),
                      jnp.asarray(clean[:, :112, :112]),
                      jnp.asarray(noisy[:, :112, :112]))
    assert np.isfinite(np.asarray(preds)).all()

    # plateau scheduler reduces LR after patience bad epochs
    lr0 = d.lr
    for _ in range(5):
        lr = d.update_learning_rate(1.0)
    assert lr < lr0


@pytest.mark.slow  # two Hul112Disc builds + three jitted learn steps (~80 s)
def test_discriminator_exact_resume(tmp_path):
    """save_model -> DiscriminatorWrapper(model_path=...) restores params,
    Adam moments, and the plateau-scheduler window exactly: the next learn
    step from the resumed wrapper bit-matches the uninterrupted one.  (The
    reference saved only the state_dict, nn_common.py:300-305 — its resumed
    discriminators restart Adam and the plateau window; this is a deliberate
    improvement, like the generator's exact resume.)"""
    import jax

    from nind_denoise_tpu.train import gan

    class A:
        beta1 = 0.5
        models_dpath = None

    class G:  # identity "generator"
        class state:
            params = {}
            model_state = None
        apply_fn = staticmethod(lambda p, x: x)

    rng = np.random.default_rng(1)
    clean = rng.random((2, 120, 120, 3)).astype(np.float32)
    noisy = np.clip(clean + 0.1, 0, 1)

    d = gan.DiscriminatorWrapper(A, network="Hul112Disc", funit=2, lr=1e-4,
                                 conditional=True, seed=0, patience=2)
    d.learn(jax.random.PRNGKey(0), clean, noisy, G, loss_cs=112)
    d.update_learning_rate(1.0)  # sets best=1.0
    d.update_learning_rate(1.0)  # num_bad=1: mid-window scheduler state
    d.save_model(str(tmp_path), 3, "discriminator")
    assert (tmp_path / "discriminator_3.npz").exists()

    r = gan.DiscriminatorWrapper(A, network="Hul112Disc", funit=2, lr=1e-4,
                                 conditional=True, seed=99, patience=2,
                                 model_path=str(tmp_path),
                                 keyword="discriminator")
    assert r.scheduler.best == d.scheduler.best
    assert r.scheduler.num_bad == d.scheduler.num_bad == 1
    assert r.lr == d.lr

    # identical next step: same loss scalar and identical params after it
    d.loss = r.loss = 1.0  # align the fake_is_noisy branch
    d.learn(jax.random.PRNGKey(7), clean, noisy, G, loss_cs=112)
    r.learn(jax.random.PRNGKey(7), clean, noisy, G, loss_cs=112)
    assert d.loss == r.loss
    for a, b in zip(jax.tree_util.tree_leaves(d.state.params),
                    jax.tree_util.tree_leaves(r.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # keyword disambiguation: a discriminator2 file must not shadow it
    d.save_model(str(tmp_path), 9, "discriminator2")
    from nind_denoise_tpu.models import params_io
    assert params_io.complete_path(str(tmp_path), keyword="discriminator") \
        .endswith("discriminator_3.npz")
    assert params_io.complete_path(str(tmp_path), keyword="discriminator2") \
        .endswith("discriminator2_9.npz")


@pytest.mark.slow  # drives the full loop for ~1.5 epochs
def test_train_loop_graceful_shutdown(cropped_ds_104, validation_yaml_104,
                                      tmp_path):
    """SIGTERM mid-training: the loop finishes the in-flight batch, writes a
    full resume checkpoint (params + opt leaves + epoch), logs the shutdown,
    returns cleanly, and restores the previous signal disposition."""
    import signal
    import threading
    import time

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")

    def fire_after_first_checkpoint():
        # wait for epoch 1's checkpoint so the signal lands mid-epoch-2;
        # the handler is installed before any checkpoint can exist
        deadline = time.time() + 180
        while time.time() < deadline:
            for root, _, files in os.walk(models_dir):
                if any(f.startswith("generator_") for f in files):
                    os.kill(os.getpid(), signal.SIGTERM)
                    return
            time.sleep(0.05)

    prev_term = signal.getsignal(signal.SIGTERM)
    watcher = threading.Thread(target=fire_after_first_checkpoint, daemon=True)
    watcher.start()
    loop.main([
        "--train_data", cropped_ds_104,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "9999", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5",
        "--validation_set_yaml", validation_yaml_104,
        "--threads", "1",
    ])  # returns (no SystemExit / KeyboardInterrupt) = graceful path taken
    watcher.join(timeout=10)
    assert signal.getsignal(signal.SIGTERM) == prev_term  # restored

    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    log = open(os.path.join(exp, "train.log")).read()
    assert "Graceful shutdown: checkpointing epoch" in log

    best = params_io.complete_path(exp, keyword="generator")
    tree = params_io.load(best)
    assert "params" in tree and "opt" in tree and "epoch" in tree


def test_graceful_shutdown_signal_protocol():
    """First signal only sets the flag; the second restores the previous
    disposition and re-raises (SIGINT -> KeyboardInterrupt); install() from
    a non-main thread is a no-op."""
    import signal
    import threading

    from nind_denoise_tpu.train.loop import GracefulShutdown

    prev_int = signal.getsignal(signal.SIGINT)
    prev_term = signal.getsignal(signal.SIGTERM)
    gs = GracefulShutdown()
    gs.install()
    try:
        assert not gs.requested
        signal.raise_signal(signal.SIGINT)
        assert gs.requested  # first signal: cooperative, no exception
        with pytest.raises(KeyboardInterrupt):
            signal.raise_signal(signal.SIGINT)  # second: stop cooperating
        assert signal.getsignal(signal.SIGINT) == prev_int  # restored
        assert signal.getsignal(signal.SIGTERM) == prev_term
    finally:
        gs.restore()

    gs2 = GracefulShutdown()
    t = threading.Thread(target=gs2.install)
    t.start()
    t.join()
    assert signal.getsignal(signal.SIGTERM) == prev_term  # untouched
    gs2.restore()


@pytest.mark.slow  # ~1 min of CPU optimization on the 1-core host
def test_training_actually_learns_to_denoise():
    """End-to-end LEARNING evidence (not just mechanics): a tiny UtNet
    trained with the product train step on synthetic clean/noisy pairs
    must beat the identity baseline on HELD-OUT data — PSNR(denoised,
    clean) > PSNR(noisy, clean) + 2 dB — and the loss must drop
    substantially. Guards the whole chain (fast forward, MSE loss, Adam
    amsgrad, gradient flow) against silent learning-breaking regressions
    that shape/finite checks cannot catch."""
    import jax
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from nind_denoise_tpu.models.utnet import UtNet
    from nind_denoise_tpu.train import steps

    rng = np.random.default_rng(0)

    def make_pair(n):
        # piecewise-smooth "photo-like" content: blurred uniform noise,
        # normalized to [0.1, 0.9] so noise never clips
        clean = gaussian_filter(
            rng.random((n, 104, 104, 3), dtype=np.float32), (0, 3, 3, 0))
        lo, hi = clean.min(), clean.max()
        clean = 0.1 + 0.8 * (clean - lo) / (hi - lo)
        noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)
        return clean.astype(np.float32), noisy.astype(np.float32)

    params = UtNet.init(jax.random.PRNGKey(0), funit=4)
    optimizer = steps.make_optimizer(lr=3e-3, beta1=0.9, amsgrad=True)
    state = steps.TrainState(params, optimizer.init(params))
    step = steps.make_generator_train_step(
        lambda p, x: UtNet.apply_fast(p, x), optimizer,
        weights={"MSE": 1.0}, loss_cs=96)

    losses = []
    for i in range(160):
        clean, noisy = make_pair(4)
        state, metrics = step(state, jnp.asarray(clean), jnp.asarray(noisy))
        losses.append(float(metrics["weighted"]))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])

    # held-out evaluation (fresh draw, never trained on)
    clean, noisy = make_pair(4)
    den = np.asarray(UtNet.apply_fast(state.params, jnp.asarray(noisy)))

    def psnr(a, b):
        return 10 * np.log10(1.0 / max(float(((a - b) ** 2).mean()), 1e-12))

    p_noisy = psnr(noisy, clean)   # identity baseline ~16.5 dB at sigma .15
    p_den = psnr(np.clip(den, 0, 1), clean)
    # measured on this recipe: p_den ~21.7 (+5.1 dB); assert a 3 dB margin
    assert p_den > p_noisy + 3.0, (p_den, p_noisy)


def test_loader_worker_error_propagates_not_hangs(cropped_ds):
    """A worker that raises (corrupt crop, decode failure) must surface as
    an exception on the training thread — previously the daemon thread died
    silently and the main loop blocked forever on q.get()."""
    ds = ds_mod.DenoisingDataset([cropped_ds], cs=64, seed=0)

    class Boom:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i == 2:
                raise OSError("simulated corrupt crop")
            return ds[i]

    loader = ds_mod.Loader(Boom(), batch_size=2, num_threads=2, seed=0)
    with pytest.raises(RuntimeError, match="Loader worker failed"):
        for _ in loader:
            pass


def test_hul_generator_trains_one_step():
    """Hulb128Net is a reference-trainable generator (Hul.py heavy GAN
    generators); the trainer's apply_fn branch must drive it with the
    standard 2-arg step signature (round-3 fix: previously any non-UtNet
    non-UNet generator crashed with a 3-arg stateful lambda)."""
    import jax
    import jax.numpy as jnp

    from nind_denoise_tpu.models.hul_gen import Hulb128Net
    from nind_denoise_tpu.train import steps

    params = Hulb128Net.init(jax.random.PRNGKey(0), funit=1)
    opt = steps.make_optimizer(lr=1e-4, beta1=0.5, amsgrad=True)
    state = steps.TrainState(params, opt.init(params))
    step = steps.make_generator_train_step(
        lambda p, x: Hulb128Net.apply(p, x), opt, weights={"MSE": 1.0},
        loss_cs=96)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))
    noisy = jnp.asarray(rng.random((2, 128, 128, 3), dtype=np.float32))
    state, metrics = step(state, clean, noisy)
    assert np.isfinite(float(metrics["weighted"]))


@pytest.mark.slow
def test_d2_only_gan_reaches_generator_and_checkpoints_as_d2(
        cropped_ds_104, tmp_path):
    """--weight_D2 with NO D1 (round-3 fix): the fooling term must feed the
    weight_D2 slot (previously mapped positionally to the zero-weighted D1)
    and the checkpoint must be discriminator2_<e>.npz (previously saved
    under the D1 name, breaking --d2_model_path resume)."""
    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")
    loop.main([
        "--train_data", cropped_ds_104,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "136", "--loss_cs", "136",
        "--weight_MSE", "1", "--weight_MSSSIM", "0", "--weight_D2", "0.5",
        "--d2_network", "Hul112Disc", "--d2_funit", "1", "--d2_lr", "1e-4",
        "--batch_size", "2", "--epochs", "2", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_interval", "0",  # fixture crops are 112px < cs=136
        "--threads", "1",
    ])
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    files = os.listdir(exp)
    assert any(f.startswith("discriminator2_") for f in files), files
    assert not any(f.startswith("discriminator_") for f in files), files
    log = open(os.path.join(exp, "train.log")).read()
    assert "loss D2" in log


@pytest.mark.slow  # multi-minute step compiles on the 1-core host
def test_grad_accum_matches_full_batch_update():
    """--grad_accum N computes the SAME optimizer update as the plain step:
    every per-batch loss is a mean, so the mean of equal-size microbatch
    gradients equals the full-batch gradient up to fp32 reassociation.
    One step on identical inputs; params and metrics must agree."""
    import jax
    import jax.numpy as jnp

    from nind_denoise_tpu.models.utnet import UtNet
    from nind_denoise_tpu.train import steps

    rng = np.random.default_rng(1)
    clean = rng.random((4, 104, 104, 3), dtype=np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.1, clean.shape), 0, 1
                    ).astype(np.float32)
    params = UtNet.init(jax.random.PRNGKey(0), funit=2)
    apply_fn = lambda p, x: UtNet.apply_fast(p, x)
    opt = steps.make_optimizer(lr=1e-3, beta1=0.9)

    def run(ga):
        p0 = jax.tree_util.tree_map(jnp.array, params)
        st = steps.TrainState(p0, opt.init(p0))
        step = steps.make_generator_train_step(
            apply_fn, opt, {"MSE": 1.0, "SSIM": 1.0}, loss_cs=96,
            grad_accum=ga, donate=False)
        st, m = step(st, jnp.asarray(clean), jnp.asarray(noisy))
        return st, m

    s1, m1 = run(1)
    for ga in (2, 4):
        s2, m2 = run(ga)
        assert np.isclose(float(m1["weighted"]), float(m2["weighted"]),
                          rtol=1e-5), (ga, float(m1["weighted"]),
                                       float(m2["weighted"]))
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-7)


def test_grad_accum_rejects_non_divisor():
    import jax
    import jax.numpy as jnp

    from nind_denoise_tpu.models.utnet import UtNet
    from nind_denoise_tpu.train import steps

    params = UtNet.init(jax.random.PRNGKey(0), funit=2)
    opt = steps.make_optimizer(lr=1e-3, beta1=0.9)
    st = steps.TrainState(params, opt.init(params))
    step = steps.make_generator_train_step(
        lambda p, x: UtNet.apply_fast(p, x), opt, {"MSE": 1.0}, loss_cs=96,
        grad_accum=3, donate=False)
    x = jnp.zeros((4, 104, 104, 3), np.float32)
    with pytest.raises(ValueError, match="divide"):
        step(st, x, x)


@pytest.mark.slow  # multi-minute step compiles on the 1-core host
def test_grad_accum_stateful_unet_threads_bn_state():
    """grad_accum with a stateful net: the scan must thread BatchNorm state
    sequentially through the microbatches (stats move away from init) and
    the step must stay finite."""
    import jax
    import jax.numpy as jnp

    from nind_denoise_tpu.models.unet import UNet
    from nind_denoise_tpu.train import steps

    params, bn = UNet.init(jax.random.PRNGKey(0), funit=2)
    opt = steps.make_optimizer(lr=1e-3, beta1=0.9)
    st = steps.TrainState(params, opt.init(params), bn)
    step = steps.make_generator_train_step(
        lambda p, x, ms: UNet.apply(p, x, ms, train=True), opt,
        {"MSE": 1.0}, loss_cs=96, stateful=True, grad_accum=2, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 104, 104, 3), dtype=np.float32))
    st2, m = step(st, x, x)
    assert np.isfinite(float(m["weighted"]))
    moved = np.abs(np.asarray(
        jax.tree_util.tree_leaves(st2.model_state)[0])).max()
    assert moved > 0


@pytest.mark.slow
def test_train_loop_grad_accum_and_log_interval(cropped_ds_104,
                                                validation_yaml_104, tmp_path):
    """CLI wiring: --grad_accum 2 --log_interval 4 must train, record exact
    epoch means into trainres.json, and checkpoint normally (the deferred
    device-side accumulator path)."""
    import json

    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")
    loop.main([
        "--train_data", cropped_ds_104,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "2", "--start_epoch", "1",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", validation_yaml_104,
        "--threads", "1",
        "--grad_accum", "2", "--log_interval", "4",
    ])
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    files = os.listdir(exp)
    assert any(f.startswith("generator_") for f in files), files
    res = json.load(open(os.path.join(exp, "trainres.json")))
    vals = [v["train_weighted_loss"] for k, v in res.items()
            if isinstance(v, dict) and "train_weighted_loss" in v
            and k not in ("best_val", "best_epoch")]
    assert vals and all(np.isfinite(v) for v in vals), res
