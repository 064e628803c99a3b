"""Checkpoint/resume: optimizer state round-trips through .npz and resuming
continues at the right epoch with bit-identical optimizer behavior."""

import os

import numpy as np

from tests.test_train import cropped_ds_104, validation_yaml_104  # noqa: F401


def _run(models_dir, cropped_ds, validation_yaml, epochs, resume_path=None):
    from nind_denoise_tpu.train import loop

    argv = [
        "--train_data", cropped_ds,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", str(epochs),
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", validation_yaml,
        "--threads", "1", "--validation_interval", "0",
        "--debug_options", "keep_all_output_images",
    ]
    if resume_path:
        argv += ["--g_model_path", resume_path]
    loop.main(argv)


def test_optimizer_state_roundtrip(cropped_ds_104, validation_yaml_104, tmp_path):  # noqa: F811
    import jax

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.models.utnet import UtNet
    from nind_denoise_tpu.train import steps

    params = UtNet.init(jax.random.PRNGKey(0), funit=2)
    opt = steps.make_optimizer(1e-3, 0.5)
    state = steps.TrainState(params, opt.init(params))
    step = steps.make_generator_train_step(
        lambda p, x: UtNet.apply(p, x), opt, {"MSE": 1.0}, loss_cs=96,
        donate=False)
    rng = np.random.default_rng(0)
    clean = rng.random((2, 104, 104, 3)).astype(np.float32)
    noisy = np.clip(clean + 0.05, 0, 1)
    state, _ = step(state, clean, noisy)

    leaves = steps.opt_state_leaves(state.opt_state)
    fpath = str(tmp_path / "ckpt.npz")
    params_io.save({"params": state.params, "opt": leaves, "epoch": 7}, fpath)
    tree = params_io.load(fpath)
    assert tree["epoch"] == 7
    restored = steps.restore_opt_state(opt, tree["params"], tree["opt"])

    # one more step from saved vs restored must match exactly
    s_a, m_a = step(steps.TrainState(state.params, state.opt_state), clean, noisy)
    s_b, m_b = step(steps.TrainState(tree["params"], restored), clean, noisy)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_epochs(cropped_ds_104, validation_yaml_104, tmp_path):  # noqa: F811
    models_dir = str(tmp_path / "m1")
    _run(models_dir, cropped_ds_104, validation_yaml_104, epochs=3)
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    ckpts = sorted(f for f in os.listdir(exp) if f.startswith("generator_"))
    last = os.path.join(exp, ckpts[-1])
    last_epoch = int(ckpts[-1].split("_")[1].split(".")[0])

    models_dir2 = str(tmp_path / "m2")
    _run(models_dir2, cropped_ds_104, validation_yaml_104,
         epochs=last_epoch + 3, resume_path=last)
    exp2 = os.path.join(models_dir2, os.listdir(models_dir2)[0])
    epochs2 = sorted(int(f.split("_")[1].split(".")[0])
                     for f in os.listdir(exp2) if f.startswith("generator_"))
    assert epochs2 and min(epochs2) == last_epoch + 1


def test_async_checkpointer_writes_and_propagates_errors(tmp_path):
    """AsyncCheckpointer (train/loop.py): the snapshot is taken at submit
    time (later mutations of the live tree must not leak into the file),
    join() completes the write, and a writer failure re-raises at the
    next join instead of disappearing on the daemon thread."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from nind_denoise_tpu.models import params_io
    from nind_denoise_tpu.train.loop import AsyncCheckpointer

    ck = AsyncCheckpointer()
    tree = {"w": jnp.arange(8.0), "epoch": 3}
    fpath = str(tmp_path / "ck.npz")
    ck.submit(lambda t: params_io.save(t, fpath), tree)
    ck.join()
    got = params_io.load(fpath)
    np.testing.assert_array_equal(got["w"], np.arange(8.0))
    assert got["epoch"] == 3

    def boom(_):
        raise OSError("disk full")

    ck.submit(boom, tree)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.join()
    ck.join()  # error consumed; idempotent afterwards
